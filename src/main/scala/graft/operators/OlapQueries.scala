package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Classic OLAP shapes over the events table: pivot, rollup, histogram.
  * All are single hash-aggregate plans (pivot with EXPLICIT values — no
  * value-discovery pre-job; rollup's grouping sets expand map-side), so
  * each runs in one shuffle whose key count is the output cardinality,
  * not the input size. Money stays integer cents on the hashed surface.
  */
object OlapQueries {
  type Q = (SparkSession, String) => DataFrame

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, Q] = Map(
    // wide per-user activity matrix. Explicit pivot values keep the
    // plan static; coalesce-to-0 matches SQL's count FILTER semantics
    // for users missing a type.
    "q44_pivot" -> ((s, d) => {
      val p = Tables(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      p.select(col("user_id") +:
          EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    }),

    // rollup: per (type, user-decile) + per-type subtotals + grand total
    "q45_rollup" -> ((s, d) =>
      Tables(s, d, "events")
        .withColumn("ug", col("user_id") % 10)
        .rollup(col("event_type"), col("ug"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast("long")).as("amount_cents"))
        .orderBy(col("event_type"), col("ug"))),

    // fixed-width value histogram: bucket is a pure projection, one agg
    "q46_histogram" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket")))
  )

  val oracleSql: Map[String, String] = Map(
    "q44_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q45_rollup" ->
      """SELECT event_type, user_id % 10 AS ug, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM events GROUP BY ROLLUP(event_type, ug)
        |ORDER BY event_type, ug""".stripMargin,

    "q46_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS cnt
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
