package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Declared queries for the aggregation / grouping / window (order-
  * dependent) operator families (SURVEY.md §2.5, §2.6).
  *
  * Every order-dependent operator keys on explicit columns — Spark gives
  * no implicit row order after a shuffle, so the reference's "walk rows in
  * order" semantics (ffill, take-while join, marker sessionization) are
  * re-expressed as window functions over explicit (partition, order) keys.
  * At 100 TB these windows are partitioned (by user/order key) — never a
  * global Window.orderBy without partitionBy except in the small bounded
  * demos (q36 notes this).
  *
  * Double-typed money sums use an exact decimal(18,2) accumulation then a
  * single cast back to double, so results are independent of partial-
  * aggregation order (and hash-match the DuckDB oracle).
  */
object AggWindowQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def moneySum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(18,2)")).cast("double")

  val queries: Map[String, Q] = Map(
    // OP-30: forward-fill group key (ffill) — synthesize gaps, fill with
    // last non-null over an explicit (partition, order) window.
    "q30_ffill" -> ((s, d) => {
      val gapped = Tables(s, d, "events")
        .withColumn("p", when(col("event_id") % 3 === 0, col("props")))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      gapped.select(col("event_id"), col("user_id"),
          last(col("p"), ignoreNulls = true).over(w).as("filled"))
        .orderBy(col("event_id"))
    }),

    // OP-31: group-by with per-column aggregation dict.
    "q31_group_agg" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(moneySum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy(col("l_orderkey")).limit(100)),

    // OP-32: take-while-nonempty ordered string join (custom fold as a
    // higher-order aggregate — see GraftFunctions.takeWhileJoin).
    "q32_takewhile_join" -> ((s, d) => {
      val v = when(col("l_linenumber") > 3, lit(""))
        .otherwise(col("l_returnflag"))
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"), struct(col("l_linenumber").as("ord"), v.as("v")).as("x"))
        .groupBy(col("l_orderkey"))
        .agg(takeWhileJoin(collect_list(col("x"))).as("joined"))
        .orderBy(col("l_orderkey"))
    }),

    // OP-33: collect-to-list (deterministically sorted, string-joined for
    // cross-engine hashing).
    "q33_collect_list" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(array_join(
          transform(sort_array(collect_list(col("l_linenumber"))),
            x => x.cast("string")), ",").as("lns"))
        .orderBy(col("l_orderkey")).limit(50)),

    // OP-34: keep-first dedup via explicit row_number window (plain
    // dropDuplicates is nondeterministic — never used).
    "q34_dedup_first" -> ((s, d) => {
      // testdata has duplicate (l_orderkey, l_linenumber) pairs — the order
      // must cover every output column to be deterministic cross-engine.
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"))
      Tables(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    }),

    // OP-36: group-boundary detection via lag (the spacer-row encoding,
    // without materializing spacers). The window is PARTITIONED by a
    // coarse bucket of the key — the production cleaner partitions by
    // document the same way — so there is no global sort anywhere in the
    // plan and the query scales by adding executors. A boundary at a
    // partition edge reports 0 on the partition's first row (lag is
    // null), exactly like the cleaner's per-document first row.
    "q36_boundary" -> ((s, d) => {
      val bucket = floor(col("l_orderkey") / 32)
      val w = Window.partitionBy(bucket)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      Tables(s, d, "lineitem")
        .filter(col("l_orderkey") < 200)
        .withColumn("boundary",
          when(lag(col("l_orderkey"), 1).over(w) =!= col("l_orderkey"), 1)
            .otherwise(0))
        .select(col("l_orderkey"), col("l_linenumber"), col("boundary"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // OP-37: segment-and-merge fold = sessionization by marker rows:
    // running sum of markers assigns segment ids, then group-agg merges.
    "q37_sessionize" -> ((s, d) => {
      val marker = when(col("event_type") === "signup", 1).otherwise(0)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // money leaves the hashed surface as INTEGER CENTS (BIGINT): the
      // 2-decimal doubles round exactly to cents in both engines, and a
      // BIGINT cannot canonicalize differently across engines — unlike
      // DECIMAL, whose stringification diverged in round 2 despite
      // row-identical values (round-1/2 q37 lesson).
      Tables(s, d, "events")
        .withColumn("seg", sum(marker).over(w))
        .groupBy(col("user_id"), col("seg"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast("long")).as("amount_cents"),
          min(col("event_id")).as("first_event"))
        .orderBy(col("user_id"), col("seg"))
    }),

    // OP-38: multi-column zip-explode — parallel ordered lists re-zipped
    // positionally into rows via arrays_zip + posexplode.
    "q38_zip_explode" -> ((s, d) => {
      val li = Tables(s, d, "lineitem").filter(col("l_orderkey") < 1000)
      val sortedStructs = array_sort(collect_list(struct(
        col("l_linenumber").as("ord"), col("l_returnflag").as("rf"),
        col("l_linestatus").as("ls"), col("l_quantity").as("qty"))))
      li.groupBy(col("l_orderkey"))
        .agg(sortedStructs.as("rows"))
        .withColumn("rf", transform(col("rows"), r => r("rf")))
        .withColumn("ls", transform(col("rows"), r => r("ls")))
        .withColumn("qty", transform(col("rows"), r => r("qty")))
        .select(col("l_orderkey"),
          posexplode(arrays_zip(col("rf"), col("ls"), col("qty"))))
        .select(col("l_orderkey"), col("pos"),
          col("col.rf").as("l_returnflag"), col("col.ls").as("l_linestatus"),
          col("col.qty").as("l_quantity"))
        .orderBy(col("l_orderkey"), col("pos"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q30_ffill" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_id % 3 = 0 THEN props END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,
    "q31_group_agg" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100""".stripMargin,
    "q32_takewhile_join" ->
      """SELECT l_orderkey,
        |  coalesce(string_agg(v, ' ' ORDER BY l_linenumber, v)
        |             FILTER (WHERE l_linenumber < cut), '') AS joined
        |FROM (
        |  SELECT l_orderkey, l_linenumber, v,
        |    coalesce(min(CASE WHEN v = '' THEN l_linenumber END)
        |               OVER (PARTITION BY l_orderkey), 2147483647) AS cut
        |  FROM (SELECT l_orderkey, l_linenumber,
        |          CASE WHEN l_linenumber > 3 THEN '' ELSE l_returnflag END AS v
        |        FROM lineitem)
        |) GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q33_collect_list" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lns
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 50""".stripMargin,
    "q34_dedup_first" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |QUALIFY row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q36_boundary" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN lag(l_orderkey) OVER (PARTITION BY floor(l_orderkey / 32)
        |                                  ORDER BY l_orderkey, l_linenumber) <> l_orderkey
        |       THEN 1 ELSE 0 END AS boundary
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q37_sessionize" ->
      """SELECT user_id, seg, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents,
        |  min(event_id) AS first_event
        |FROM (
        |  SELECT *, CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg
        |  FROM events
        |) GROUP BY user_id, seg ORDER BY user_id, seg""".stripMargin,
    "q38_zip_explode" ->
      """SELECT l_orderkey,
        |  CAST(row_number() OVER (PARTITION BY l_orderkey
        |         ORDER BY l_linenumber, l_returnflag, l_linestatus, l_quantity) - 1 AS INT) AS pos,
        |  l_returnflag, l_linestatus, l_quantity
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, pos""".stripMargin
  )
}
