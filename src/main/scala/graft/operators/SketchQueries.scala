package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch / approximate-aggregation operators over the events table —
  * the cardinality and quantile estimators a 100 TB analytics engine
  * reaches for when exact distinct/percentile shuffles are too big.
  * Both estimators are Spark built-ins (HLL++, KLL-style quantile
  * summaries) that aggregate in a single pass with constant-size
  * partial state — a map-side-combinable sketch merge instead of the
  * exact form's full shuffle of distinct keys / sorted values.
  *
  * Estimates themselves are engine-specific (not DuckDB-expressible),
  * so the declared estimator queries get the rows-only check, and each
  * carries an oracle-green ERROR GATE in the x03r/x04r style: a query
  * that emits only the groups whose estimate violates the documented
  * error bound — provably empty at these parameters, declared with an
  * empty-set oracle. Both sketches are deterministic for fixed input
  * (hash-based, no RNG), so the gates cannot flake.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  /** rsd for approx_count_distinct: 1% target standard error; the gate
    * asserts 5x that bound.
    */
  private val Rsd = 0.01

  /** Relative-rank accuracy for approx_percentile (rank error <=
    * n/Accuracy); the gate asserts a 1% relative-rank window.
    */
  private val Accuracy = 10000

  private def events(s: SparkSession, d: String): DataFrame = Tables(s, d, "events")

  /** (event_type, approx_users) — HLL++ distinct-user estimate. */
  private def approxDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), Rsd).as("approx_users"))

  /** (event_type, approx_median) — single-pass quantile-sketch median. */
  private def approxMedian(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy(col("event_type"))
      .agg(approx_percentile(col("value"), lit(0.5), lit(Accuracy)).as("approx_median"))

  val queries: Map[String, Q] = Map(
    "x17_approx_distinct" -> ((s, d) =>
      approxDistinct(s, d).orderBy(col("event_type"))),

    // gate: |approx - exact| / exact must stay within 5*rsd. HLL++ at
    // rsd=0.01 has relative standard error ~1%; 5 sigma on a
    // deterministic sketch => empty, declared with an empty-set oracle.
    "x17g_approx_distinct_gate" -> ((s, d) => {
      val exact = events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      approxDistinct(s, d).join(exact, "event_type")
        .filter(abs(col("approx_users") - col("exact_users")) >
          lit(5 * Rsd) * col("exact_users"))
        .select(col("event_type"), col("approx_users"), col("exact_users"))
        .orderBy(col("event_type"))
    }),

    "x18_approx_median" -> ((s, d) =>
      approxMedian(s, d).orderBy(col("event_type"))),

    // gate: the estimate's true relative RANK must sit in 0.5 +- 1%.
    // approx_percentile guarantees rank error <= n/Accuracy (= 0.01%
    // of ranks here) and returns an actual element of the group, so
    // the fraction of values <= estimate is within the window by
    // construction. Verified by joining the estimate back against the
    // raw values — the join is per-group (5 groups), never a cross.
    "x18g_approx_median_gate" -> ((s, d) => {
      val frac = events(s, d).join(approxMedian(s, d), "event_type")
        .groupBy(col("event_type"))
        .agg(avg(when(col("value") <= col("approx_median"), 1.0).otherwise(0.0))
          .as("rank_frac"))
      frac.filter(abs(col("rank_frac") - 0.5) > 0.01)
        .select(col("event_type"), round(col("rank_frac"), 6).as("rank_frac"))
        .orderBy(col("event_type"))
    }),

    // exact interpolated median — the correctness baseline the sketches
    // approximate; hash-checked against DuckDB's quantile_cont.
    "x19_exact_median" -> ((s, d) =>
      events(s, d).groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.5)), 6).as("median_value"))
        .orderBy(col("event_type")))
  )

  val oracleSql: Map[String, String] = Map(
    "x17g_approx_distinct_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
        |  CAST(NULL AS BIGINT) AS approx_users,
        |  CAST(NULL AS BIGINT) AS exact_users WHERE false""".stripMargin,

    "x18g_approx_median_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
        |  CAST(NULL AS DOUBLE) AS rank_frac WHERE false""".stripMargin,

    "x19_exact_median" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
