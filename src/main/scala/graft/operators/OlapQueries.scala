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

    // cube: the full 2^n grouping-set lattice (per-pair, per-type,
    // per-decile, grand total) — one shuffle computes all four
    // aggregation levels via grouping-id expansion, not four scans
    "q55_cube" -> ((s, d) =>
      Tables(s, d, "events")
        .withColumn("ug", col("user_id") % 10)
        .cube(col("event_type"), col("ug"))
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast("long")).as("amount_cents"))
        .orderBy(col("event_type"), col("ug"))),

    // fixed-width value histogram: bucket is a pure projection, one agg
    "q46_histogram" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(floor(col("value") / 50).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket"))),

    // unpivot/melt: wide metric columns to long (metric, value) rows —
    // a metadata-only Expand, no shuffle at all
    "q47_unpivot" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "v")
        .orderBy(col("p_partkey"), col("metric"))),

    // ntile quartiles over the distinct-user relation. The global window
    // is over a BOUNDED tiny frame (distinct users of the probe set) —
    // the same justified use as IVF centroid seeding; per-key quantiles
    // at scale go through x18's sketch instead.
    "q48_ntile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("user_id"))
      Tables(s, d, "events").select(col("user_id")).distinct()
        .withColumn("quartile", ntile(4).over(w))
        .orderBy(col("user_id"))
    }),

    // distributed second-moment aggregates (merge-formula partials)
    "q49_stats" -> ((s, d) =>
      Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(round(stddev_samp(col("value")), 6).as("sd"),
          round(corr(col("value"), col("user_id").cast("double")), 6).as("r"),
          round(covar_samp(col("value"), col("user_id").cast("double")), 6).as("cov"))
        .orderBy(col("event_type"))),

    // full-outer join: customers with no orders keep a 0 count; an
    // aggregate-then-join shape so the outer side stays one row per key
    "q50_full_outer" -> ((s, d) => {
      val perCust = Tables(s, d, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("order_cnt"))
      Tables(s, d, "customer").select(col("c_custkey"), col("c_name"))
        .join(perCust, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"),
          coalesce(col("order_cnt"), lit(0L)).as("order_cnt"))
        .orderBy(col("c_custkey"))
    }),

    // bounded sliding window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT):
    // per-user rolling mean in integer-cents space, partitioned windows
    "q51_rolling_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      Tables(s, d, "events")
        .select(col("event_id"), col("user_id"),
          floor(avg(round(col("value") * 100).cast("long")).over(w)).cast("long")
            .as("roll_cents"))
        .orderBy(col("event_id"))
    }),

    // the canonical star join: fact (lineitem⋈orders shuffle join) with
    // BROADCAST dimension sides (customer, nation) — revenue per nation
    // in integer cents. Dims broadcast (explicitly for nation, by size
    // for customer); only the fact tables shuffle.
    "q52_star_join" -> ((s, d) => {
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
        .cast("long")
      Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, d, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(rev).as("revenue_cents"), count(lit(1)).as("line_cnt"))
        .orderBy(col("n_name"))
    }),

    // the same relation THROUGH THE SQL TEXT SURFACE (spark.sql over
    // registered views) — proves the engine's SQL API end-to-end; the
    // DuckDB oracle is literally the same statement
    "q53_sql_surface" -> ((s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql(
        """SELECT n_name,
          |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
          |    AS revenue_cents,
          |  count(*) AS line_cnt
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }),

    // top-k per group via rank-filter pushdown: Spark 4 rewrites the
    // row_number <= k filter into a WindowGroupLimit that keeps a
    // per-group k-heap on BOTH the map side (before the shuffle) and
    // the reduce side — no group is ever fully sorted or fully
    // shuffled, the per-key scale shape a bare window + filter lacks.
    // PlanAuditSpec asserts the operator is actually planned.
    // o_orderkey is unique -> deterministic tiebreak cross-engine.
    "q54_topk_group" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("price_cents"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 2)
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    // TPC-H Q1's pricing summary: the canonical scan-side aggregate —
    // eight aggregates per (returnflag, linestatus) over one lineitem
    // pass, fully map-side-combinable; the shuffle moves at most a few
    // dozen partial rows per task whatever the fact size. Money sums in
    // integer cents (per-row rounding, then exact integer sums); the
    // averages divide two EXACT integers so the float surface carries
    // no partial-sum order seam.
    "x92_pricing_summary" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("sum_disc_c"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")))).as("sum_charge_c"),
          count(lit(1)).as("n"),
          round(sum(cents(col("l_quantity"))).cast("double") /
            count(lit(1)), 6).as("avg_qty_c"),
          round(sum(cents(col("l_extendedprice"))).cast("double") /
            count(lit(1)), 6).as("avg_price_c"),
          round(sum(cents(col("l_discount"))).cast("double") /
            count(lit(1)), 6).as("avg_disc_c"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q5's local-supplier-volume shape: the canonical 6-way
    // multi-join benchmark — revenue per nation for one region where
    // the customer and the supplier share a nation. Catalyst broadcasts
    // every dimension (region/nation/customer/supplier); only the two
    // fact tables shuffle on the order key. Revenue leaves the hashed
    // surface as integer cents (per-row rounding — identical IEEE ops
    // per row on both engines — then an exact integer sum).
    "x91_local_supplier_volume" -> ((s, d) => {
      val nation = Tables(s, d, "nation")
        .join(Tables(s, d, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
      val cust = Tables(s, d, "customer")
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),

    // z-score anomaly detection: events whose value sits > 3 sample
    // standard deviations from their event_type's mean — the telemetry
    // outlier sweep. Per-type stats are a bounded broadcast relation;
    // the scan-side z is a pure projection. The threshold tests the
    // ROUNDED z (round 4) so the float surface both engines compare is
    // identical; the underlying avg/stddev jitter is ~1e-12.
    "x86_event_zscore" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val stats = ev.groupBy(col("event_type"))
        .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
      ev.join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("mu")) / col("sd"), 4).as("z"))
        .filter(abs(col("z")) > 3.0)
        .orderBy(col("event_id"))
    })
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

    // NULLS FIRST matches Spark's ascending default for the rollup's
    // subtotal rows (the driver's hash sorts rows anyway; this keeps the
    // two outputs literally row-identical)
    "q45_rollup" ->
      """SELECT event_type, user_id % 10 AS ug, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM events GROUP BY ROLLUP(event_type, ug)
        |ORDER BY event_type NULLS FIRST, ug NULLS FIRST""".stripMargin,

    "q46_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket, count(*) AS cnt
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q55_cube" ->
      """SELECT event_type, user_id % 10 AS ug, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM events GROUP BY CUBE(event_type, ug)
        |ORDER BY event_type NULLS FIRST, ug NULLS FIRST""".stripMargin,

    "q47_unpivot" ->
      """UNPIVOT (
        |  SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size
        |  FROM part
        |) ON p_retailprice, p_size INTO NAME metric VALUE v
        |ORDER BY p_partkey, metric""".stripMargin,

    "q48_ntile" ->
      """SELECT user_id, CAST(ntile(4) OVER (ORDER BY user_id) AS INT) AS quartile
        |FROM (SELECT DISTINCT user_id FROM events)
        |ORDER BY user_id""".stripMargin,

    "q49_stats" ->
      """SELECT event_type,
        |  round(stddev_samp(value), 6) AS sd,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS r,
        |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS cov
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q50_full_outer" ->
      """SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey, c.c_name,
        |  COALESCE(o.order_cnt, 0) AS order_cnt
        |FROM customer c FULL JOIN (
        |  SELECT o_custkey AS c_custkey, count(*) AS order_cnt
        |  FROM orders GROUP BY 1
        |) o ON c.c_custkey = o.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q51_rolling_avg" ->
      """SELECT event_id, user_id,
        |  CAST(floor(avg(CAST(round(value * 100) AS BIGINT))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS BIGINT) AS roll_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "q52_star_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  count(*) AS line_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q53_sql_surface" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  count(*) AS line_cnt
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q54_topk_group" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |  CAST(rnk AS INT) AS rnk
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |) WHERE rnk <= 2 ORDER BY o_custkey, rnk""".stripMargin,

    "x92_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_qty_c,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_price_c,
        |  round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / count(*), 6) AS avg_disc_c
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x91_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""".stripMargin,

    "x86_event_zscore" ->
      """WITH st AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY 1
        |)
        |SELECT event_id, e.event_type,
        |  round((value - mu) / sd, 4) AS z
        |FROM events e JOIN st USING (event_type)
        |WHERE abs(round((value - mu) / sd, 4)) > 3.0
        |ORDER BY event_id""".stripMargin
  )
}
