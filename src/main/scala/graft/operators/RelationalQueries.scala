package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declared queries for the scan / filter / projection / join / sort /
  * batching operator families (SURVEY.md §2.1, §2.3, §2.4, §2.7).
  *
  * Each entry has a DuckDB-oracle SQL twin in [[oracleSql]]; column names
  * and row ordering are made to match exactly (driver hashes sorted-by-name
  * columns of the ordered result).
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // OP-08: point lookup by key — filter pushes down to the parquet scan.
    "q08_point_lookup" -> ((s, d) =>
      Tables(s, d, "customer").filter(col("c_custkey") === 42)),

    // OP-09/41: last-by-key (top-1 via sort desc + limit).
    "q09_top1_desc" -> ((s, d) =>
      Tables(s, d, "orders").orderBy(col("o_orderkey").desc).limit(1)),

    // OP-13/29: delete-by-key as anti-join rewrite (cascade analog).
    "q13_delete_anti" -> ((s, d) => {
      val lowBal = Tables(s, d, "customer")
        .filter(col("c_acctbal") < 100).select(col("c_custkey"))
      Tables(s, d, "orders")
        .join(lowBal, col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // OP-16/45/46: header normalization (lower + space->underscore).
    "q16_norm_rename" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          lower(regexp_replace(col("c_mktsegment"), " ", "_")).as("seg"))
        .orderBy(col("c_custkey")).limit(20)),

    // OP-17: column pruning — ReadSchema must show only the needed
    // columns. l_quantity joins the sort key: testdata lineitem has
    // DUPLICATE (l_orderkey, l_linenumber) pairs, and ties straddling
    // the LIMIT boundary would let the two engines return different row
    // SETS (the canonicalizer sorts rows, so only set differences —
    // exactly what a non-total order + limit produces — break the hash)
    "q17_projection" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .select(col("l_orderkey"), col("l_quantity"))
        .limit(50)),

    // OP-18: filter by computed normalization predicate.
    "q18_computed_pred" -> ((s, d) =>
      Tables(s, d, "nation")
        .filter(lower(regexp_replace(col("n_name"), " ", "_")) =!= "united_states")
        .orderBy(col("n_nationkey"))),

    // OP-19: threshold filter on derived year.
    "q19_year_filter" -> ((s, d) =>
      Tables(s, d, "orders")
        .filter(year(col("o_orderdate")) >= 1998)
        .agg(count(lit(1)).as("cnt"))),

    // OP-20: pattern predicate.
    "q20_like" -> ((s, d) =>
      Tables(s, d, "part")
        .filter(col("p_name").like("%red%"))
        .agg(count(lit(1)).as("cnt"))),

    // OP-21: null/empty guards.
    "q21_nullempty_guard" -> ((s, d) =>
      Tables(s, d, "customer")
        .filter(col("c_mktsegment").isNotNull && col("c_mktsegment") =!= "")
        .agg(count(lit(1)).as("cnt"))),

    // OP-22: ""<->null canonicalization (coalesce/nullif round trip).
    "q22_null_canon" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          coalesce(nullif(trim(col("c_mktsegment")), lit("")), lit("<none>")).as("seg"))
        .orderBy(col("c_custkey")).limit(20)),

    // OP-23: whole-frame trim.
    "q23_trim" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          trim(concat(lit("  "), col("c_name"), lit(" "))).as("name"))
        .orderBy(col("c_custkey")).limit(20)),

    // OP-24: drop-all-null row guard.
    "q24_drop_null_rows" -> ((s, d) =>
      Tables(s, d, "events")
        .filter(!(col("user_id").isNull && col("event_type").isNull))
        .agg(count(lit(1)).as("cnt"))),

    // OP-25: literal column append.
    "q25_lit_column" -> ((s, d) =>
      Tables(s, d, "nation")
        .select(col("n_nationkey"), lit("rel_2024").as("release_id"))
        .orderBy(col("n_nationkey"))),

    // OP-26: equi-join, small dimension side broadcast.
    "q26_join" -> ((s, d) => {
      val c = Tables(s, d, "customer").select(col("c_custkey"), col("c_name"))
      Tables(s, d, "orders")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
        .orderBy(col("o_orderkey")).limit(50)
    }),

    // OP-27: anti membership probe (files-missing analog).
    "q27_anti" -> ((s, d) => {
      val o = Tables(s, d, "orders").select(col("o_custkey"))
      Tables(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")).limit(50)
    }),

    // OP-27b: semi membership probe.
    "q27b_semi" -> ((s, d) => {
      val o = Tables(s, d, "orders").select(col("o_custkey"))
      Tables(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")).limit(50)
    }),

    // OP-28/63: CDC changed-row detection between two table versions.
    "q28_cdc_changed" -> ((s, d) => {
      val orders = Tables(s, d, "orders")
      val v2 = orders.select(col("o_orderkey").as("k"),
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1)
          .otherwise(col("o_totalprice")).as("p2"))
      orders.join(v2, col("o_orderkey") === col("k"))
        .filter(col("o_totalprice") =!= col("p2"))
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    // OP-40: sort by key with secondary key.
    "q40_sort" -> ((s, d) =>
      Tables(s, d, "nation")
        .orderBy(col("n_regionkey"), col("n_name"))
        .select(col("n_name"))),

    // OP-42: head-N truncation.
    "q42_limit" -> ((s, d) =>
      Tables(s, d, "part").orderBy(col("p_partkey")).limit(25)),

    // OP-43: page-range batching via sequence + arithmetic (release_batcher analog).
    "q43_range_batch" -> ((s, d) => {
      val _ = d
      s.range(1).select(explode(sequence(lit(1L), lit(95L), lit(10L))).as("x"))
        .select(col("x"),
          (((col("x") - 1) / 10).cast("long") + 1).as("batch"),
          least(col("x") + 9, lit(95L)).as("end_x"))
        .orderBy(col("x"))
    }),

    // OP-35: count guard.
    "q35_count" -> ((s, d) =>
      Tables(s, d, "supplier").agg(count(lit(1)).as("cnt")))
  )

  val oracleSql: Map[String, String] = Map(
    "q08_point_lookup" -> "SELECT * FROM customer WHERE c_custkey = 42",
    "q09_top1_desc" -> "SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 1",
    "q13_delete_anti" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 100)
        |ORDER BY o_orderkey""".stripMargin,
    "q16_norm_rename" ->
      "SELECT c_custkey, lower(replace(c_mktsegment, ' ', '_')) AS seg FROM customer ORDER BY c_custkey LIMIT 20",
    "q17_projection" ->
      "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 50",
    "q18_computed_pred" ->
      "SELECT * FROM nation WHERE lower(replace(n_name, ' ', '_')) <> 'united_states' ORDER BY n_nationkey",
    "q19_year_filter" ->
      "SELECT count(*) AS cnt FROM orders WHERE year(o_orderdate) >= 1998",
    "q20_like" -> "SELECT count(*) AS cnt FROM part WHERE p_name LIKE '%red%'",
    "q21_nullempty_guard" ->
      "SELECT count(*) AS cnt FROM customer WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> ''",
    "q22_null_canon" ->
      "SELECT c_custkey, coalesce(nullif(trim(c_mktsegment), ''), '<none>') AS seg FROM customer ORDER BY c_custkey LIMIT 20",
    "q23_trim" ->
      "SELECT c_custkey, trim('  ' || c_name || ' ') AS name FROM customer ORDER BY c_custkey LIMIT 20",
    "q24_drop_null_rows" ->
      "SELECT count(*) AS cnt FROM events WHERE NOT (user_id IS NULL AND event_type IS NULL)",
    "q25_lit_column" ->
      "SELECT n_nationkey, 'rel_2024' AS release_id FROM nation ORDER BY n_nationkey",
    "q26_join" ->
      """SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 50""".stripMargin,
    "q27_anti" ->
      """SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey LIMIT 50""".stripMargin,
    "q27b_semi" ->
      """SELECT c_custkey FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey LIMIT 50""".stripMargin,
    "q28_cdc_changed" ->
      """SELECT a.o_orderkey FROM orders a
        |JOIN (SELECT o_orderkey AS k,
        |             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS p2
        |      FROM orders) b ON a.o_orderkey = b.k
        |WHERE a.o_totalprice <> b.p2 ORDER BY a.o_orderkey""".stripMargin,
    "q40_sort" -> "SELECT n_name FROM nation ORDER BY n_regionkey, n_name",
    "q42_limit" -> "SELECT * FROM part ORDER BY p_partkey LIMIT 25",
    "q43_range_batch" ->
      """SELECT x, (x - 1) // 10 + 1 AS batch, least(x + 9, 95) AS end_x
        |FROM generate_series(1, 95, 10) AS t(x) ORDER BY x""".stripMargin,
    "q35_count" -> "SELECT count(*) AS cnt FROM supplier"
  )
}
