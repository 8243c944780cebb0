package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL TEXT surface for every SURVEY.md §2 declared query — the
  * §3.4 contract ("both entry points, DSL and SQL, produce identical
  * results for the declared queries") made a first-class API instead of
  * the single q53 token it used to be.
  *
  * A real analytics user's first touch is the SQL string, so each
  * declared q/j key has a Spark-SQL statement runnable via [[run]] over
  * the registered table views. Where the DuckDB oracle text
  * (`SparkEntry.oracleSql`) is already valid Spark SQL it is reused
  * verbatim — one string, three engines (DSL plan, spark.sql, DuckDB).
  * Where the dialects genuinely diverge (DuckDB `strftime`,
  * `struct_pack(:=)`, bare `VARCHAR` casts, `QUALIFY`,
  * `string_agg(x, d ORDER BY ...)`, `//` integer division,
  * `generate_series`, regexp flag args, in-call `IGNORE NULLS`) the
  * [[overrides]] map carries the Spark-dialect form of the SAME
  * computation. `SqlParitySpec` asserts row-for-row equality of the two
  * entry points for every key, plus plan-shape equivalence for the
  * PlanAuditSpec-pinned queries (q52 broadcast dims, q54
  * WindowGroupLimit).
  */
object SqlSurface {

  /** The §2-declared relational/scalar query keys (the q- and j-
    * prefixed families).
    * Derived from the registry so a new declared key is automatically
    * under the parity contract.
    */
  def declaredKeys: Seq[String] =
    SparkEntry.queries.keys.filter(_.matches("^[qj]\\d.*")).toSeq.sorted

  /** Spark-dialect statements where the DuckDB oracle text does not
    * parse (or computes differently) under spark.sql. Every entry is
    * the same relation as the DSL form; comments name the divergence.
    */
  private[graft] val overrides: Map[String, String] = Map(
    // DuckDB regexp_replace takes a 'g' flag argument; Spark replaces
    // all matches by default.
    "j03_collapse_ws" ->
      """SELECT c_custkey, regexp_replace(c_name || '   ' || c_mktsegment, '\\s+', ' ') AS joined
        |FROM customer ORDER BY c_custkey LIMIT 20""".stripMargin,

    // bare VARCHAR cast (DuckDB) -> STRING
    "j05_regex_year" ->
      """SELECT o_orderkey,
        |  CAST(nullif(regexp_extract(CAST(o_orderdate AS STRING), '([0-9]{4})', 1), '') AS INT) AS yr
        |FROM orders ORDER BY o_orderkey LIMIT 20""".stripMargin,

    "j09_format_id" ->
      "SELECT o_orderkey, 'id_' || CAST(o_orderkey AS STRING) AS id FROM orders ORDER BY o_orderkey LIMIT 20",

    // strftime (DuckDB) -> date_format with JDK patterns
    "j10_date_format" ->
      """SELECT o_orderkey, date_format(o_orderdate, "yyyy-MM-dd'T'HH:mm:ss") AS iso
        |FROM orders ORDER BY o_orderkey LIMIT 20""".stripMargin,

    "j10b_to_timestamp_coerce" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'TBD'
        |                ELSE date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') END AS TIMESTAMP) AS ts
        |FROM orders ORDER BY o_orderkey LIMIT 30""".stripMargin,

    "j11_numeric_coerce" ->
      """SELECT o_orderkey,
        |  TRY_CAST(replace(CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
        |                        ELSE CAST(o_orderkey % 1000 AS STRING) || ',250.50' END,
        |                   ',', '') AS DOUBLE) AS amount
        |FROM orders ORDER BY o_orderkey LIMIT 40""".stripMargin,

    // struct_pack(k := v) (DuckDB) -> named_struct; to_json is already
    // a string in Spark, no VARCHAR cast
    "j12_json_nested" ->
      """SELECT o_orderkey,
        |  to_json(named_struct('o_orderkey', o_orderkey,
        |    'customer', named_struct('c_custkey', c_custkey, 'c_name', c_name))) AS msg
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 20""".stripMargin,

    "q14_to_json" ->
      """SELECT o_orderkey,
        |  to_json(named_struct('o_orderkey', o_orderkey, 'o_orderstatus', o_orderstatus)) AS msg
        |FROM orders ORDER BY o_orderkey LIMIT 10""".stripMargin,

    // the DuckDB oracle simplifies the JSON round trip to a projection
    // (DuckDB parses JSON differently); the Spark SQL surface runs the
    // REAL round trip the DSL runs — serialize, parse back, project
    "q10_from_json" ->
      """SELECT m.o_orderkey AS o_orderkey, m.o_orderstatus AS o_orderstatus
        |FROM (SELECT from_json(
        |        to_json(named_struct('o_orderkey', o_orderkey, 'o_orderstatus', o_orderstatus)),
        |        'o_orderkey BIGINT, o_orderstatus STRING') AS m
        |      FROM orders)
        |ORDER BY o_orderkey LIMIT 25""".stripMargin,

    // DuckDB puts IGNORE NULLS inside the call; Spark takes it after
    "q30_ffill" ->
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_id % 3 = 0 THEN props END) IGNORE NULLS
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,

    // string_agg(x, d ORDER BY ...) (DuckDB) -> listagg WITHIN GROUP
    "q32_takewhile_join" ->
      """SELECT l_orderkey,
        |  coalesce(listagg(v, ' ') WITHIN GROUP (ORDER BY l_linenumber, v)
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
        |  listagg(CAST(l_linenumber AS STRING), ',')
        |    WITHIN GROUP (ORDER BY l_linenumber) AS lns
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 50""".stripMargin,

    // QUALIFY (DuckDB) -> explicit subquery over the window
    "q34_dedup_first" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    row_number() OVER (PARTITION BY l_orderkey
        |                       ORDER BY l_linenumber, l_quantity) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,

    // generate_series + `//` integer division (DuckDB) ->
    // explode(sequence) + div
    "q43_range_batch" ->
      """SELECT x, (x - 1) div 10 + 1 AS batch, least(x + 9, 95) AS end_x
        |FROM (SELECT explode(sequence(1, 95, 10)) AS x) ORDER BY x""".stripMargin,

    // DuckDB FILTER omits WHERE; Spark requires it
    "q44_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // select-alias references inside ROLLUP/CUBE grouping sets are a
    // DuckDB-ism; compute ug in a subquery
    "q45_rollup" ->
      """SELECT event_type, ug, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM (SELECT event_type, user_id % 10 AS ug, value FROM events)
        |GROUP BY ROLLUP(event_type, ug)
        |ORDER BY event_type NULLS FIRST, ug NULLS FIRST""".stripMargin,

    "q55_cube" ->
      """SELECT event_type, ug, count(*) AS cnt,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount_cents
        |FROM (SELECT event_type, user_id % 10 AS ug, value FROM events)
        |GROUP BY CUBE(event_type, ug)
        |ORDER BY event_type NULLS FIRST, ug NULLS FIRST""".stripMargin,

    // DuckDB UNPIVOT ... ON ... INTO -> Spark UNPIVOT (v FOR metric IN)
    "q47_unpivot" ->
      """SELECT p_partkey, metric, v FROM (
        |  SELECT p_partkey, p_retailprice, CAST(p_size AS DOUBLE) AS p_size
        |  FROM part
        |) UNPIVOT (v FOR metric IN (p_retailprice, p_size))
        |ORDER BY p_partkey, metric""".stripMargin
  )

  /** BEYOND the §3.4 contract: the OLAP/analytics extension queries
    * whose semantics a SQL-first user would reach for as text — star
    * schemas, pricing summaries, funnels, retention, SCD2, z-scores,
    * quantile buckets, per-source caps, deterministic shuffles. Same
    * parity guarantee as the declared keys (SqlParitySpec iterates
    * both lists). Time arithmetic binds the CURRENT testdata encoding
    * (TIMESTAMP_MICROS read as NTZ; see Tables.epochNs) — the parity
    * spec is the tripwire if the driver regenerates as NANOS longs.
    */
  val extendedKeys: Seq[String] = Seq(
    "x19_exact_median", "x20_salted_join", "x47_shuffle_order",
    "x59_value_quartiles", "x66_temperature_mix", "x67_scd2_intervals",
    "x68_funnel_stages", "x69_retention_cohorts", "x86_event_zscore",
    "x89_dau_wow", "x91_local_supplier_volume", "x92_pricing_summary",
    "x93_source_cap")

  /** epoch-nanosecond LONG of the events `ts` column in Spark SQL —
    * the textual twin of Tables.epochNs for the current micros/NTZ
    * encoding (session timezone is pinned UTC by every entry point,
    * so the NTZ→TIMESTAMP cast is a wall-clock identity).
    */
  private val epochNsSql = "unix_micros(CAST(ts AS TIMESTAMP)) * 1000"

  private[graft] val extendedOverrides: Map[String, String] = Map(
    // DuckDB quantile_cont -> ANSI percentile_cont WITHIN GROUP
    "x19_exact_median" ->
      """SELECT event_type,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS median_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // '0x'||hex::BIGINT cast (DuckDB) -> conv(hex, 16, 10)
    "x47_shuffle_order" ->
      """SELECT doc_id, shard, CAST(row_number() OVER (
        |    PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
        |FROM (
        |  SELECT doc_id,
        |    md5('42:' || CAST(doc_id AS STRING)) AS k,
        |    CAST(conv(substr(md5('42:' || CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 8 AS shard
        |  FROM documents
        |)
        |ORDER BY shard, pos""".stripMargin,

    // quantile_cont over an array + 1-based list indexing (DuckDB) ->
    // percentile(col, array(...)) + element_at; group-less regex token
    // count needs the explicit idx=0 (whole-match) argument in Spark
    "x59_value_quartiles" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)) AS INT) AS n
        |  FROM documents
        |), b AS (
        |  SELECT percentile(n, array(0.25D, 0.5D, 0.75D)) AS qs FROM t
        |)
        |SELECT doc_id, n,
        |  1 + CAST(n > element_at(qs, 1) AS INT) + CAST(n > element_at(qs, 2) AS INT)
        |    + CAST(n > element_at(qs, 3) AS INT) AS bucket
        |FROM t, b ORDER BY doc_id""".stripMargin,

    // epoch_ns (DuckDB) -> unix_micros over the NTZ cast
    "x67_scd2_intervals" ->
      s"""SELECT user_id, event_id, event_type,
         |  $epochNsSql AS valid_from,
         |  lead($epochNsSql) OVER (PARTITION BY user_id
         |    ORDER BY $epochNsSql, event_id) AS valid_to
         |FROM events
         |ORDER BY user_id, valid_from, event_id""".stripMargin,

    "x68_funnel_stages" ->
      s"""WITH t AS (
         |  SELECT user_id, event_type, $epochNsSql AS t FROM events
         |), v AS (
         |  SELECT user_id, min(t) AS v FROM t WHERE event_type = 'view' GROUP BY 1
         |), c AS (
         |  SELECT t.user_id, min(t.t) AS c FROM t JOIN v USING (user_id)
         |  WHERE t.event_type = 'click' AND t.t > v.v GROUP BY 1
         |), p AS (
         |  SELECT t.user_id, min(t.t) AS p FROM t JOIN c USING (user_id)
         |  WHERE t.event_type = 'purchase' AND t.t > c.c GROUP BY 1
         |)
         |SELECT v.user_id, v.v, c.c, p.p,
         |  CAST(1 + CAST(c.c IS NOT NULL AS INT) + CAST(p.p IS NOT NULL AS INT) AS INT)
         |    AS funnel_stage
         |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
         |ORDER BY user_id""".stripMargin,

    // epoch_ns + `//` integer division (DuckDB) -> unix_micros + div
    "x69_retention_cohorts" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id,
         |    $epochNsSql div 86400000000000 AS day
         |  FROM events
         |), cohort AS (
         |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY 1
         |)
         |SELECT cohort.cohort_day, act.day - cohort.cohort_day AS day_offset,
         |  CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
         |FROM act JOIN cohort USING (user_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x89_dau_wow" ->
      s"""WITH dau AS (
         |  SELECT $epochNsSql div 86400000000000 AS day_bucket,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS dau
         |  FROM events GROUP BY 1
         |)
         |SELECT d.day_bucket, d.dau,
         |  round(CAST(d.dau AS DOUBLE) / p.dau - 1.0, 6) AS wow_growth
         |FROM dau d LEFT JOIN dau p ON p.day_bucket = d.day_bucket - 7
         |ORDER BY d.day_bucket""".stripMargin
  )

  /** The Spark-SQL statement for a declared or extended key. */
  def statement(key: String): String =
    overrides.getOrElse(key,
      extendedOverrides.getOrElse(key,
        SparkEntry.oracleSql.getOrElse(key,
          throw new IllegalArgumentException(s"no SQL surface for $key"))))

  /** Run a declared query through the SQL text surface: register the
    * table views and execute the statement.
    */
  def run(spark: SparkSession, dir: String, key: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(statement(key))
  }
}
