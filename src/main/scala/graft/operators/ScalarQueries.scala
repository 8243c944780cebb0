package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Tables

/** Declared queries for the scalar-function surface (SURVEY.md §2.8,
  * J-01…J-12) plus the JSON queue-message round trip (OP-10/14/57).
  *
  * Coercion semantics (pandas errors="coerce") are expressed with
  * try_-flavored functions so they hold under ANSI mode (Spark 4 default):
  * malformed input -> null, never an exception.
  */
object ScalarQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // J-01 / OP-45: lower.
    "j01_lower" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"), lower(col("c_name")).as("lname"))
        .orderBy(col("c_custkey")).limit(20)),

    // J-02 / OP-46: literal replace.
    "j02_replace" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"), regexp_replace(col("p_name"), " ", "_").as("norm"))
        .orderBy(col("p_partkey")).limit(20)),

    // J-03 / OP-47: regex whitespace collapse.
    "j03_collapse_ws" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          regexp_replace(concat(col("c_name"), lit("   "), col("c_mktsegment")),
            "\\s+", " ").as("joined"))
        .orderBy(col("c_custkey")).limit(20)),

    // J-04 / OP-48: trim.
    "j04_trim" -> ((s, d) =>
      Tables(s, d, "supplier")
        .select(col("s_suppkey"),
          trim(concat(lit("\t "), col("s_name"), lit("  "))).as("name"))
        .orderBy(col("s_suppkey"))),

    // J-05 / OP-49: regex extract 4-digit year, coerce to int.
    "j05_regex_year" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          nullif(regexp_extract(col("o_orderdate").cast("string"), "([0-9]{4})", 1), lit(""))
            .cast("int").as("yr"))
        .orderBy(col("o_orderkey")).limit(20)),

    // J-06 / OP-50: substring-contains conditional.
    "j06_case_contains" -> ((s, d) =>
      Tables(s, d, "part")
        .select(col("p_partkey"),
          when(col("p_type").contains("ECONOMY"), lit(9999))
            .otherwise(col("p_size")).as("sz"))
        .orderBy(col("p_partkey")).limit(50)),

    // J-07 / OP-51: last path segment via split.
    "j07_split_last" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          element_at(split(col("c_name"), "#"), -1).as("seg"))
        .orderBy(col("c_custkey")).limit(20)),

    // J-08 / OP-52: startswith + concat (URL absolutize pattern).
    "j08_absolutize" -> ((s, d) =>
      Tables(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_name").startsWith("Customer"),
            concat(lit("https://host/"), col("c_name")))
            .otherwise(col("c_name")).as("url"))
        .orderBy(col("c_custkey")).limit(20)),

    // J-09 / OP-53: id synthesis via string format.
    "j09_format_id" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          format_string("id_%d", col("o_orderkey")).as("id"))
        .orderBy(col("o_orderkey")).limit(20)),

    // J-10 / OP-54: timestamp formatting (ISO-8601 'T' separator).
    "j10_date_format" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"))
        .orderBy(col("o_orderkey")).limit(20)),

    // OP-54: to_timestamp with coerce (invalid -> null, ANSI-safe).
    "j10b_to_timestamp_coerce" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 5 === 0, lit("TBD"))
            .otherwise(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")).as("raw"))
        .select(col("o_orderkey"), try_to_timestamp(col("raw")).as("ts"))
        .orderBy(col("o_orderkey")).limit(30)),

    // J-11 / OP-55: numeric parse with comma strip + coerce.
    "j11_numeric_coerce" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("N/A"))
            .otherwise(concat((col("o_orderkey") % 1000).cast("string"),
              lit(",250.50"))).as("raw"))
        .select(col("o_orderkey"),
          expr("try_cast(replace(raw, ',', '') AS DOUBLE)").as("amount"))
        .orderBy(col("o_orderkey")).limit(40)),

    // J-12 / OP-57: JSON serialize of a nested struct (queue message shape).
    "j12_json_nested" -> ((s, d) => {
      val c = Tables(s, d, "customer")
        .select(col("c_custkey"), col("c_name"))
      Tables(s, d, "orders")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey"),
            struct(col("c_custkey"), col("c_name")).as("customer"))).as("msg"))
        .orderBy(col("o_orderkey")).limit(20)
    }),

    // OP-14: queue sink payload — flat to_json.
    "q14_to_json" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          to_json(struct(col("o_orderkey"), col("o_orderstatus"))).as("msg"))
        .orderBy(col("o_orderkey")).limit(10)),

    // OP-10/57: queue source — JSON round trip (serialize then parse back).
    "q10_from_json" -> ((s, d) => {
      val schema = new StructType()
        .add("o_orderkey", "long").add("o_orderstatus", "string")
      Tables(s, d, "orders")
        .select(to_json(struct(col("o_orderkey"), col("o_orderstatus"))).as("body"))
        .select(from_json(col("body"), schema).as("m"))
        .select(col("m.o_orderkey").as("o_orderkey"),
          col("m.o_orderstatus").as("o_orderstatus"))
        .orderBy(col("o_orderkey")).limit(25)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "j01_lower" ->
      "SELECT c_custkey, lower(c_name) AS lname FROM customer ORDER BY c_custkey LIMIT 20",
    "j02_replace" ->
      "SELECT p_partkey, replace(p_name, ' ', '_') AS norm FROM part ORDER BY p_partkey LIMIT 20",
    "j03_collapse_ws" ->
      """SELECT c_custkey, regexp_replace(c_name || '   ' || c_mktsegment, '\s+', ' ', 'g') AS joined
        |FROM customer ORDER BY c_custkey LIMIT 20""".stripMargin,
    "j04_trim" ->
      """SELECT s_suppkey, trim(chr(9) || ' ' || s_name || '  ') AS name
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "j05_regex_year" ->
      """SELECT o_orderkey,
        |  CAST(nullif(regexp_extract(CAST(o_orderdate AS VARCHAR), '([0-9]{4})', 1), '') AS INT) AS yr
        |FROM orders ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "j06_case_contains" ->
      """SELECT p_partkey, CASE WHEN p_type LIKE '%ECONOMY%' THEN 9999 ELSE p_size END AS sz
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "j07_split_last" ->
      "SELECT c_custkey, split_part(c_name, '#', 2) AS seg FROM customer ORDER BY c_custkey LIMIT 20",
    "j08_absolutize" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name LIKE 'Customer%' THEN 'https://host/' || c_name ELSE c_name END AS url
        |FROM customer ORDER BY c_custkey LIMIT 20""".stripMargin,
    "j09_format_id" ->
      "SELECT o_orderkey, 'id_' || CAST(o_orderkey AS VARCHAR) AS id FROM orders ORDER BY o_orderkey LIMIT 20",
    "j10_date_format" ->
      "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso FROM orders ORDER BY o_orderkey LIMIT 20",
    "j10b_to_timestamp_coerce" ->
      """SELECT o_orderkey,
        |  TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'TBD'
        |                ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS TIMESTAMP) AS ts
        |FROM orders ORDER BY o_orderkey LIMIT 30""".stripMargin,
    "j11_numeric_coerce" ->
      """SELECT o_orderkey,
        |  TRY_CAST(replace(CASE WHEN o_orderkey % 7 = 0 THEN 'N/A'
        |                        ELSE CAST(o_orderkey % 1000 AS VARCHAR) || ',250.50' END,
        |                   ',', '') AS DOUBLE) AS amount
        |FROM orders ORDER BY o_orderkey LIMIT 40""".stripMargin,
    "j12_json_nested" ->
      """SELECT o_orderkey,
        |  CAST(to_json(struct_pack(o_orderkey := o_orderkey,
        |    customer := struct_pack(c_custkey := c_custkey, c_name := c_name))) AS VARCHAR) AS msg
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 20""".stripMargin,
    "q14_to_json" ->
      """SELECT o_orderkey,
        |  CAST(to_json(struct_pack(o_orderkey := o_orderkey, o_orderstatus := o_orderstatus)) AS VARCHAR) AS msg
        |FROM orders ORDER BY o_orderkey LIMIT 10""".stripMargin,
    "q10_from_json" ->
      "SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 25"
  )
}
