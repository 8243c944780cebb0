package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data export: deterministic sharding + a checksummed
  * manifest — the handoff contract between a curation pipeline and a
  * trainer. Every doc is assigned a shard by a content-independent
  * hash of its id (stable under corpus growth, re-partitioning, and
  * re-runs — the x21/x22 md5-prefix convention), and the manifest
  * records, per shard: row count, token count, id range, and an
  * order-independent content checksum (bit_xor of each doc's 48-bit
  * md5 uniform). A trainer re-derives the manifest from the shards it
  * received and byte-compares — torn writes, dropped shards, and
  * duplicated docs all surface as checksum/count mismatches.
  *
  * Scale shape: the per-doc columns are scan-side; the manifest is one
  * hash aggregation with full map-side combine (count/sum/min/max/
  * bit_xor are all commutative monoids), so the exchange moves
  * NShards pre-aggregated rows per input partition — bounded at any
  * corpus size. The physical write (demonstrated in ExportSpec:
  * repartition on the shard column + partitionBy parquet, then re-read
  * and re-derive) reuses the same column, so file layout and manifest
  * can never disagree on membership.
  *
  * Reference analog: release_batcher.py:14-46 chunks releases for
  * export but keeps no verification record; the manifest is the §7.4
  * extension of that step to a 100 TB corpus where silent shard loss
  * is a real failure mode.
  */
object ExportQueries {
  type Q = (SparkSession, String) => DataFrame

  val NShards = 16

  private def h: Column = md5(col("doc_id").cast("string"))

  /** Shard id in [0, nShards): 16-bit md5 prefix mod nShards. Works for
    * any id type (string ids hash through the same cast).
    */
  def shardOf(nShards: Int = NShards): Column =
    pmod(conv(substring(h, 1, 4), 16, 10).cast("long"), lit(nShards.toLong))

  /** 48-bit md5 uniform of the doc id (the x104 convention) — the
    * per-doc term of the order-independent manifest checksum.
    */
  def docHash48: Column = conv(substring(h, 1, 12), 16, 10).cast("long")

  /** Per-doc shard assignment + manifest inputs. */
  def shardAssign(docs: DataFrame, nShards: Int = NShards): DataFrame =
    docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
      shardOf(nShards).as("shard"), docHash48.as("__h"))

  /** The manifest: one row per shard, derived entirely from the
    * assignment columns.
    */
  def manifest(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        expr("bit_xor(__h)").as("checksum"))
      .orderBy(col("shard"))

  val queries: Map[String, Q] = Map(
    "x108_shard_manifest" -> ((s, d) =>
      manifest(shardAssign(Tables(s, d, "documents"))))
  )

  /** DuckDB hex→int as an explicit positional sum (no hex-cast in
    * DuckDB) — the SamplingQueries.hexSum convention, parameterized by
    * width.
    */
  private def hexSum(hExpr: String, width: Int): String = (0 until width).map { i =>
    val pow = BigInt(16).pow(width - 1 - i)
    s"(strpos('0123456789abcdef', substr($hExpr, ${i + 1}, 1)) - 1) * $pow"
  }.mkString(" + ")

  val oracleSql: Map[String, String] = Map(
    "x108_shard_manifest" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(string_split_regex(lower(trim(text)), '\\s+')) AS ws_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents
         |), a AS (
         |  SELECT doc_id, ws_tokens,
         |    CAST((${hexSum("h", 4)}) % $NShards AS BIGINT) AS shard,
         |    CAST(${hexSum("h", 12)} AS BIGINT) AS hv
         |  FROM t
         |)
         |SELECT shard,
         |  count(*) AS n_docs,
         |  CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS min_doc,
         |  max(doc_id) AS max_doc,
         |  bit_xor(hv) AS checksum
         |FROM a GROUP BY shard ORDER BY shard""".stripMargin
  )
}
