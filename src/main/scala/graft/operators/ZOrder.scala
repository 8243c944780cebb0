package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton) layout optimization — the multi-dimensional
  * clustering pass a 100 TB table needs so that range predicates on
  * EITHER of two dimensions prune files at scan time (the
  * OPTIMIZE-ZORDER idea: parquet keeps per-row-group min/max stats;
  * interleaving the key bits makes both dimensions spatially local per
  * file, so a 2-D box predicate skips most row groups, where a
  * single-column sort clusters only its own column).
  *
  * The bit-interleave is the standard magic-number spread — pure
  * integer Column arithmetic (codegen'd, no UDF), exact in both
  * engines, so the declared query is hash-checkable against DuckDB's
  * identical `&`/`|`/`<<` expression.
  */
object ZOrder {

  private val Masks = Seq(
    0x00FF00FFL -> 8, 0x0F0F0F0FL -> 4, 0x33333333L -> 2, 0x55555555L -> 1)

  /** Spread the low 16 bits of a non-negative value so bit i lands at
    * even position 2i (the Morton half-interleave).
    */
  def spread16(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (mask, sh)) =>
        (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(mask))
    }

  /** Morton code of two non-negative dimensions (low 16 bits each):
    * x on even bits, y on odd bits.
    */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` clustered by the Morton code of two dimension columns:
    * range-partition on the code (each output file covers one compact
    * z-range — a spatial tile), sort within partitions so row groups
    * inside a file stay tile-local too, then drop the helper column.
    * Readers prune on the ORIGINAL columns' min/max stats; nothing
    * about the layout is visible in the schema.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  numFiles: Int, path: String): Unit =
    df.withColumn("__z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** [[zorderWrite]] with the Hilbert curve as the clustering key —
    * tighter tiles at the same file count (the Hilbert walk has no
    * Morton-style diagonal jumps; consecutive indexes are always grid
    * neighbors, asserted in ZOrderSpec).
    */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String,
                   numFiles: Int, path: String): Unit = {
    graft.functions.GraftExtensions.register(df.sparkSession)
    df.withColumn("__h",
        graft.functions.GraftExtensions.hilbert(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  // Declared queries: the curve codes themselves over events (user
  // dimension × hour bucket) — the layout keys the write helpers
  // cluster on, hash-checked bit-for-bit against DuckDB (Morton as one
  // integer expression; Hilbert as the 16-level rotate-and-flip CTE
  // chain, generated below). Pure scan-project; the clustering EFFECT
  // (per-file spatial locality, walk adjacency) is asserted by
  // ZOrderSpec, which a hash compare cannot see.
  private def eventGrid(s: SparkSession, d: String): DataFrame = {
    val e = Tables(s, d, "events")
    // integral div (`/` on longs is double division in Spark SQL)
    val hour = call_function("div", Tables.epochNs(e, "ts"), lit(3600000000000L))
    e.select(col("event_id"),
      (col("user_id") % 65536).as("x"),
      (hour % 65536).as("y"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x53_zorder" -> ((s, d) =>
      eventGrid(s, d)
        .withColumn("z", morton2(col("x"), col("y")))
        .orderBy(col("z"), col("event_id"))),

    "x61_hilbert" -> ((s, d) => {
      graft.functions.GraftExtensions.register(s)
      eventGrid(s, d)
        .withColumn("h",
          graft.functions.GraftExtensions.hilbert(col("x"), col("y")))
        .orderBy(col("h"), col("event_id"))
    }))

  /** The Hilbert oracle: one CTE per bit level replaying the same
    * rotate-and-flip recurrence in portable SQL (xor avoided — the
    * quadrant digit is a 4-way CASE on (rx, ry)). Generated, not
    * hand-written, so the 16 stages cannot drift from each other.
    */
  private def hilbertOracleSql: String = {
    val levels = (0 until 16).map { i =>
      val s = 1L << (15 - i)
      val prev = if (i == 0) "g0" else s"l${i - 1}"
      s"""l$i AS (
         |  SELECT event_id, x0, y0,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END) ELSE x END AS x,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END) ELSE y END AS y,
         |    d + ${s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |                         WHEN rx = 0 AND ry = 1 THEN 1
         |                         WHEN rx = 1 AND ry = 1 THEN 2
         |                         ELSE 3 END) AS d
         |  FROM (SELECT event_id, x0, y0, x, y, d,
         |          CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM $prev)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH g0 AS (
       |  SELECT event_id,
       |    user_id % 65536 AS x0,
       |    (epoch_ns(ts) // 3600000000000) % 65536 AS y0,
       |    user_id % 65536 AS x,
       |    (epoch_ns(ts) // 3600000000000) % 65536 AS y,
       |    CAST(0 AS BIGINT) AS d
       |  FROM events
       |),
       |$levels
       |SELECT event_id, x0 AS x, y0 AS y, CAST(d AS BIGINT) AS h
       |FROM l15 ORDER BY h, event_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "x61_hilbert" -> hilbertOracleSql,

    "x53_zorder" ->
      """WITH t AS (
        |  SELECT event_id,
        |    user_id % 65536 AS x,
        |    (epoch_ns(ts) // 3600000000000) % 65536 AS y
        |  FROM events
        |), a AS (
        |  SELECT event_id, x, y, x & 65535 AS xa, y & 65535 AS ya FROM t
        |), b AS (
        |  SELECT *, (xa | (xa << 8)) & 16711935 AS xb, (ya | (ya << 8)) & 16711935 AS yb FROM a
        |), c AS (
        |  SELECT *, (xb | (xb << 4)) & 252645135 AS xc, (yb | (yb << 4)) & 252645135 AS yc FROM b
        |), d AS (
        |  SELECT *, (xc | (xc << 2)) & 858993459 AS xd, (yc | (yc << 2)) & 858993459 AS yd FROM c
        |), e AS (
        |  SELECT *, (xd | (xd << 1)) & 1431655765 AS xe, (yd | (yd << 1)) & 1431655765 AS ye FROM d
        |)
        |SELECT event_id, x, y, CAST(xe | (ye << 1) AS BIGINT) AS z
        |FROM e ORDER BY z, event_id""".stripMargin)
}
