package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver testdata tables (TESTDATA.md).
  * One parquet file per table under an sf directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. Filters/projections applied by
    * callers push down to the parquet scan (verified via explain in specs).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views so spark.sql can address them by
    * the same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Epoch-nanosecond LONG view of a time column, whatever physical type
    * the writer used. The driver testdata has shipped both TIMESTAMP(NANOS)
    * (read as epoch-nano longs under `nanosAsLong`) and TIMESTAMP(MICROS)
    * (read as TIMESTAMP_NTZ); time-bucket arithmetic needs exact 64-bit
    * integers either way (double math corrupts nanos above 2^53), and the
    * DuckDB oracle's `epoch_ns(ts)` treats naive timestamps as UTC —
    * matched here because every entry point pins
    * `spark.sql.session.timeZone=UTC`, making the NTZ→TIMESTAMP cast a
    * wall-clock identity.
    */
  def epochNs(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case LongType         => col(name)
      case TimestampType    => unix_micros(col(name)) * 1000L
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType)) * 1000L
      case dt => throw new IllegalArgumentException(
        s"column $name: expected a time type, got $dt")
    }
}
