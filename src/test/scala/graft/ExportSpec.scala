package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ExportQueries

/** Sharded export manifest (x108): shard assignment determinism, the
  * physical partitionBy write/re-read roundtrip (file layout and
  * manifest derive from the SAME column so they cannot disagree), and
  * tamper sensitivity (a dropped doc flips its shard's checksum).
  */
class ExportSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("manifest covers the corpus exactly, shards in range, deterministic") {
    val m = ExportQueries.manifest(ExportQueries.shardAssign(docs))
      .localCheckpoint(true)
    try {
      val rows = m.collect()
      assert(rows.map(_.getLong(1)).sum === docs.count(),
        "shard doc counts must sum to the corpus")
      assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < ExportQueries.NShards))
      // deterministic under re-partitioning: same manifest from a
      // differently-partitioned input
      val m2 = ExportQueries.manifest(
        ExportQueries.shardAssign(docs.repartition(7))).collect()
      assert(m2.toSeq === rows.toSeq, "manifest must be partitioning-invariant")
    } finally CheckpointBlocks.release(m)
  }

  test("partitionBy write + re-read re-derives the identical manifest") {
    val dir = Files.createTempDirectory("graft-export").toFile
    try {
      val assigned = ExportQueries.shardAssign(docs)
      val expect = ExportQueries.manifest(assigned).collect().toSeq
      assigned.repartition(ExportQueries.NShards, col("shard"))
        .write.partitionBy("shard").mode("overwrite")
        .parquet(dir.getAbsolutePath)
      val back = spark.read.parquet(dir.getAbsolutePath)
        .select(col("doc_id"), col("ws_tokens"),
          col("shard").cast("long").as("shard"), col("__h"))
      val got = ExportQueries.manifest(back).collect().toSeq
      assert(got === expect,
        "re-derived manifest from written shards must match the export manifest")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("a dropped doc surfaces in exactly its shard's count and checksum") {
    val assigned = ExportQueries.shardAssign(docs).localCheckpoint(true)
    try {
      val full = ExportQueries.manifest(assigned).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
      val victim = assigned.orderBy(col("doc_id")).head()
      val victimShard = victim.getLong(2)
      val torn = ExportQueries.manifest(
        assigned.filter(col("doc_id") =!= victim.getLong(0))).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5))).toMap
      full.keys.foreach { s =>
        if (s == victimShard) {
          assert(torn(s)._1 === full(s)._1 - 1, "victim shard count must drop")
          assert(torn(s)._2 !== full(s)._2, "victim shard checksum must change")
        } else assert(torn(s) === full(s), s"shard $s must be untouched")
      }
    } finally CheckpointBlocks.release(assigned)
  }
}
