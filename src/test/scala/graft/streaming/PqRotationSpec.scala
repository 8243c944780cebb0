package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The x96d drift alarm's RESPONSE path, end to end: a
  * distribution-shifted batch trips the 2× reconstruction-error gate,
  * the same batch rotates the codebook (retrain on the accumulated
  * vector store, re-encode every stored code, commit version+1 in the
  * pqVersions ledger), and the searchPq zero-distance contract holds
  * across the rotation, a restart, AND a full-completion crash replay
  * of the rotating batch.
  */
class PqRotationSpec extends graft.SparkSpecBase {
  import spark.implicits._

  private def recBytes(uri: String, text: String): Array[Byte] = {
    val payload = text.getBytes("ISO-8859-1")
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def writeWarc(dir: String, name: String, docs: Seq[(String, String)]): Unit =
    Files.write(Paths.get(dir, name),
      docs.map { case (u, t) => recBytes(u, t) }.reduce(_ ++ _))

  // 40 lexically-distinct prose-shaped docs: well past Ks = 16, so the
  // v0 codebook cannot memorize its training set (a near-zero training
  // error would make ANY later batch read as drift) and verdicts are
  // real
  private def proseDoc(i: Int): String =
    s"the alpha$i and the beta$i is near the gamma$i of the delta$i"

  // distribution shift: the prose template's common-token mass is gone,
  // the vector mass moves to unseen rare-token hash buckets (kept
  // lang-id'able with the same English markers)
  private def shiftDoc(j: Int): String =
    s"every kilo$j quickly grabs the twelve quebec$j but some yankee$j never walks since the xray$j is gone"

  test("drift fires, codebook rotates, serving contract survives restart and replay") {
    val warcDir = Files.createTempDirectory("pqrotw").toString
    val workDir = Files.createTempDirectory("pqrotk").toString
    def stream() = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.95), pqM = Some(8))

    // in-distribution probes for the post-rotation batch: unseen
    // COMBINATIONS of seen vocabulary (every hash bucket trained)
    val mixA = "the alpha1 and the beta7 is near the gamma12 of the delta3"
    val mixB = "the alpha5 and the beta2 is near the gamma9 of the delta14"

    // batch 0: train version 0 on 40 prose docs; its own drift row is a
    // healthy verdict (the batch IS the training set)
    writeWarc(warcDir, "a.warc",
      (0 until 40).map(i => s"http://p/$i" -> proseDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.count() === 40)
    val v0 = s0.pqVersions.as[(Long, Double, Long, Long)].collect().toSeq
    assert(v0.map(r => (r._1, r._3, r._4)) === Seq((0L, 40L, 0L)), s"got $v0")
    assert(s0.pqDrift.as[(Long, Double, Double, Option[Boolean])]
      .collect().toSeq.map(r => (r._1, r._4)) === Seq((0L, Some(false))))

    // batch 1: 4 shifted docs -> reconstruction error vs the
    // prose-trained codebook trips the 2x gate -> rotation commits
    // version 1, retrained on all 44 accumulated vectors
    writeWarc(warcDir, "b.warc",
      (0 until 4).map(j => s"http://q/$j" -> shiftDoc(j)))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.curated.count() === 44)
    val drift1 = s1.pqDrift.orderBy("batch_id")
      .as[(Long, Double, Double, Option[Boolean])].collect().toSeq
    assert(drift1.map(r => (r._1, r._4)) ===
      Seq((0L, Some(false)), (1L, Some(true))), s"drift ledger: $drift1")
    val v1 = s1.pqVersions.orderBy("version")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(v1.map(r => (r._1, r._3, r._4)) ===
      Seq((0L, 40L, 0L), (1L, 44L, 1L)), s"version ledger: $v1")

    // the code table is the re-encoded snapshot: all 44 docs, M codes
    // each, and byte-identical to a fresh encode of the stored vectors
    // under the committed v1 codebook
    val codes = s1.pqCodes
    assert(codes.select("id").distinct().count() === 44)
    assert(codes.groupBy("id").count().filter($"count" =!= 8).count() === 0)
    val cents1 = spark.read.parquet(s"$workDir/pqcodebook/v=1")
    val cb1 = graft.operators.Pq.PqCodebook(cents1, Seq(v1(1)._2), Map.empty)
    val vecs = spark.read.parquet(s"$workDir/vecs")
    val reEnc = graft.operators.Pq.encode(
      vecs.select(col("id"), col("vec")), "id", "vec", cb1, 8, 8)
    assert(codes.select("id", "m", "code")
      .exceptAll(reEnc.select("id", "m", "code")).count() === 0)
    assert(reEnc.select("id", "m", "code")
      .exceptAll(codes.select("id", "m", "code")).count() === 0)

    // serving contract across the rotation + instance restarts: a
    // pre-rotation doc and a post-rotation doc both come back at rank 1
    // with exact re-ranked distance 0
    val idOf = s1.curated.select("text", "doc_id").as[(String, String)]
      .collect().toMap
    for (probe <- Seq(proseDoc(3), shiftDoc(2))) {
      val top = stream().searchPq(Seq(("q", probe)).toDF("qid", "text"),
          "qid", "text", k = 2)
        .as[(String, String, Int, Double)].collect().toSeq.sortBy(_._3)
      assert(top.head._2 === idOf(probe) && math.abs(top.head._4) <= 1e-9,
        s"probe '$probe' must self-retrieve at distance 0, got $top")
    }

    // full-completion crash replay of the ROTATING batch (batch done,
    // stream checkpoint not committed): re-running processBatch(1) must
    // leave every store byte-identical — the committed-rotation fast
    // path serves the drift row from the PRE-rotation codebook and
    // skips re-rotating
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    assert(s2.curated.count() === 44, "replay must not lose the batch's docs")
    val drift2 = s2.pqDrift.orderBy("batch_id")
      .as[(Long, Double, Double, Option[Boolean])].collect().toSeq
    assert(drift2 === drift1, s"replayed drift ledger differs: $drift2")
    val v2 = s2.pqVersions.orderBy("version")
      .as[(Long, Double, Long, Long)].collect().toSeq
    assert(v2 === v1, s"replayed version ledger differs: $v2")
    assert(s2.pqCodes.select("id", "m", "code")
      .exceptAll(codes.select("id", "m", "code")).count() === 0)

    // batch 2 after the rotation: in-distribution again (unseen
    // combinations of trained vocabulary), encoded against v1 with NO
    // second rotation — and the new doc serves at distance 0 too
    writeWarc(warcDir, "c.warc",
      Seq("http://r/17" -> mixA, "http://r/18" -> mixB))
    stream().ingest(warcDir).awaitTermination()
    val s3 = stream()
    assert(s3.curated.count() === 46)
    val drift3 = s3.pqDrift.orderBy("batch_id")
      .as[(Long, Double, Double, Option[Boolean])].collect().toSeq
    assert(drift3.map(r => (r._1, r._4)) ===
      Seq((0L, Some(false)), (1L, Some(true)), (2L, Some(false))),
      s"post-rotation drift ledger: $drift3")
    assert(s3.pqVersions.count() === 2, "no second rotation")
    assert(s3.pqCodes.select("id").distinct().count() === 46)
    val idOf3 = s3.curated.select("text", "doc_id").as[(String, String)]
      .collect().toMap
    val top3 = s3.searchPq(Seq(("q", mixB)).toDF("qid", "text"),
        "qid", "text", k = 1)
      .as[(String, String, Int, Double)].collect().toSeq
    assert(top3.head._2 === idOf3(mixB) &&
      math.abs(top3.head._4) <= 1e-9, s"got $top3")

    // compaction AFTER a rotation: the rotation already owns the codes
    // store's mark (base=1), compact() folds the post-rotation batch
    // dirs into a NEW base and sweeps the rotation-orphaned pre-v1
    // dirs — the serving surface must be unchanged through it, and a
    // further batch must keep appending against v1
    s3.compact()
    val s4 = stream()
    assert(s4.pqCodes.select("id").distinct().count() === 46)
    assert(s4.pqVersions.count() === 2, "compaction must not invent versions")
    assert(s4.pqDrift.count() === 3, "compaction must not drop ledger rows")
    writeWarc(warcDir, "d.warc", Seq("http://r/40" -> proseDoc(40)))
    stream().ingest(warcDir).awaitTermination()
    val s5 = stream()
    assert(s5.curated.count() === 47,
      s"ledger: ${s5.ledger.collect().toSeq}")
    assert(s5.pqDrift.count() === 4,
      s"drift: ${s5.pqDrift.collect().toSeq}")
    assert(s5.pqCodes.select("id").distinct().count() === 47)
    assert(s5.pqVersions.count() === 2, "no rotation on the healthy batch")
    val idOf5 = s5.curated.select("text", "doc_id").as[(String, String)]
      .collect().toMap
    val top5 = s5.searchPq(Seq(("q", proseDoc(40))).toDF("qid", "text"),
        "qid", "text", k = 1)
      .as[(String, String, Int, Double)].collect().toSeq
    assert(top5.head._2 === idOf5(proseDoc(40)) &&
      math.abs(top5.head._4) <= 1e-9, s"got $top5")
  }
}
