package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The tokenizer-maintenance leg's drift alarm AND response, end to
  * end — the PQ x96d rotation design applied to the deployed byte-BPE
  * vocab: v=0 trains on the first non-empty batch, a byte-shifted
  * batch collapses bytes-per-token under the serving merges past the
  * 80% gate, the same batch retrains on the accumulated curated store
  * and commits version+1 in the bpeVersions ledger; serving,
  * telemetry and the committed merge tables survive an instance
  * restart, a full-completion crash replay of the rotating batch, AND
  * a crash-between-vocab-and-commit replay. compact()'s version GC
  * then reclaims v=0 after a second rotation without disabling the
  * leg (registration rides the bpemeta LEDGER — the quality-leg
  * v=0-pin lesson, applied from birth).
  */
class BpeDriftRotationSpec extends graft.SparkSpecBase {
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

  // Content letter runs make the byte distribution a dial: v=0's top
  // merges are dominated by the 'aa' pair family, so an 'oooo' batch
  // tokenizes at ~1 byte/token where the train corpus compressed its
  // runs multi-fold — far past the 80% bpt gate, deterministically.
  // Two varying tokens per doc keep in-batch Jaccard under the 0.7
  // near-dup threshold (the quality-spec fixture discipline); the
  // stopword frame keeps languageId at "en".
  private def runDoc(run: String, i: Int): String =
    s"the $run alpha$i and the $run near the beta$i $run of the $run end"
  private def aDoc(i: Int) = runDoc("aaaaaaaaaaaa", i)
  private def oDoc(i: Int) = runDoc("oooooooooooo", i)
  private def uDoc(i: Int) = runDoc("uuuuuuuuuuuu", i)

  test("v0 trains, drift rotates on the store, state survives restart + both replays, GC keeps the leg live") {
    val warcDir = Files.createTempDirectory("bpedw").toString
    val workDir = Files.createTempDirectory("bpedk").toString
    def stream() = new CorpusStream(spark, workDir, bpeMerges = Some(12))

    // batch 0: 10 a-run docs -> v=0 trains on the store (== this
    // batch); the batch's own drift verdict is a healthy false (its
    // bpt IS the train bpt)
    writeWarc(warcDir, "a.warc",
      (0 until 10).map(i => s"http://a/$i" -> aDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.count() === 10)
    val v0rows = s0.bpeVersions.orderBy("version")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(v0rows.map(r => (r._1, r._4)) === Seq((0L, 0L)), s"meta: $v0rows")
    assert(v0rows.head._2 >= 256L,
      s"fixture must clear the verdict floor: ${v0rows.head._2} train tokens")
    val trainBpt = v0rows.head._3
    assert(trainBpt > 2000000L,
      s"a-run corpus must compress well past 2 bytes/token: $trainBpt")
    val d0 = s0.bpeDrift.as[(Long, Long, Long, Option[Boolean])]
      .collect().toSeq
    assert(d0.map(r => (r._1, r._4)) === Seq((0L, Some(false))), s"$d0")
    val led0 = s0.bpeLedger.as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(led0.map(_._1) === Seq(0L) && led0.head._2 === 10L, s"$led0")
    assert(led0.head._7 > 0L, "merged_pm must be > 0 on the train corpus")

    // batch 1: 10 o-run docs — the 'aa' merge family never fires, bpt
    // collapses toward 1 byte/token -> drift -> rotation commits v=1
    // trained on all 20 accumulated docs
    writeWarc(warcDir, "b.warc",
      (0 until 10).map(i => s"http://o/$i" -> oDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.curated.count() === 20)
    val drift1 = s1.bpeDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift1.map(r => (r._1, r._4)) ===
      Seq((0L, Some(false)), (1L, Some(true))), s"drift: $drift1")
    assert(drift1(1)._2 * 1000L < drift1(1)._3 * 800L,
      s"batch bpt ${drift1(1)._2} must sit below 80% of train ${drift1(1)._3}")
    val v1rows = s1.bpeVersions.orderBy("version")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(v1rows.map(r => (r._1, r._4)) === Seq((0L, 0L), (1L, 1L)),
      s"meta: $v1rows")
    // the committed v1 merge table: recompute the deterministic learn
    // over the store and require identical rows
    val stored1 = spark.read.parquet(s"$workDir/bpevocab/v=1")
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val expect1 = graft.operators.BpeQueries.learnMergesOn(
      graft.operators.BpeQueries.pretokenVocab(s1.curated, "text")
        .withColumn("syms",
          graft.operators.BpeQueries.byteSyms(col("w"))), 12)
      .map(m => (m.rank, m.l, m.r, m.cnt))
    assert(stored1 === expect1, s"v1 merges $stored1 != recomputed $expect1")
    // the serving table reader exposes v1
    assert(s1.bpeMergeTable.count() === expect1.size.toLong)

    // full-completion crash replay of the ROTATING batch: every bpe
    // store must come back byte-identical (the committed-rotation fast
    // path serves v0 and skips re-rotating)
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    assert(s2.bpeDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq === drift1)
    assert(s2.bpeVersions.orderBy("version")
      .as[(Long, Long, Long, Long)].collect().toSeq === v1rows)
    assert(spark.read.parquet(s"$workDir/bpevocab/v=1")
      .orderBy("rank").as[(Int, String, String, Long)]
      .collect().toSeq === stored1)

    // crash BETWEEN the v1 vocab write and the ledger-row commit:
    // delete the commit row, replay — the batch re-enters the rotation
    // (no committed row at its id), retrains deterministically, and
    // rewrites both; state converges to the same place
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(s"$workDir/bpemeta/batch=1"))
    assert(stream().bpeVersions.count() === 1, "commit row gone")
    stream().processBatch(paths, 1L)
    val s3 = stream()
    assert(s3.bpeVersions.orderBy("version")
      .as[(Long, Long, Long, Long)].collect().toSeq === v1rows)
    assert(spark.read.parquet(s"$workDir/bpevocab/v=1")
      .orderBy("rank").as[(Int, String, String, Long)]
      .collect().toSeq === stored1)
    assert(s3.bpeDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq === drift1)

    // batch 2: a THIRD byte distribution (u-runs) drifts against v1
    // -> rotation commits v=2; then compact()'s version GC reclaims
    // v=0 (serving window = v1/v2) and the leg MUST stay live
    writeWarc(warcDir, "c.warc",
      (0 until 10).map(i => s"http://u/$i" -> uDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    assert(stream().bpeVersions.orderBy("version")
      .as[(Long, Long, Long, Long)].collect().toSeq.map(_._1) ===
      Seq(0L, 1L, 2L))
    stream().compact()
    assert(!new java.io.File(s"$workDir/bpevocab/v=0").exists(),
      "GC should reclaim v=0 once the serving window moved past it")
    assert(new java.io.File(s"$workDir/bpevocab/v=1").isDirectory)
    assert(new java.io.File(s"$workDir/bpevocab/v=2").isDirectory)
    writeWarc(warcDir, "d.warc",
      (10 until 15).map(i => s"http://u/$i" -> uDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s4 = stream()
    val led = s4.bpeLedger.orderBy("batch_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(led.map(_._1) === Seq(0L, 1L, 2L, 3L),
      s"bpe leg disabled after GC — ledger rows: $led")
    assert(led.last._2 === 5L, s"batch 3 should account its 5 docs: $led")
    // u-runs compress well under v2 (trained on a store that includes
    // them): the dial settled
    val d3 = s4.bpeDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(d3.map(_._1) === Seq(0L, 1L, 2L, 3L), s"drift: $d3")
    assert(d3.last._4 === Some(false),
      s"a settled vocab must not re-alarm on its own distribution: $d3")
  }

  test("verdicts stay null below the train-token floor (telemetry without alarm, no rotation)") {
    val warcDir = Files.createTempDirectory("bpefw").toString
    val workDir = Files.createTempDirectory("bpefk").toString
    def stream() = new CorpusStream(spark, workDir, bpeMerges = Some(12))
    // one doc: v=0 trains (the leg never refuses a legal corpus) but
    // its train-token count sits under the 256 verdict floor
    writeWarc(warcDir, "a.warc", Seq("http://a/0" -> aDoc(0)))
    stream().ingest(warcDir).awaitTermination()
    val v0 = stream().bpeVersions.as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(v0.map(_._1) === Seq(0L) && v0.head._2 < 256L, s"$v0")
    writeWarc(warcDir, "b.warc",
      (0 until 4).map(i => s"http://o/$i" -> oDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s = stream()
    val drift = s.bpeDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift.map(r => (r._1, r._4)) === Seq((0L, None), (1L, None)),
      s"got $drift")
    assert(s.bpeVersions.count() === 1, "no rotation without a verdict")
  }
}
