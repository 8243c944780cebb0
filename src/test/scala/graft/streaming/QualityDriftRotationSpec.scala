package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The learned-quality leg's drift alarm AND response, end to end —
  * the PQ x96d rotation design applied to the deployed classifier: a
  * covariate-shifted batch trips the 2σ standardized-feature gate, the
  * same batch retrains on the accumulated curated store (Gopher weak
  * labels over the raw stored text) and commits version 1 in the
  * qualityVersions ledger; serving, telemetry and the committed weights
  * survive an instance restart, a full-completion crash replay of the
  * rotating batch, AND a crash-between-weights-and-commit replay.
  */
class QualityDriftRotationSpec extends graft.SparkSpecBase {
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

  // 14-word prose docs, lexically distinct: fn = 14·5000 = 70000 micro
  // for every one, matching the registered scaler's mean — standardized
  // feature means ~0, no drift
  private def shortDoc(i: Int): String =
    s"the quick alpha$i fox jumps over the lazy beta$i dog in the green park"

  // ~60-word docs: fn = 300000 micro, 2.3e6 micro (2.3σ) above the
  // registered train mean under std 0.1 — past the 2σ gate
  private def longDoc(j: Int): String = {
    val ws = (0 until 48).map(k => s"word$j$k").grouped(12)
      .map(_.mkString(" ")).toSeq
    s"the ${ws(0)} and the ${ws(1)} is near the ${ws(2)} of the ${ws(3)}"
  }

  // benign weights: bias-only z = 5 -> p6 = 993307 for everything, so
  // the drop path never interferes with the doc counts under test.
  // Scaler: only the fn feature carries drift signal (std 0.1); the
  // other stds are huge so their standardized values stay ~0. n = 100
  // is past the verdict floor.
  private val w = Array(5000000L, 0L, 0L, 0L, 0L)
  private val sc = graft.operators.QualityClassifier.Scaler(100L,
    Array(0L, 0L, 0L, 70000L),
    Array(1000000000L, 1000000000L, 1000000000L, 100000L))

  test("drift fires, model rotates on accumulated store, state survives restart and both replay shapes") {
    val warcDir = Files.createTempDirectory("qdrw").toString
    val workDir = Files.createTempDirectory("qdrk").toString
    def stream() = new CorpusStream(spark, workDir)
    stream().indexQualityModel(w, sc, thresholdMicro = 500000L)

    // batch 0: 10 in-distribution docs — healthy verdict, no rotation
    writeWarc(warcDir, "a.warc",
      (0 until 10).map(i => s"http://p/$i" -> shortDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.count() === 10)
    assert(s0.qualityDrift.as[(Long, Long, Long, Option[Boolean])]
      .collect().toSeq.map(r => (r._1, r._4)) === Seq((0L, Some(false))))
    assert(s0.qualityVersions.count() === 0, "no rotation on a healthy batch")

    // batch 1: 4 covariate-shifted docs -> 2σ gate trips -> the same
    // batch retrains on all 14 accumulated docs and commits version 1
    writeWarc(warcDir, "b.warc",
      (0 until 4).map(j => s"http://q/$j" -> longDoc(j)))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.curated.count() === 14)
    val drift1 = s1.qualityDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift1.map(r => (r._1, r._4)) ===
      Seq((0L, Some(false)), (1L, Some(true))), s"drift ledger: $drift1")
    val v1 = s1.qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq
    assert(v1 === Seq((1L, 14L, 1L)), s"version ledger: $v1")
    // the committed v1 model: trained on the store, threshold carried
    // over from registration
    val m1 = spark.read.parquet(s"$workDir/qualitymodel/v=1").head()
    assert(m1.getAs[Long]("train_n") === 14L)
    assert(m1.getAs[Long]("threshold_micro") === 500000L)
    val w1 = m1.getSeq[Long](0)
    // the retrain is the x118 fit over rawLabeledFrame of the store —
    // recompute it here and require identical weights (determinism is
    // what makes every replay shape below safe)
    val expect = graft.operators.QualityClassifier.fit(
      graft.operators.QualityClassifier.rawLabeledFrame(
        s1.curated, "doc_id", "text")).finalW.toSeq
    assert(w1 === expect, s"v1 weights $w1 != recomputed $expect")
    // the rotating batch itself was SCORED with v0 (benign bias-only):
    // nothing dropped
    assert(s1.qualityLedger.orderBy("batch_id").as[(Long, Long, Long)]
      .collect().toSeq === Seq((0L, 10L, 0L), (1L, 4L, 0L)))

    // full-completion crash replay of the ROTATING batch: every quality
    // store must come back byte-identical (the committed-rotation fast
    // path scores against v0 and skips re-rotating)
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    assert(s2.curated.count() === 14)
    assert(s2.qualityDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq === drift1)
    assert(s2.qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v1)
    assert(spark.read.parquet(s"$workDir/qualitymodel/v=1")
      .head().getSeq[Long](0) === w1)
    assert(s2.qualityLedger.orderBy("batch_id").as[(Long, Long, Long)]
      .collect().toSeq === Seq((0L, 10L, 0L), (1L, 4L, 0L)))

    // crash BETWEEN the v1 weights write and the ledger-row commit:
    // delete the commit row, replay — the batch re-enters the rotation
    // (no committed row at its id), retrains deterministically, and
    // rewrites both; state converges to the same place
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(s"$workDir/qualitymeta/batch=1"))
    assert(stream().qualityVersions.count() === 0, "commit row gone")
    stream().processBatch(paths, 1L)
    val s3 = stream()
    assert(s3.qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v1)
    assert(spark.read.parquet(s"$workDir/qualitymodel/v=1")
      .head().getSeq[Long](0) === w1)
    assert(s3.qualityDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq === drift1)

    // the new stores compact with the rest
    s3.compact()
    val s4 = stream()
    assert(s4.qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v1)
    assert(s4.qualityDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq === drift1)
  }

  test("leg survives compact()'s version GC after two rotations (v=0 gone, still registered)") {
    // compact() keeps only the serving window (max committed version and
    // max-1): after TWO drift rotations, qualitymodel/v=0 is legitimately
    // GC'd. Registration must key off "any committed version", not v=0
    // specifically — a v=0 pin would silently disable scoring and both
    // quality ledgers on exactly the long-lived streams rotation serves.
    val warcDir = Files.createTempDirectory("qgc2w").toString
    val workDir = Files.createTempDirectory("qgc2k").toString
    def stream() = new CorpusStream(spark, workDir)
    stream().indexQualityModel(w, sc, thresholdMicro = 500000L)

    // batch 0: 10 long docs (fn ~285000 vs registered mean 70000, std
    // 0.1 -> |g4| ~2.15e6 past the 2e6 gate) -> rotation commits v=1
    writeWarc(warcDir, "a.warc",
      (0 until 10).map(j => s"http://q/$j" -> longDoc(j)))
    stream().ingest(warcDir).awaitTermination()
    assert(stream().qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq.map(_._1) === Seq(1L))

    // batch 1: 10 short docs — fn is CONSTANT across the v=1 train
    // store (identical token counts), so its scaler std floors at 1
    // micro and the 215000-micro shift standardizes astronomically
    // past the gate -> rotation commits v=2 (train_n >= the verdict
    // floor either way: the store holds 10+ docs)
    writeWarc(warcDir, "b.warc",
      (0 until 10).map(i => s"http://p/$i" -> shortDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    assert(stream().qualityVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq.map(_._1) === Seq(1L, 2L))

    // compact: version GC reclaims v=0, keeps the v=1/v=2 window
    stream().compact()
    assert(!new java.io.File(s"$workDir/qualitymodel/v=0").exists(),
      "GC should reclaim v=0 once the serving window moved past it")
    assert(new java.io.File(s"$workDir/qualitymodel/v=1").isDirectory)
    assert(new java.io.File(s"$workDir/qualitymodel/v=2").isDirectory)

    // batch 2: the leg must still be LIVE — scored against v=2, with
    // fresh ledger + drift telemetry rows (a v=0-pinned registration
    // check would skip all of this silently)
    writeWarc(warcDir, "c.warc",
      (10 until 15).map(i => s"http://p/$i" -> shortDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s = stream()
    val led = s.qualityLedger.orderBy("batch_id").as[(Long, Long, Long)]
      .collect().toSeq
    assert(led.map(_._1) === Seq(0L, 1L, 2L),
      s"quality leg disabled after GC — ledger rows: $led")
    assert(led.last._2 === 5L, s"batch 2 should score its 5 docs: $led")
    val drift = s.qualityDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift.map(_._1) === Seq(0L, 1L, 2L),
      s"drift telemetry stopped after GC: $drift")
  }

  test("verdicts stay null below the train_n floor (telemetry without alarm, no rotation)") {
    val warcDir = Files.createTempDirectory("qdfw").toString
    val workDir = Files.createTempDirectory("qdfk").toString
    def stream() = new CorpusStream(spark, workDir)
    // n = 1: a one-doc "train split" cannot ground a drift verdict
    stream().indexQualityModel(w,
      graft.operators.QualityClassifier.Scaler(1L,
        Array(0L, 0L, 0L, 70000L),
        Array(1000000000L, 1000000000L, 1000000000L, 100000L)),
      thresholdMicro = 500000L)
    writeWarc(warcDir, "a.warc",
      (0 until 4).map(j => s"http://q/$j" -> longDoc(j)))
    stream().ingest(warcDir).awaitTermination()
    val s = stream()
    val drift = s.qualityDrift.as[(Long, Long, Long, Option[Boolean])]
      .collect().toSeq
    assert(drift.map(r => (r._1, r._4)) === Seq((0L, None)), s"got $drift")
    assert(drift.head._3 > 2000000L,
      "telemetry still records the (large) shift")
    assert(s.qualityVersions.count() === 0, "no rotation without a verdict")
  }

  test("pre-versioning flat model layout is refused loudly") {
    val workDir = Files.createTempDirectory("qdflat").toString
    // simulate a round-15 workDir: one-row model parquet flat under
    // qualitymodel/
    Seq((w.toSeq, sc.meanU.toSeq, sc.stdU.toSeq, sc.n, 500000L))
      .toDF("w", "mean_u", "std_u", "train_n", "threshold_micro")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$workDir/qualitymodel")
    val e = intercept[IllegalArgumentException] {
      new CorpusStream(spark, workDir).indexQualityModel(w, sc, 500000L)
    }
    assert(e.getMessage.contains("pre-versioning"))
  }
}
