package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** The learned-quality leg end to end: a registered trained model
  * drops low-scoring docs the built-in threshold gates miss, ledgers
  * per batch, and replays byte-identically. Opt-in: without
  * registration nothing changes.
  */
class QualityModelLegSpec extends graft.SparkSpecBase {
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

  // punct-heavy page engineered to PASS the fixed x09 quality gate
  // (score ~0.36 >= 0.3: stopwords clean, 40 words) while a learned
  // punct-penalizing model rejects it — the gap a trained classifier
  // exists to close
  private val junk = {
    val ws = (1 to 36).map(i => s"word$i!!")
    s"the ${ws.take(12).mkString(" ")} and ${ws.slice(12, 24).mkString(" ")} " +
      s"is ${ws.drop(24).mkString(" ")} of it"
  }
  private val clean1 =
    "the quick brown fox jumps over the lazy dog and runs in the park"
  private val clean2 =
    "the weather report says rain is coming and the wind is strong today"

  // identity scaler (mean 0, std 1.0 in micro units) + a model that
  // reads z = 5 - 200*punct_ratio: clean prose scores ~0.99, the junk
  // page ~0 — thresholded at 0.5
  private val w = Array(5000000L, 0L, 0L, -200000000L, 0L)
  private val sc = QualityClassifier.Scaler(1L,
    Array(0L, 0L, 0L, 0L), Array(1000000L, 1000000L, 1000000L, 1000000L))

  test("without registration the junk page ships (it passes the fixed gate)") {
    val warcDir = Files.createTempDirectory("qmoffw").toString
    val workDir = Files.createTempDirectory("qmoffk").toString
    writeWarc(warcDir, "a.warc", Seq("http://a/1" -> junk, "http://a/2" -> clean1))
    val s = new CorpusStream(spark, workDir)
    s.ingest(warcDir).awaitTermination()
    assert(s.curated.count() === 2, "the fixture must pass the FIXED gate")
    assert(s.qualityLedger.count() === 0)
  }

  test("registered model drops the junk page across batches, ledgered, replay-identical") {
    val warcDir = Files.createTempDirectory("qmonw").toString
    val workDir = Files.createTempDirectory("qmonk").toString
    def stream() = new CorpusStream(spark, workDir)
    stream().indexQualityModel(w, sc, thresholdMicro = 500000L)

    writeWarc(warcDir, "a.warc", Seq("http://a/1" -> junk, "http://a/2" -> clean1))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.select("text").as[String].collect().toSeq === Seq(clean1))
    assert(s0.qualityLedger.as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 2L, 1L)))

    // later batch: the leg keeps screening
    writeWarc(warcDir, "b.warc",
      Seq("http://b/1" -> (junk + " extra words here"), "http://b/2" -> clean2))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.curated.select("text").as[String].collect().toSet ===
      Set(clean1, clean2))
    val led = s1.qualityLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(led === Seq((0L, 2L, 1L), (1L, 2L, 1L)))

    // full-completion crash replay of batch 1: identical state
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    assert(s2.curated.select("text").as[String].collect().toSet ===
      Set(clean1, clean2))
    assert(s2.qualityLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq === led)

    // the ledger compacts with the rest
    s2.compact()
    assert(stream().qualityLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq === led)
  }

  test("a REAL x118-trained model registers and serves through the leg") {
    val workDir = Files.createTempDirectory("qmrealk").toString
    val warcDir = Files.createTempDirectory("qmrealw").toString
    // train on the testdata corpus exactly as x118 does
    val lf = QualityClassifier.labeledFrame(
      graft.Tables(spark, sfDir, "documents"), "doc_id", "text")
    val tr = QualityClassifier.fit(lf.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) <= "cb"))
    val s = new CorpusStream(spark, workDir)
    s.indexQualityModel(tr.finalW, tr.scaler, thresholdMicro = 1L)
    // threshold 1 micro: everything real scores above it — the point is
    // that a genuine trained model round-trips through registration and
    // the leg runs (ledger row appears, nothing spuriously dropped)
    writeWarc(warcDir, "a.warc", Seq("http://a/1" -> clean1))
    s.ingest(warcDir).awaitTermination()
    val s1 = new CorpusStream(spark, workDir)
    assert(s1.curated.count() === 1)
    assert(s1.qualityLedger.as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 1L, 0L)))
  }
}
