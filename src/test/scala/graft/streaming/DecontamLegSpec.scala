package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The streaming decontamination leg end to end: a long-lived ingest
  * with a REGISTERED eval split must refuse arriving docs the batch
  * recipe's stage 10 would refuse — in the first batch, in later
  * batches, and byte-identically in a full-completion crash replay.
  * Without registration the leg is off (opt-in), which is exactly the
  * hole this leg closes.
  */
class DecontamLegSpec extends graft.SparkSpecBase {
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

  // the held-out benchmark item (15 tokens -> 11 distinct 5-windows)
  private val evalText =
    "the capital of the ancient kingdom is found beside the river and the old bridge"
  // verbatim eval copy under a crawl URL: contam_frac 1.0
  private val contaminated1 = evalText
  // eval text embedded in a longer page: majority of windows still hit
  private val contaminated2 =
    evalText + " according to the travel guide that many visitors read"
  private val clean1 =
    "the quick brown fox jumps over the lazy dog and runs in the park"
  private val clean2 =
    "the weather report says rain is coming and the wind is strong today"

  test("without registration the leg is off: contaminated docs ship") {
    val warcDir = Files.createTempDirectory("dcoffw").toString
    val workDir = Files.createTempDirectory("dcoffk").toString
    writeWarc(warcDir, "a.warc",
      Seq("http://a/1" -> contaminated1, "http://a/2" -> clean1))
    val s = new CorpusStream(spark, workDir)
    s.ingest(warcDir).awaitTermination()
    assert(s.curated.count() === 2, "opt-in: no eval set, no drops")
    assert(s.contamLedger.count() === 0, "no ledger rows while the leg is off")
  }

  test("registered eval set: drops in batch 1 and later batches, ledgered, replay-identical") {
    val warcDir = Files.createTempDirectory("dconw").toString
    val workDir = Files.createTempDirectory("dconk").toString
    def stream() = new CorpusStream(spark, workDir)

    stream().indexEvalSet(Seq(("e1", evalText)).toDF("id", "text"),
      "id", "text")

    // batch 0: a verbatim eval copy + a clean doc
    writeWarc(warcDir, "a.warc",
      Seq("http://a/1" -> contaminated1, "http://a/2" -> clean1))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.select("text").as[String].collect().toSeq === Seq(clean1),
      "the eval copy must not ship")
    assert(s0.contamLedger.as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 2L, 1L)))

    // batch 1: an embedded-eval page + a clean doc — a later batch of a
    // long-lived ingest still screens against the same persisted index
    writeWarc(warcDir, "b.warc",
      Seq("http://b/1" -> contaminated2, "http://b/2" -> clean2))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    val shipped = s1.curated.select("text").as[String].collect().toSet
    assert(shipped === Set(clean1, clean2), s"shipped: $shipped")
    val led1 = s1.contamLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(led1 === Seq((0L, 2L, 1L), (1L, 2L, 1L)))

    // full-completion crash replay of batch 1 (batch done, stream
    // checkpoint not committed): every store must come back identical —
    // the verdicts are a pure function of (batch, static eval index)
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    assert(s2.curated.select("text").as[String].collect().toSet ===
      Set(clean1, clean2))
    assert(s2.contamLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq === led1)

    // the dropped doc never reached ANY downstream state
    assert(s2.curated.filter(col("text").contains("ancient kingdom")).count() === 0)
    assert(spark.read.parquet(s"$workDir/bands").select("id").distinct().count() ===
      s2.curated.count(), "the near-dup index must hold only shipped docs")

    // compaction folds the contam ledger with every other store
    s2.compact()
    val s3 = stream()
    assert(s3.contamLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq === led1)

    // and the leg keeps protecting post-compaction batches
    writeWarc(warcDir, "c.warc", Seq("http://c/1" -> contaminated1))
    stream().ingest(warcDir).awaitTermination()
    val s4 = stream()
    assert(s4.curated.count() === 2, "post-compaction eval copy still refused")
    assert(s4.contamLedger.orderBy("batch_id")
      .as[(Long, Long, Long)].collect().toSeq ===
      led1 :+ ((2L, 1L, 1L)))
  }
}
