package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier

/** The two round-15 legs (decontamination + learned quality) compose
  * with the established opt-in legs (semantic, passage, PQ, export) on
  * ONE drain: each leg drops/flags exactly its own target, every
  * ledger accounts, and no dropped doc leaks into ANY downstream
  * store. The drop ORDER is pinned: quality fires before dedup,
  * decontamination after dedup — both before any index/export append.
  */
class NewLegsComposeSpec extends graft.SparkSpecBase {
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

  test("quality + decontamination legs compose with semantic/passage/PQ/export on one drain") {
    val warcDir = Files.createTempDirectory("composew").toString
    val workDir = Files.createTempDirectory("composek").toString
    val evalText =
      "the capital of the ancient kingdom is found beside the river and the old bridge"
    val contaminated = evalText + " according to the travel guide"
    val junk = {
      val ws = (1 to 36).map(i => s"word$i!!")
      s"the ${ws.take(12).mkString(" ")} and ${ws.slice(12, 24).mkString(" ")} " +
        s"is ${ws.drop(24).mkString(" ")} of it"
    }
    val clean1 = "the quick brown fox jumps over the lazy dog and runs in the park"
    val clean2 = "the weather report says rain is coming and the wind is strong today"
    val dup2 = clean2 // exact copy under a fresh URL: the dedup leg's prey

    def stream() = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.95), passageK = Some(5), pqM = Some(8),
      exportShards = Some(2), knnK = Some(3))
    stream().indexEvalSet(Seq(("e1", evalText)).toDF("id", "text"), "id", "text")
    stream().indexQualityModel(
      Array(5000000L, 0L, 0L, -200000000L, 0L),
      QualityClassifier.Scaler(1L, Array(0L, 0L, 0L, 0L),
        Array(1000000L, 1000000L, 1000000L, 1000000L)),
      thresholdMicro = 500000L)

    writeWarc(warcDir, "a.warc", Seq(
      "http://a/1" -> clean1, "http://a/2" -> junk,
      "http://a/3" -> contaminated, "http://a/4" -> clean2,
      "http://a/5" -> dup2))
    stream().ingest(warcDir).awaitTermination()

    val s = stream()
    val shipped = s.curated.select("text").as[String].collect().toSet
    assert(shipped === Set(clean1, clean2),
      s"junk, the eval page, and the dup must all drop; shipped: $shipped")
    // each leg's ledger accounts for exactly its own drop
    assert(s.qualityLedger.as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 5L, 1L)), "quality leg: 5 scored (post-curation), junk dropped")
    assert(s.ledger.select("exact_dropped").as[Long].collect().sum === 1L,
      "dedup: the exact copy")
    assert(s.contamLedger.as[(Long, Long, Long)].collect().toSeq ===
      Seq((0L, 3L, 1L)),
      "decontam: 3 post-dedup survivors checked, the eval page dropped")
    // no dropped doc reached ANY downstream store
    val curIds = s.curated.select("doc_id").as[String].collect().toSet
    for ((store, idc) <- Seq("bands" -> "id", "docarrs" -> "id",
        "vecs" -> "id", "vecbuckets" -> "id", "windows" -> "id",
        "pqcodes" -> "id", "knngraph" -> "id")) {
      val ids = spark.read.parquet(s"$workDir/$store")
        .select(col(idc)).distinct().as[String].collect().toSet
      assert(ids === curIds, s"$store holds ${ids.size} ids != shipped ${curIds.size}")
    }
    assert(s.exportedDocs.select("doc_id").as[String].collect().toSet === curIds)
    // the graph leg indexed exactly the shipped docs and serves them:
    // a query equal to a shipped doc walks to its twin at sim 1.0
    val g = s.knnGraph
    assert(g.select("id").distinct().as[String].collect().toSet === curIds)
    assert(g.filter(col("id") === col("nid")).count() === 0)
    val served = s.searchKnn(Seq(("q1", clean1)).toDF("id", "text"),
      "id", "text", k = 1)
    val top = served.select("nid", "sim").as[(String, Double)].head()
    val clean1Id = s.curated.filter(col("text") === clean1)
      .select("doc_id").as[String].head()
    assert(top === ((clean1Id, 1.0)), s"graph leg served $top")
    // and the export manifests total exactly the shipped docs
    assert(s.exportManifests.agg(sum("n_docs")).as[Long].head() === 2L)
  }
}
