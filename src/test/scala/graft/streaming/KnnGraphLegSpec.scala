package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The graph-index leg (knnK): a serving kNN graph maintained
  * incrementally over the semantic leg's vectors as an append-only
  * edge log — per-batch x125 deltas, top-k cut at read, x122 beam
  * serving from the accumulated state — with byte-identical
  * full-completion crash replay.
  */
class KnnGraphLegSpec extends graft.SparkSpecBase {
  import spark.implicits._

  private def recBytes(uri: String, text: String): Array[Byte] = {
    val payload = text.getBytes("ISO-8859-1")
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def writeWarc(dir: String, name: String,
                        docs: Seq[(String, String)]): Unit =
    Files.write(Paths.get(dir, name),
      docs.map { case (u, t) => recBytes(u, t) }.reduce(_ ++ _))

  // lexically-distinct prose docs (distinct hashed-TF vectors); two
  // "families" of shared vocabulary so the graph has real structure
  private def famA(i: Int): String =
    s"the alpha$i and the common alpha tale is near the alpha river of alpha$i town"
  private def famB(i: Int): String =
    s"the omega$i and the common omega song is near the omega cliff of omega$i bay"

  test("graph leg: edges accumulate across batches, serving walks to an ingested doc, replay is byte-identical") {
    val warcDir = Files.createTempDirectory("knnlw").toString
    val workDir = Files.createTempDirectory("knnlk").toString
    def stream() = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.99), knnK = Some(3))

    // batch 0: 8 docs, two families
    writeWarc(warcDir, "a.warc",
      (0 until 4).map(i => s"http://a/$i" -> famA(i)) ++
        (0 until 4).map(i => s"http://b/$i" -> famB(i)))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.count() === 8)
    val g0 = s0.knnGraph
    val curIds = s0.curated.select("doc_id").as[String].collect().toSet
    // every curated doc is a node with 1..k edges, no self loops
    assert(g0.select("id").distinct().as[String].collect().toSet === curIds)
    assert(g0.filter(col("id") === col("nid")).count() === 0)
    assert(g0.groupBy("id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 3).count() === 0)

    // batch 1: two new docs extend family A
    writeWarc(warcDir, "b.warc",
      Seq("http://a/new4" -> famA(4), "http://a/new5" -> famA(5)))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.curated.count() === 10)
    val g1 = s1.knnGraph
    val allIds = s1.curated.select("doc_id").as[String].collect().toSet
    assert(g1.select("id").distinct().as[String].collect().toSet === allIds)
    // a batch-0 node gained a batch-1 neighbor: the reverse-edge half
    // of the delta actually landed
    val newIds = allIds -- curIds
    val reverseHits = g1
      .filter(col("id").isInCollection(curIds) &&
        col("nid").isInCollection(newIds)).count()
    assert(reverseHits > 0, "no stored node gained a new-batch neighbor")
    // serving: a query equal to an ingested batch-1 doc embeds
    // identically, so the walk's best neighbor IS that doc (sim 1.0)
    val doc4 = s1.curated.filter(col("url") === "http://a/new4")
      .select("doc_id").as[String].head()
    val served = s1.searchKnn(
      Seq(("q1", famA(4))).toDF("id", "text"), "id", "text", k = 3)
    val top = served.filter(col("rank") === 1)
      .select("nid", "sim").as[(String, Double)].head()
    assert(top._1 === doc4 && top._2 === 1.0,
      s"expected the ingested twin at sim 1.0, got $top")

    // full-completion crash replay of batch 1 (state written, stream
    // checkpoint not committed): the delta must recompute
    // byte-identically from (batch, state-minus-this-batch)
    val edges1 = s1.knnEdges.orderBy("id", "nid")
      .as[(String, String, Double)].collect().toSeq
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("b.warc"))
    stream().processBatch(paths, 1L)
    val s2 = stream()
    val edges2 = s2.knnEdges.orderBy("id", "nid")
      .as[(String, String, Double)].collect().toSeq
    assert(edges2 === edges1, "replayed edge log differs")
    assert(s2.curated.count() === 10, "replay must not lose docs")

    // compact folds the edge log; the served graph is unchanged
    val g1rows = s2.knnGraph.orderBy("id", "rank")
      .as[(String, Int, String, Double)].collect().toSeq
    s2.compact()
    val s3 = stream()
    val g3rows = s3.knnGraph.orderBy("id", "rank")
      .as[(String, Int, String, Double)].collect().toSeq
    assert(g3rows === g1rows, "compaction changed the served graph")
  }

  test("knnK without the semantic leg is refused; serving before state throws") {
    val workDir = Files.createTempDirectory("knnlg").toString
    intercept[IllegalArgumentException] {
      new CorpusStream(spark, workDir, knnK = Some(3))
    }
    val s = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.99), knnK = Some(3))
    intercept[IllegalArgumentException] {
      s.searchKnn(Seq(("q", "text")).toDF("id", "text"), "id", "text", 3)
    }
  }
}
