package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The graph leg's staleness alarm AND response: append-born nodes
  * carry only beam-searched edges, so when they outnumber build-born
  * nodes the leg rebuilds — a bounded NN-Descent over the accumulated
  * vector store folded in as the edge log's base dir behind the mark,
  * committed by the knngmeta ledger row (the PQ-rotation protocol).
  * Serving quality, telemetry and the committed base survive an
  * instance restart, a full-completion crash replay of the rebuilding
  * batch, AND a crash-between-mark-and-commit replay.
  */
class KnnGraphRebuildSpec extends graft.SparkSpecBase {
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

  private def proseDoc(i: Int): String =
    s"the alpha$i and the beta$i is near the gamma$i of the delta$i"

  test("staleness fires, graph rebuilds as the log's base, state survives restart and both replay shapes") {
    val warcDir = Files.createTempDirectory("kgrw").toString
    val workDir = Files.createTempDirectory("kgrk").toString
    def stream() = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.99), knnK = Some(3))

    // batch 0: 33 docs — past the node floor with NO build-born base,
    // so the first sizable batch PROMOTES its append-seeded graph to a
    // real NN-Descent build (version 1)
    writeWarc(warcDir, "a.warc",
      (0 until 33).map(i => s"http://p/$i" -> proseDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s0 = stream()
    assert(s0.curated.count() === 33)
    assert(s0.knngVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === Seq((1L, 33L, 0L)))
    val drift0 = s0.knngDrift
      .as[(Long, Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift0.map(r => (r._1, r._2, r._5)) === Seq((0L, 33L, Some(true))))
    // the served graph is the REBUILT base: every node, <= k edges,
    // and a query equal to an ingested doc walks straight to it
    val g0 = s0.knnGraph
    assert(g0.select("id").distinct().count() === 33)
    assert(g0.filter(col("id") === col("nid")).count() === 0)
    val doc7 = s0.curated.select("text", "doc_id").as[(String, String)]
      .collect().toMap.apply(proseDoc(7))
    val top0 = s0.searchKnn(Seq(("q", proseDoc(7))).toDF("id", "text"),
        "id", "text", k = 3)
      .filter(col("rank") === 1).select("nid", "sim")
      .as[(String, Double)].head()
    assert(top0 === ((doc7, 1.0)))

    // batch 1: 4 appends on a 33-node base — 37 total, 108 pm appended:
    // healthy, no second rebuild; the delta serves alongside the base
    writeWarc(warcDir, "b.warc",
      (100 until 104).map(i => s"http://q/$i" -> proseDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s1 = stream()
    assert(s1.knngVersions.count() === 1, "no rebuild on a healthy append")
    val drift1 = s1.knngDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift1.map(r => (r._1, r._2, r._3, r._5)) ===
      Seq((0L, 33L, 33L, Some(true)), (1L, 37L, 4L, Some(false))),
      s"drift: $drift1")
    assert(s1.knnGraph.select("id").distinct().count() === 37)

    // batch 2: 40 appends -> 77 total, 44/77 = 571 pm appended since
    // version 1 -> stale -> rebuild version 2 over all 77
    writeWarc(warcDir, "c.warc",
      (200 until 240).map(i => s"http://r/$i" -> proseDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s2 = stream()
    val v2 = s2.knngVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq
    assert(v2 === Seq((1L, 33L, 0L), (2L, 77L, 2L)), s"versions: $v2")
    assert(s2.knngDrift.orderBy("batch_id")
      .as[(Long, Long, Long, Long, Option[Boolean])].collect()
      .map(r => (r._1, r._5)).toSeq ===
      Seq((0L, Some(true)), (1L, Some(false)), (2L, Some(true))))
    val baseEdges = s2.knnEdges.orderBy("id", "nid")
      .as[(String, String, Double)].collect().toSeq

    // full-completion crash replay of the REBUILDING batch: the
    // committed-rebuild fast path touches nothing — every store reads
    // back byte-identical
    val paths = spark.read.format("binaryFile").load(warcDir)
      .select(col("path")).filter(col("path").endsWith("c.warc"))
    stream().processBatch(paths, 2L)
    val s3 = stream()
    assert(s3.knngVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v2)
    assert(s3.knnEdges.orderBy("id", "nid")
      .as[(String, String, Double)].collect().toSeq === baseEdges)
    assert(s3.curated.count() === 77)

    // crash BETWEEN the mark move and the ledger-row commit: delete
    // the commit row, replay — the batch re-enters, re-measures the
    // identical drift row (the ledger still reads version 1), rebuilds
    // deterministically over the same store, and commits; state
    // converges
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete()
    }
    deleteRec(new java.io.File(s"$workDir/knngmeta/batch=2"))
    assert(stream().knngVersions.count() === 1, "commit row gone")
    stream().processBatch(paths, 2L)
    val s4 = stream()
    assert(s4.knngVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v2)
    assert(s4.knnEdges.orderBy("id", "nid")
      .as[(String, String, Double)].collect().toSeq === baseEdges)

    // post-rebuild serving still walks: the batch-0 probe retrieves
    // its exact twin; the batch-2 doc is a full-degree node of the
    // rebuilt base and its probe lands in its (tie-heavy) neighborhood.
    // The template fixture is a near-uniform cloud — every cross sim
    // ties around 0.92, so a greedy walk has no gradient toward one
    // specific twin and exact self-retrieval is not a fair clause here
    // (the x122/x125 recall gates pin recall on the manifold fixture
    // where the premise holds).
    val idOf = s4.curated.select("text", "doc_id").as[(String, String)]
      .collect().toMap
    val top7 = s4.searchKnn(Seq(("q", proseDoc(7))).toDF("id", "text"),
        "id", "text", k = 3)
      .filter(col("rank") === 1).select("nid", "sim")
      .as[(String, Double)].head()
    assert(top7 === ((idOf(proseDoc(7)), 1.0)), s"batch-0 probe got $top7")
    assert(s4.knnGraph.filter(col("id") === idOf(proseDoc(230))).count() === 3,
      "the batch-2 doc must be a full-degree node of the rebuilt base")
    val top230 = s4.searchKnn(Seq(("q", proseDoc(230))).toDF("id", "text"),
        "id", "text", k = 3)
      .filter(col("rank") === 1).select("sim").as[Double].head()
    assert(top230 >= 0.9, s"batch-2 probe must land in its neighborhood: $top230")

    // the ledger/telemetry stores compact with the rest; the served
    // graph is unchanged
    val g4 = s4.knnGraph.orderBy("id", "rank")
      .as[(String, Int, String, Double)].collect().toSeq
    s4.compact()
    val s5 = stream()
    assert(s5.knngVersions.orderBy("version")
      .as[(Long, Long, Long)].collect().toSeq === v2)
    assert(s5.knnGraph.orderBy("id", "rank")
      .as[(String, Int, String, Double)].collect().toSeq === g4)
  }

  test("below the node floor verdicts are null and no rebuild fires") {
    val warcDir = Files.createTempDirectory("kgfw").toString
    val workDir = Files.createTempDirectory("kgfk").toString
    def stream() = new CorpusStream(spark, workDir,
      semanticThreshold = Some(0.99), knnK = Some(3))
    writeWarc(warcDir, "a.warc",
      (0 until 8).map(i => s"http://p/$i" -> proseDoc(i)))
    stream().ingest(warcDir).awaitTermination()
    val s = stream()
    val drift = s.knngDrift
      .as[(Long, Long, Long, Long, Option[Boolean])].collect().toSeq
    assert(drift.map(r => (r._1, r._2, r._5)) === Seq((0L, 8L, None)))
    assert(s.knngVersions.count() === 0)
  }
}
