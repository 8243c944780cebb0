package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** End-to-end spec of the composed corpus pipeline: a WARC directory
  * with one representative document per curation rule (plus a poisoned
  * blob) flows through the full chain, and the corpus-level ledger is
  * asserted stage by stage — the training-data mirror of how
  * EtlPipelineSpec asserts department sums for the document-ETL chain.
  */
class CorpusPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def recBytes(uri: String, text: String): Array[Byte] = {
    val payload = text.getBytes("ISO-8859-1")
    (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: ${payload.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  private def memberOf(b: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(o)
    g.write(b); g.close()
    o.toByteArray
  }

  test("WARC directory to packed training sequences, ledger asserted per stage") {
    val dir = Files.createTempDirectory("corpus").toString
    val evalText = "the secret eval benchmark answer is forty two exactly"
    val d1 = "the quick brown fox jumps over the lazy dog and runs in the park"
    val d2 = "the weather report says rain is coming and the wind is strong today"
    val d4 = "the weather report says rain is coming and the wind is strong tonight"
    val d8 = "please contact us at alice@example.com for more info about the " +
      "new program and its launch"
    // d9a/d9b: share their first 8-token paragraph (corpus boilerplate)
    // but diverge after — jaccard ≈ 0.37, far below the 0.7 near-dup
    // bar, so BOTH survive document dedup and only the paragraph pass
    // can deduplicate the shared opening
    val para0 = "the alpha beta gamma delta epsilon zeta eta"
    val d9a = s"$para0 the red green blue yellow purple orange pink"
    val d9b = s"$para0 the one two three four five six seven"
    val docs = Seq(
      "http://a/1" -> d1,
      "http://a/2" -> d2,
      "http://a/3" -> d1, // exact duplicate of d1 under a different URL
      "http://a/4" -> d4, // near duplicate of d2 (one trailing word)
      "http://a/5" -> (evalText + " plus more training words here"), // contaminated
      "http://a/6" -> "el perro grande corre en la casa y de que es muy bonito",
      "http://a/7" -> "$$$ ### !!!",
      "http://a/8" -> d8,
      "http://a/9a" -> d9a,
      "http://a/9b" -> d9b)
    Files.write(Paths.get(dir, "corpus.warc"),
      docs.map { case (u, t) => recBytes(u, t) }.reduce(_ ++ _))
    // poisoned blob: one big parseable record (repetitive filler, > one
    // 64 KiB header window so it is emitted before the reader touches
    // the poison), then a member with a corrupted deflate body
    val m1 = memberOf(recBytes("http://bad/partial",
      "the archive keeps repeating this exact phrase " * 2000))
    val m2 = memberOf(recBytes("http://bad/lost", "never seen"))
    (10 until m2.length - 8).foreach(i => m2(i) = 0x55.toByte)
    Files.write(Paths.get(dir, "bad.warc.gz"), m1 ++ m2)

    val heldOut = Seq(("e1", evalText)).toDF("doc_id", "text")
    val r = CorpusPipeline.run(spark, dir, heldOut)

    assert(r.report.ingested === 11, "10 corpus docs + the pre-poison record")
    assert(r.report.keptUrl === 11, "all fixture URLs are canonically distinct")
    assert(r.report.keptGopher === r.report.keptLanguage,
      "gopher gate defaults off: a pure pass-through in the ledger")
    assert(r.report.keptRepetition === r.report.keptGopher,
      "repetition gate defaults off: a pure pass-through in the ledger")
    assert(r.report.quarantinedBlobs === 1)
    assert(r.quarantined.select("path").as[String].head().endsWith("bad.warc.gz"))
    // language: the Spanish doc and the all-punctuation doc ("und") drop
    assert(r.report.keptLanguage === 9)
    // quality: the repetitive filler doc drops on rep_ratio
    assert(r.report.keptQuality === 8)
    assert(r.report.afterExactDedup === 7, "d1's verbatim copy collapses")
    assert(r.report.afterNearDedup === 6, "d2's one-word variant collapses")
    // the shared opening paragraph drops from BOTH d9 docs, but neither
    // document hollows out — the doc count is unchanged
    assert(r.report.afterParaDedup === 6)
    assert(r.report.afterDecontamination === 5, "the eval-bearing doc drops")

    val curatedTexts = r.curated.select("text").as[String].collect().toSeq
    assert(curatedTexts.exists(_.contains("<EMAIL>")) &&
      !curatedTexts.exists(_.contains("alice@example.com")),
      "PII must be redacted in the curated corpus")
    assert(!curatedTexts.exists(_.contains("secret eval benchmark")),
      "no curated document may carry held-out eval text")
    // paragraph dedup removed the shared opening from both d9 docs and
    // kept each doc's unique tail in order
    assert(!curatedTexts.exists(_.contains("alpha beta")),
      "the corpus-duplicated paragraph must be gone from every document")
    assert(curatedTexts.contains("the red green blue yellow purple orange pink") &&
      curatedTexts.contains("the one two three four five six seven"))

    // packing: every survivor fits in bin 0 of its shard, and the
    // token ledger is exact (redaction is token-count-neutral here;
    // the d9 docs pack their 8-token surviving tails)
    assert(r.report.packedTokens === 14 + 13 + 15 + 8 + 8)
    assert(r.report.packs >= 1 && r.report.packs <= 5)
    val packed = r.packed.select("doc_id", "n_tok", "bin").as[(String, Int, Long)].collect()
    assert(packed.length === 5 && packed.forall(_._3 === 0L))
  }

  test("urlFilter: URL-less docs bypass canonical dedup instead of collapsing") {
    // WARC records missing warc-target-uri all surface url = "" — they
    // share canonical key "" and a keep-min dedup would silently keep
    // one of them. They must all pass through; real URLs still dedup.
    val docs = Seq(
      ("a", "http://ex.com/p?utm_a=1", "t1"),
      ("b", "http://ex.com/p", "t2"), // canonical dup of a -> one survives
      ("c", "", "t3"),
      ("d", "", "t4"),
      ("e", null, "t5")
    ).toDF("doc_id", "url", "text")
    val out = CorpusPipeline.urlFilter(docs, CorpusPipeline.Config())
      .select("doc_id").as[String].collect().toSet
    assert(out === Set("a", "c", "d", "e"),
      s"expected the min-id URL survivor plus every URL-less doc, got $out")
  }
}
