package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeQueries

/** BPE learning against the classic hand-computable corpus (the
  * Sennrich'16 example shape): merge order, frequency weighting,
  * deterministic tie-breaks, greedy non-overlap, and segmentation of
  * unseen words from the learned table.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // low x5, lower x2, newest x6, widest x3 — known pair counts:
  // (e,s)=9 ties (s,t)=9, broken lexicographically; then (es,t)=9,
  // then (l,o)=7 ties (o,w)=7, then (lo,w)=7.
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
    .toDF("doc_id", "text")

  test("learnMerges: ranked merges match the hand computation") {
    val merges = BpeQueries.learnMerges(
      BpeQueries.wordVocab(corpus, "text"), 4)
    assert(merges.map(m => (m.rank, m.l, m.r, m.cnt)) === Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L)))
  }

  test("applyMerge: greedy left-to-right, non-overlapping") {
    val out = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"))
      .toDF("syms")
      .select(BpeQueries.applyMerge($"syms", "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("segment: an unseen word splits on the learned merge table") {
    val merges = BpeQueries.learnMerges(
      BpeQueries.wordVocab(corpus, "text"), 4)
    val segs = Seq("lowest lower")
      .toDF("text")
      .select(BpeQueries.segment($"text", merges).as("s"))
      .as[Seq[Seq[String]]].head()
    // lowest: (e,s) -> (es,t) -> (l,o) -> (lo,w) leaves [low, est];
    // lower keeps its tail un-fused (no (e,r) merge learned)
    assert(segs === Seq(Seq("low", "est"), Seq("low", "e", "r")))
  }

  test("learner stops early when every word is one symbol") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val merges = BpeQueries.learnMerges(
      BpeQueries.wordVocab(tiny, "text"), 10)
    assert(merges.map(m => (m.l, m.r, m.cnt)) === Seq(("a", "b", 2L)))
  }

  test("x54g gate is empty on the testdata corpus") {
    val out = BpeQueries.queries("x54g_bpe_gate")(spark, sfDir)
    assert(out.count() === 0)
  }
}
