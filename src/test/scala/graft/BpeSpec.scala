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

  test("batched learning is bit-identical to one-merge-per-pass greedy") {
    // the Sennrich corpus (heavy symbol sharing: es/est/lo/low chains
    // force tiny batches) plus a riser-adversarial corpus where merging
    // (a,b) feeds (ab,c) from (b,c) occurrences
    val riser = Seq(
      (1L, Seq.fill(10)("abc").mkString(" ")),
      (2L, Seq.fill(7)("abd").mkString(" ")),
      (3L, Seq.fill(6)("xy").mkString(" ")),
      (4L, Seq.fill(5)("pq").mkString(" "))).toDF("doc_id", "text")
    for (docs <- Seq(corpus, riser); n <- Seq(4, 8, 12)) {
      val vocab = BpeQueries.wordVocab(docs, "text")
      val sequential = BpeQueries.learnMerges(vocab, n, batchSize = 1)
      val batched = BpeQueries.learnMerges(vocab, n, batchSize = 8)
      assert(batched === sequential,
        s"batched diverged from sequential at n=$n:\n $batched\n vs $sequential")
    }
  }

  test("batched learning: random corpora agree with sequential") {
    // pseudo-random words over a tiny alphabet maximize pair collisions
    // and riser opportunities; fixed seed keeps the spec deterministic
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      val words = Seq.fill(60)(
        Seq.fill(2 + rnd.nextInt(5))("abcde" (rnd.nextInt(5))).mkString)
      val docs = Seq((trial.toLong, words.mkString(" "))).toDF("doc_id", "text")
      val vocab = BpeQueries.wordVocab(docs, "text")
      val sequential = BpeQueries.learnMerges(vocab, 10, batchSize = 1)
      val batched = BpeQueries.learnMerges(vocab, 10, batchSize = 6)
      assert(batched === sequential, s"trial $trial diverged")
    }
  }

  test("batching cuts counting passes: 64 disjoint merges in <= 5 passes") {
    // 64 two-char words over 128 distinct codepoints — no shared
    // symbols anywhere — in four frequency blocks separated by more
    // than the 4x riser margin, so every pass accepts a full batch
    import spark.implicits._
    val vocab = (0 until 64).map { i =>
      val w = "" + (1000 + 2 * i).toChar + (1001 + 2 * i).toChar
      val freq = 1000000L / math.pow(5, i / 16).toLong
      (w, freq)
    }.toDF("w", "freq")
    val (merges, passes) =
      BpeQueries.learnMergesWithPasses(vocab, 64, batchSize = 16)
    assert(merges.length === 64)
    assert(passes <= 5, s"expected <= 64/16 + 1 passes, took $passes")
    // and the result still equals the sequential order
    val sequential = BpeQueries.learnMerges(vocab, 64, batchSize = 1)
    assert(merges === sequential)
  }

  test("encodeVocabCounts: subword counts under the learned table match hand computation") {
    val vocab = BpeQueries.wordVocab(corpus, "text")
    val merges = BpeQueries.learnMerges(vocab, 4)
    val counts = BpeQueries.encodeVocabCounts(vocab, merges)
      .as[(String, Long)].collect().toMap
    // low x5 -> [low]; lower x2 -> [low,e,r]; newest x6 -> [n,e,w,est];
    // widest x3 -> [w,i,d,est]
    assert(counts("low") === 7L)   // 5 + 2
    assert(counts("est") === 9L)   // 6 + 3
    assert(counts("e") === 8L)     // lower 2 + newest 6
    assert(counts("w") === 9L)     // newest 6 + widest 3
    assert(counts.get("es") === None) // intermediate symbol fully fused away
  }

  test("x81g encode gate is empty on the testdata corpus") {
    val out = BpeQueries.queries("x81g_bpe_encode_gate")(spark, sfDir)
    assert(out.count() === 0)
  }
}
