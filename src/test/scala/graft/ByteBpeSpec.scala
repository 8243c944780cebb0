package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.BpeQueries

/** x119: byte-level BPE pretokenization — the classic hand-computed
  * merge fixture extended with a multi-byte character, pretokenizer
  * tiling on adversarial unicode, and the total-encode round trip.
  */
class ByteBpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("hand-computed byte merges on a multi-byte fixture") {
    // "aé aé aé": pretokens "aé", " aé"x2; aé = 61 C3 A9, " aé" = 20 61 C3 A9
    // pair counts: (61,C3)=3, (C3,A9)=3, (20,61)=2
    // merge 1: tie at 3 breaks on l asc -> (61,C3); merge 2: (61C3,A9)=3;
    // merge 3: (20,61C3A9)=2; then every pretoken is one symbol — stop.
    val docs = Seq(("d1", "aé aé aé")).toDF("doc_id", "t")
    val vocab = BpeQueries.pretokenVocab(docs, "t")
      .withColumn("syms", BpeQueries.byteSyms(col("w")))
    val got = BpeQueries.learnMergesOn(vocab, numMerges = 5)
      .map(m => (m.rank, m.l, m.r, m.cnt))
    assert(got === Seq(
      (1, "61", "C3", 3L),
      (2, "61C3", "A9", 3L),
      (3, "20", "61C3A9", 2L)))
  }

  test("pretokens tile adversarial unicode exactly; byte fallback is total") {
    val texts = Seq(
      "héllo wörld 🌍 42!",
      "  double  spaces\tand\nnewlines  ",
      "naïve café — em-dash… 日本語テキスト",
      "mixed42digits and CAPS'apostrophe")
    val df = texts.zipWithIndex.map { case (t, i) => (s"d$i", t) }
      .toDF("doc_id", "t")
    // (a) tiling: concatenated pretokens reproduce the raw text
    assert(df.filter(
      array_join(BpeQueries.pretokens(col("t")), "") =!= col("t")).count() === 0)
    // (b) totality: byte symbols concatenate to the exact UTF-8 hex of
    // every pretoken (no character can fail to encode)
    val vocab = BpeQueries.pretokenVocab(df, "t")
    assert(vocab.filter(
      array_join(BpeQueries.byteSyms(col("w")), "") =!=
        hex(encode(col("w"), "UTF-8"))).count() === 0)
  }

  test("round trip decode(encode(x)) == x through learned merges, incl. multi-byte") {
    val docs = Seq(
      ("d1", "the naïve café owner says the café is naïve"),
      ("d2", "the café 🌍 report and the owner"),
      ("d3", "plain ascii text with the usual words and café"))
      .toDF("doc_id", "t")
    val vocab = BpeQueries.pretokenVocab(docs, "t")
      .withColumn("syms", BpeQueries.byteSyms(col("w")))
    val merges = BpeQueries.learnMergesOn(vocab, numMerges = 8)
    assert(merges.nonEmpty)
    // encode each doc: pretokenize, replay merges over byte symbols,
    // concat hex, unhex, decode — must reproduce the raw text exactly
    val folded = merges.foldLeft(BpeQueries.byteSyms(col("w")): Column)(
      (acc, m) => BpeQueries.applyMerge(acc, m.l, m.r))
    val enc = BpeQueries.pretokenVocab(docs, "t")
      .select(col("w"), array_join(folded, "").as("hexenc"))
    val bad = enc.filter(
      decode(unhex(col("hexenc")), "UTF-8") =!= col("w"))
    assert(bad.count() === 0,
      s"round trip broken: ${bad.collect().toSeq}")
  }

  test("x119g gate catches a minting merge table") {
    // tamper: a merge whose fused symbol is NOT l+r would mint bytes —
    // applyMerge can't express that, so tamper the SEGMENTATION instead:
    // drop a learned merge from the replay used for reconstruction and
    // verify the gate arithmetic (enc == hex) still holds — merges only
    // REGROUP bytes, so any prefix of the table round-trips too. The
    // real failure mode is a wrong byteSyms; simulate by truncating one
    // symbol and assert the check fires.
    val docs = Seq(("d1", "abc abc")).toDF("doc_id", "t")
    val vocab = BpeQueries.pretokenVocab(docs, "t")
    val truncated = vocab
      .select(col("w"),
        slice(BpeQueries.byteSyms(col("w")), lit(1),
          greatest(size(BpeQueries.byteSyms(col("w"))) - 1, lit(1))).as("syms"))
    val bad = truncated.filter(
      array_join(col("syms"), "") =!= hex(encode(col("w"), "UTF-8")))
    assert(bad.count() > 0, "a lossy symbolization must fail the hex check")
  }

  test("x127 vocab-size curve: anchored at bytes, monotone, gate empty") {
    val curve = SparkEntry.queries("x127_bpe_vocab_curve")(spark, sfDir)
      .orderBy("n_merges").collect()
    assert(curve.map(_.getInt(0)).toSeq === Seq(0, 4, 8, 16, 24))
    val m0 = curve.head
    assert(m0.getLong(2) === m0.getLong(3), "m=0 tokens must equal bytes")
    assert(m0.getLong(4) === 1000000L)
    val toks = curve.map(_.getLong(2)).toSeq
    assert(toks.sliding(2).forall { case Seq(a, b) => b <= a },
      s"tokens not monotone: $toks")
    assert(toks.last < toks.head, "24 merges must compress the corpus")
    assert(SparkEntry.queries("x127g_bpe_curve_gate")(spark, sfDir)
      .count() === 0)
  }

  test("BPE merge sequences are prefix-nested: m-merge run == first m of a larger run") {
    val bv = BpeQueries.pretokenVocab(
      Tables(spark, sfDir, "documents").select(col("text").as("t")), "t")
      .withColumn("syms", BpeQueries.byteSyms(col("w")))
    val m8 = BpeQueries.learnMergesOn(bv, 8)
    val m16 = BpeQueries.learnMergesOn(bv, 16)
    assert(m16.take(m8.size) === m8,
      "the curve's prefix-slice reuse depends on greedy nesting")
  }

  test("x127g clauses fire on tampered curves") {
    // rising tokens -> monotone; minted vocab -> vocab_bound;
    // broken anchor -> anchor; no improvement -> improvement
    val bad = Seq(
      (0, 10L, 90L, 100L, 1000000L),  // anchor broken (90 != 100)
      (4, 20L, 95L, 100L, 950000L),   // tokens rose, vocab 20 > 10+4
      (8, 12L, 95L, 100L, 950000L))
    val viol = BpeQueries.curveGateRows(spark, bad)
      .collect().map(_.getString(0))
    assert(viol.contains("anchor"), viol.toSeq)
    assert(viol.exists(_.startsWith("monotone")), viol.toSeq)
    assert(viol.exists(_.startsWith("vocab_bound")), viol.toSeq)
    val flat = Seq((0, 10L, 100L, 100L, 1000000L),
      (4, 12L, 100L, 100L, 1000000L))
    val fl = BpeQueries.curveGateRows(spark, flat)
      .collect().map(_.getString(0))
    assert(fl.contains("improvement"), fl.toSeq)
  }
}
