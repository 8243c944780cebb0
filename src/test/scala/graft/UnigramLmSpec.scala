package graft

import org.apache.spark.sql.functions._
import graft.operators.UnigramLm
import graft.operators.UnigramLm.UnigramModel

/** Unigram-LM tokenizer (x101 family): lattice DP correctness against
  * hand-computed values, EM determinism + monotone likelihood + the
  * compression effect on a repetitive fixture, Viterbi decode + tie
  * convention, and per-clause gate sensitivity on tampered models.
  */
class UnigramLmSpec extends SparkSpecBase {
  import spark.implicits._

  /** A corpus whose words are built from two strong multi-char units
    * ("ab", "cd") plus noise chars — EM must load probability onto the
    * units and Viterbi must then prefer them over char-by-char.
    */
  private lazy val unitVocab =
    Seq(("abab", 50L), ("abcd", 30L), ("cdcd", 40L), ("xaby", 5L), ("cde", 8L))
      .toDF("w", "freq").localCheckpoint(true)

  test("viterbi decodes the hand-computed best segmentation and honors the longest-piece tie rule") {
    val vmap = typedlit(Map(
      "a" -> 0.1, "b" -> 0.1, "c" -> 0.1, "d" -> 0.1,
      "ab" -> 0.25, "cd" -> 0.25, "abcd" -> 0.1))
    val got = Seq("abcd").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), vmap, 4).as("ps"))
      .head().getSeq[String](0)
    // ln(.1) = -2.303: "abcd" scores -2.303; "ab cd" scores 2*ln(.25)
    // = -2.773; chars score 4*ln(.1) = -9.21 -> the whole-word piece wins
    assert(got === Seq("abcd"), got)
    // equal-probability tie: p(abcd) vs p(ab)p(cd) both 0.04 -> the
    // smaller start index (longer final piece) must win deterministically
    val tie = typedlit(Map("ab" -> 0.2, "cd" -> 0.2, "abcd" -> 0.04,
      "a" -> 0.01, "b" -> 0.01, "c" -> 0.01, "d" -> 0.01))
    val got2 = Seq("abcd").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), tie, 4).as("ps"))
      .head().getSeq[String](0)
    assert(got2 === Seq("abcd"), got2)
  }

  test("viterbi yields null for an unsegmentable word") {
    val vmap = typedlit(Map("a" -> 0.5, "b" -> 0.5))
    val r = Seq("abz").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), vmap, 4).as("ps"))
      .head()
    assert(r.isNullAt(0))
  }

  test("fit is deterministic, traces are non-decreasing, and EM loads mass onto the planted units") {
    val m1 = UnigramLm.fit(unitVocab, maxLen = 2, seedSize = 20, target = 8, rounds = 4)
    val m2 = UnigramLm.fit(unitVocab, maxLen = 2, seedSize = 20, target = 8, rounds = 4)
    assert(m1.probs === m2.probs)
    assert(m1.traces === m2.traces)
    assert(m1.coverageMisses === 0)
    m1.traces.foreach { trace =>
      trace.sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a - 1e-8 * math.max(1.0, a.abs), s"likelihood fell $a -> $b in $trace")
      }
    }
    // the planted units dominate their constituent chars
    assert(m1.probs("ab") > m1.probs("a") && m1.probs("ab") > m1.probs("b"),
      m1.probs.toSeq.sortBy(-_._2).mkString(", "))
    assert(m1.probs("cd") > m1.probs("c") && m1.probs("cd") > m1.probs("d"))
    // and Viterbi therefore compresses: "abab" -> [ab, ab]
    val vmap = typedlit(m1.probs)
    val enc = Seq("abab").toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), vmap, 2).as("ps"))
      .head().getSeq[String](0)
    assert(enc === Seq("ab", "ab"), enc)
  }

  /** Independent reference Viterbi: a 15-line driver-side DP sharing
    * NOTHING with the Catalyst lattice (no HOFs, no log-space folds —
    * plain doubles and arrays), with the same tie rule (equal scores
    * prefer the smaller start index, i.e. the longer final piece).
    * The parity tests below pin fit→encode against it so a lattice
    * regression cannot hide behind the gate's self-consistency.
    */
  private def referencePieces(w: String, probs: Map[String, Double],
                              maxLen: Int): Option[Seq[String]] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (j <- 1 to n; i <- math.max(0, j - maxLen) until j) {
      probs.get(w.substring(i, j)).foreach { p =>
        val s = best(i) + math.log(p)
        // strictly-greater keeps the FIRST (smallest) start index on ties
        if (s > best(j)) { best(j) = s; back(j) = i }
      }
    }
    if (back(n) < 0) None
    else {
      var j = n
      val rev = scala.collection.mutable.ArrayBuffer.empty[String]
      while (j > 0) { rev += w.substring(back(j), j); j = back(j) }
      Some(rev.reverse.toSeq)
    }
  }

  test("fit→encode parity: held-out words segment exactly as hand-derived") {
    // hand derivation on the planted-units corpus (maxLen 2): EM loads
    // probability onto "ab" and "cd" far above their constituent chars
    // (asserted in the fit test), so for any word tiled by units plus
    // isolated noise chars the best lattice path is units-first:
    //   ababab -> [ab, ab, ab]   (3 unit pieces beat any char split)
    //   cdab   -> [cd, ab]
    //   xcdy   -> [x, cd, y]     (noise chars survive as singletons)
    //   abe    -> [ab, e]
    val m = UnigramLm.fit(unitVocab, maxLen = 2, seedSize = 20, target = 8,
      rounds = 4)
    val vmap = typedlit(m.probs)
    val got = Seq("ababab", "cdab", "xcdy", "abe").toDF("w")
      .select(col("w"), UnigramLm.viterbiPieces(col("w"), vmap, 2).as("ps"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("ababab") === Seq("ab", "ab", "ab"), got)
    assert(got("cdab") === Seq("cd", "ab"), got)
    assert(got("xcdy") === Seq("x", "cd", "y"), got)
    assert(got("abe") === Seq("ab", "e"), got)
  }

  test("fit→encode parity: the Catalyst lattice matches the independent reference DP") {
    val m = UnigramLm.fit(unitVocab, maxLen = 2, seedSize = 20, target = 8,
      rounds = 4)
    val vmap = typedlit(m.probs)
    // every training word plus held-out tilings, unsegmentable shapes
    // included (both sides must agree on null)
    val words = Seq("abab", "abcd", "cdcd", "xaby", "cde", "ababab",
      "cdab", "xcdy", "abe", "abz", "aaaa", "dcba", "e", "x")
    val got = words.toDF("w")
      .select(col("w"), UnigramLm.viterbiPieces(col("w"), vmap, 2).as("ps"))
      .as[(String, Option[Seq[String]])].collect().toMap
    words.foreach { w =>
      val exp = referencePieces(w, m.probs, maxLen = 2)
      assert(got(w) === exp,
        s"lattice/reference divergence on '$w': got ${got(w)}, expected $exp")
    }
  }

  test("prune keeps single chars: rare-char words stay segmentable after a hard prune") {
    val m = UnigramLm.fit(unitVocab, maxLen = 2, seedSize = 20, target = 2, rounds = 2)
    assert(m.coverageMisses === 0,
      s"chars must survive target=2: ${m.probs.keys.toSeq.sorted}")
    Seq("a", "b", "c", "d", "e", "x", "y").foreach(c =>
      assert(m.probs.contains(c), s"char $c pruned away"))
  }

  test("log-space lattice covers a 300-char token that underflows raw-probability DP") {
    // A whitespace-free 300-char word (URL/base64/hash shape): with
    // per-piece probs around 1e-1..1e-2 the raw-probability alpha
    // product sits near 1e-150..1e-300 — the pre-log-space lattice
    // underflowed alpha_N to exactly 0 for such words, silently
    // excluding them from the E-step and miscounting them as coverage
    // misses (a permanently red x101g on real web data).
    val long = ("ab" * 140) + "cdcdcdcdcdcdcdcdcdcd" // 300 chars
    val vocab = (Seq((long, 1L)) ++
      Seq(("abab", 50L), ("cdcd", 40L))).toDF("w", "freq")
    val m = UnigramLm.fit(vocab, maxLen = 2, seedSize = 20, target = 8, rounds = 3)
    assert(m.coverageMisses === 0,
      s"300-char token must be covered, not an underflow miss: ${m.probs}")
    m.traces.foreach { trace =>
      trace.foreach(ll => assert(java.lang.Double.isFinite(ll), s"non-finite ll in $trace"))
      trace.sliding(2).foreach { case Seq(a, b) =>
        assert(b >= a - 1e-8 * math.max(1.0, a.abs), s"likelihood fell $a -> $b in $trace")
      }
    }
    // and the trained model still Viterbi round-trips the long word
    val enc = Seq(long).toDF("w")
      .select(UnigramLm.viterbiPieces(col("w"), typedlit(m.probs), 2).as("ps"))
      .select(concat_ws("", col("ps")).as("rt")).head().getString(0)
    assert(enc === long)
  }

  test("x101 declared queries: vocab + encode yield rows, gate is empty") {
    val vocab = SparkEntry.queries("x101_unigram_vocab")(spark, sfDir)
    assert(vocab.count() > 0)
    val enc = SparkEntry.queries("x101e_unigram_encode")(spark, sfDir)
    val words = enc.count()
    assert(words > 0)
    // round trip on the real corpus: no nulls, pieces rebuild each word
    assert(enc.filter(col("pieces").isNull).count() === 0)
    assert(SparkEntry.queries("x101g_unigram_gate")(spark, sfDir).count() === 0)
  }

  test("each gate clause FIRES on a tampered model") {
    val good = {
      // a healthy model over the real corpus via the declared query path
      SparkEntry.queries("x101g_unigram_gate")(spark, sfDir) // warms memo
      UnigramLm.fit(operators.BpeQueries.wordVocab(
        Tables(spark, sfDir, "documents"), "text"), 4, 120, 60, 2)
    }
    def clauses(m: UnigramModel): Set[String] =
      UnigramLm.gateRows(spark, sfDir, m)
        .select("clause").as[String].collect().toSet
    assert(clauses(good) === Set.empty)
    assert(clauses(good.copy(traces = Seq(Seq(0.0, -1.0))))
      .exists(_.startsWith("em_phase1")), "falling trace must fire")
    assert(clauses(good.copy(probs = good.probs.map(kv => kv._1 -> kv._2 * 2)))
      .contains("prob_sum"), "unnormalized probs must fire")
    assert(clauses(good.copy(coverageMisses = 3)).contains("coverage"))
    // dropping a single-char piece makes some word unsegmentable -> roundtrip
    val chars = good.probs.keys.filter(_.length == 1)
    val broken = good.copy(probs = good.probs - chars.head)
    assert(clauses(broken).contains("roundtrip") || clauses(broken).contains("prob_sum"),
      "a missing char must surface as a roundtrip (or prob-sum) violation")
  }
}
