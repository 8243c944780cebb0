package graft

import org.scalacheck.{Gen, rng}
import graft.operators.{AsOfJoin, Dedup}

/** Property-based equivalence for the pair-producing operators, against
  * from-first-principles reference computations on scalacheck-generated
  * inputs (fixed seeds — deterministic, no flaky CI).
  *
  *  - PPJoin (prefix + size + positional filtering) must emit EXACTLY
  *    the brute-force all-pairs Jaccard relation: the filters are
  *    claimed lossless, so any dropped or invented pair is a bug.
  *  - AsOfJoin.backward must match the per-probe "latest build at or
  *    before" rule computed row by row.
  *
  * Small vocabularies force heavy shingle collisions — the regime where
  * prefix filtering is actually exercised.
  */
class DedupPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val corpusGen: Gen[Seq[String]] = for {
    n <- Gen.choose(3, 9)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 14)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
  } yield docs

  /** Mirrors GraftFunctions.shingles word-for-word: positions
    * 1..max(len-2, 1), 3-token slices (shorter at the tail), distinct.
    */
  private def shingleSet(text: String): Set[String] = {
    val ts = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    (1 to math.max(ts.length - 2, 1))
      .map(i => ts.slice(i - 1, math.min(i + 2, ts.length)).mkString(" "))
      .filter(_.nonEmpty).toSet
  }

  test("PPJoin pairs equal brute-force Jaccard on random corpora") {
    for (s <- 1L to 12L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val ids = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val expected = (for {
        (ia, ta) <- ids; (ib, tb) <- ids if ia < ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = (sa & sb).size
        jac = inter.toDouble / (sa.size + sb.size - inter)
        if jac >= 0.5
      } yield (ia, ib, math.rint(jac * 1e9) / 1e9)).toSet
      val actual = Dedup.ngramJaccardPairs(ids.toDF("id", "text"), "id", "text",
          n = 3, threshold = 0.5)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b, math.rint(j * 1e9) / 1e9) }.toSet
      assert(actual === expected, s"seed $s corpus $corpus")
    }
  }

  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    nNodes <- Gen.choose(2, 24)
    nEdges <- Gen.choose(1, 30)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes - 1L); b <- Gen.choose(0L, nNodes - 1L)
      if a != b
    } yield (a, b))
  } yield edges

  test("connectedComponents equals union-find on random graphs") {
    import graft.operators.Components
    for (s <- 1L to 10L) {
      val edges = graphGen.pureApply(Gen.Parameters.default, rng.Seed(s), retries = 1000)
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val actual = Components.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(actual === expected, s"seed $s edges $edges")
    }
  }

  private val eventsGen: Gen[(Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])] =
    for {
      np <- Gen.choose(1, 12)
      probes <- Gen.listOfN(np, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
      nb <- Gen.choose(0, 12)
      builds <- Gen.listOfN(nb, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L); v <- Gen.choose(0L, 99L)
      } yield (k, t, v))
    } yield (
      probes.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      // unique per (k, ts): keep-max value, matching the operator contract
      builds.groupBy(b => (b._1, b._2)).map { case ((k, t), vs) =>
        (k, t, vs.map(_._3).max)
      }.toSeq)

  test("as-of join equals the per-probe latest-at-or-before rule") {
    for (s <- 1L to 10L) {
      val (probes, builds) = eventsGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val expected = probes.map { case (k, t, pid) =>
        val m = builds.filter(b => b._1 == k && b._2 <= t)
        (pid, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toSet
      val actual = AsOfJoin.backward(
          probes.toDF("k", "t", "pid"), builds.toDF("k", "t", "v"), "k", "t")
        .as[(Long, Long, Long, Option[Long])].collect()
        .map(r => (r._3, r._4)).toSet
      assert(actual === expected, s"seed $s probes $probes builds $builds")
    }
  }

  test("paragraphDedup at maxDf >= #docs is the whitespace-normalizing identity") {
    import graft.operators.ParagraphOps
    for (s <- 20L to 26L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val ids = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val r = ParagraphOps.paragraphDedup(ids.toDF("id", "text"), "id", "text",
          width = 3, maxDf = corpus.length)
        .as[(Long, String, Long, Long)].collect()
        .map { case (i, t, k, d) => i -> ((t, k, d)) }.toMap
      ids.foreach { case (i, t) =>
        val norm = t.trim.split("\\s+").filter(_.nonEmpty)
        val (clean, kept, dropped) = r(i)
        assert(clean === norm.mkString(" "), s"seed $s doc $i")
        assert(dropped === 0L && kept === (norm.length + 2) / 3, s"seed $s doc $i")
      }
    }
  }

  test("dropRepeatedSpans invariants: token ledger exact, output a subsequence") {
    import graft.operators.Contamination
    for (s <- 30L to 36L) {
      val corpus = corpusGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val ids = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val r = Contamination.dropRepeatedSpans(ids.toDF("id", "text"), "id", "text",
          k = 3)
        .as[(Long, String, Long, Long)].collect()
        .map { case (i, t, k2, d) => i -> ((t, k2, d)) }.toMap
      ids.foreach { case (i, t) =>
        val orig = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        val (clean, kept, dropped) = r(i)
        val out = if (clean.isEmpty) Seq.empty else clean.split(" ").toSeq
        assert(kept + dropped === orig.length, s"seed $s doc $i ledger")
        assert(out.length.toLong === kept, s"seed $s doc $i count")
        // subsequence check: output tokens appear in the original, in order
        out.foldLeft(orig) { (rem, tok) =>
          val j = rem.indexOf(tok)
          assert(j >= 0, s"seed $s doc $i: '$tok' not a subsequence token")
          rem.drop(j + 1)
        }
      }
    }
  }
}
