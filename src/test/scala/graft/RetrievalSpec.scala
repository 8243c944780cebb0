package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalQueries

/** Retrieval/selection family: BM25 ranking semantics, DSIR importance
  * direction, and the SemDeDup canonical mapping. (Cross-engine value
  * equality is the DuckDB oracle's job; these pin the SEMANTICS.)
  */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("bm25: tf monotonicity, idf favors rare terms, dl normalization") {
    val docs = Seq(
      (1L, "apple apple apple banana"), // tf(apple)=3
      (2L, "apple banana cherry date"), // tf(apple)=1
      (3L, "apple banana"), // tf=1 but SHORTER doc: dl-normalized above doc 2
      (4L, "cherry date elderberry fig"), // no query terms
      (5L, "banana banana banana banana") // only the common term
    ).toDF("doc_id", "text")
    val top = RetrievalQueries.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), k = 5)
      .as[(Long, Double)].collect().toSeq
    val rank = top.map(_._1)
    assert(!rank.contains(4L), "a doc with no query terms must not score")
    assert(rank.indexOf(1L) < rank.indexOf(2L),
      "higher tf must outrank lower tf at similar length")
    assert(rank.indexOf(3L) < rank.indexOf(2L),
      "equal tf in a shorter doc must rank higher (dl normalization)")
    assert(top.forall(_._2 > 0))
  }

  test("dsir: target-like docs get positive log-weights, off-target negative") {
    // target = src "t": speaks apple/banana; raw background speaks x/y/z
    val docs = (1L to 20L).map { i =>
      if (i <= 5) (i, "t", "apple banana apple banana apple")
      else (i, "r", "xx yy zz xx yy zz xx yy")
    }.toDF("doc_id", "source", "text")
    val w = RetrievalQueries.dsirLogWeights(docs, "doc_id", "text",
        col("source") === "t")
      .as[(Long, Double)].collect().toMap
    (1L to 5L).foreach(i => assert(w(i) > 0,
      s"target-domain doc $i must weigh positive, got ${w(i)}"))
    (6L to 20L).foreach(i => assert(w(i) < 0,
      s"background doc $i must weigh negative, got ${w(i)}"))
  }

  test("semantic canonical: exact-copy vectors share a min-id root; singletons self-root") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x64_semantic_canonical")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // the augmentation copies ids < 20 to id+10000: every copy must
    // resolve to its original (the min id of the pair/cluster)
    (0L until 20L).filter(out.contains).foreach { i =>
      assert(out(i + 10000) === out(i),
        s"copy ${i + 10000} must share $i's root")
      assert(out(i) <= i, "root is the min cluster member")
    }
    // roots are fixpoints: root(root(x)) == root(x)
    out.values.toSet.foreach { r: Long => assert(out(r) === r) }
  }

  test("mmr greedy: hand pool — diversity term demotes the near-duplicate") {
    // A (sim .9) and B (sim .89) point the same way; C (sim .5) is
    // orthogonal. Plain top-2 = [A, B]; MMR at lambda=.5 must pick C
    // second: B scores .5*.89 - .5*1.0 = -.055 < C's .5*.5 - 0 = .25
    val e1 = Array(1.0, 0.0)
    val e2 = Array(0.0, 1.0)
    val pool = Map(1L -> IndexedSeq(
      (100L, 0.9, e1), (200L, 0.89, e1), (300L, 0.5, e2)))
    val got = RetrievalQueries.mmrFromPool(pool, k = 2, lambda = 0.5)
    assert(got.map(t => (t._2, t._3)) === Seq((1, 100L), (2, 300L)), got)
    // lambda = 1: relevance only -> plain top-2
    val rel = RetrievalQueries.mmrFromPool(pool, k = 2, lambda = 1.0)
    assert(rel.map(_._3) === Seq(100L, 200L))
    // score tie at equal sims breaks to the smaller nid
    val tiePool = Map(1L -> IndexedSeq((7L, 0.8, e1), (3L, 0.8, e2)))
    assert(RetrievalQueries.mmrFromPool(tiePool, 1, 1.0).head._3 === 3L)
  }

  test("x105: declared query demotes planted duplicates; gate is empty") {
    val out = SparkEntry.queries("x105_mmr_rerank")(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    // every query id < 10 has an exact copy at +10000 with cosine 1.0:
    // MMR at lambda=.5 must never serve both a vector and its planted
    // copy (score of the second of the pair is .5*sim - .5*1.0 < 0,
    // always beaten by any candidate with sim > 0 diversity < 1)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val nids = rows.map(_._3).toSet
      (0L until 20L).foreach { i =>
        assert(!(nids.contains(i) && nids.contains(i + 10000)),
          s"qid $qid serves both $i and its exact copy")
      }
    }
    assert(SparkEntry.queries("x105g_mmr_gate")(spark, sfDir).count() === 0)
  }

  test("each x105g clause FIRES on a tampered selection") {
    import graft.operators.Pq
    val corpus = Pq.corpusWithDups(spark, sfDir)
    val pool = RetrievalQueries.collectMmrPool(
      corpus.filter(col("id") < 10), corpus, "id", "embedding", 30)
    val good = RetrievalQueries.mmrFromPool(pool, 10, 0.5)
    def clauses(sel: Seq[(Long, Int, Long, Double)]): Set[String] =
      RetrievalQueries.mmrGateRows(spark, pool, 10, sel)
        .select("clause").as[String].collect().toSet
    assert(clauses(good) === Set.empty)
    // swap ranks 1 and 2 of one query -> rank1 clause
    val q0 = good.filter(_._1 == good.head._1)
    val swapped = good.map {
      case (q, 1, n, s) if q == q0.head._1 => (q, 1, q0(1)._3, s)
      case (q, 2, n, s) if q == q0.head._1 => (q, 2, q0.head._3, s)
      case r => r
    }
    assert(clauses(swapped).exists(_.startsWith("rank1_")))
    // drop a row -> members clause
    assert(clauses(good.tail).exists(_.startsWith("members_")))
    // diversity clause: a synthetic pool where the plain top-2 [A, C]
    // is orthogonal (mean pairwise cos 0) but a valid tampered
    // selection [A, B] is co-directional (mean 1.0) — rank1/members/
    // lambda1 stay clean, ONLY diversity fires
    val e1 = Array(1.0, 0.0)
    val e2 = Array(0.0, 1.0)
    val synth = Map(5L -> IndexedSeq((1L, 0.9, e1), (2L, 0.7, e1), (3L, 0.8, e2)))
    val bad = Seq((5L, 1, 1L, 0.45), (5L, 2, 2L, 0.35))
    val fired = RetrievalQueries.mmrGateRows(spark, synth, 2, bad)
      .select("clause").as[String].collect().toSet
    assert(fired === Set("diversity_q5"), fired)
  }
}
