package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

/** Product-quantization invariants the corpus gates can't isolate:
  * subvector splitting, exact-cover training (zero error when every
  * subvector seeds its own centroid), Lloyd error monotonicity on
  * random data, and self-query ADC identity.
  */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "embedding")

  test("subVectors splits a vector into M contiguous ds-length slices") {
    val v = vecs(Seq((1L, (1 to 8).map(_.toDouble))))
    val sv = Pq.subVectors(v, "id", "embedding", m = 4, ds = 2)
      .orderBy("m").as[(Long, Int, Seq[Double])].collect().toSeq
    assert(sv === Seq(
      (1L, 1, Seq(1.0, 2.0)), (1L, 2, Seq(3.0, 4.0)),
      (1L, 3, Seq(5.0, 6.0)), (1L, 4, Seq(7.0, 8.0))))
  }

  test("ks >= N: every subvector is its own centroid, error 0, self-ADC 0") {
    val rnd = new scala.util.Random(7)
    val corpus = vecs((0L until 4L).map(i =>
      (i, Seq.fill(8)(rnd.nextDouble()))))
    val cb = Pq.train(corpus, "id", "embedding", m = 4, ks = 4, iters = 1)
    assert(cb.errors.length === 2)
    assert(cb.errors.forall(_ < 1e-12), s"errors ${cb.errors}")
    val codes = Pq.encode(corpus, "id", "embedding", cb, m = 4, ds = 2)
    assert(codes.count() === 16) // 4 vectors x 4 subspaces
    val top = Pq.adcTopK(corpus, codes, cb, "id", "embedding",
      m = 4, ds = 2, k = 1).as[(Long, Long, Int, Double)].collect()
    // each query's rank-1 neighbor is itself at ADC distance 0
    assert(top.toSeq.sortBy(_._1) ===
      (0L until 4L).map(i => (i, i, 1, 0.0)))
  }

  test("Lloyd error is non-increasing over rounds on random data") {
    val rnd = new scala.util.Random(13)
    val corpus = vecs((0L until 80L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble()))))
    val cb = Pq.train(corpus, "id", "embedding", m = 4, ks = 4, iters = 3)
    assert(cb.errors.length === 4)
    cb.errors.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9 * math.max(1.0, a.abs), s"rose $a -> $b")
    }
    // training genuinely improved on this data, not just held steady
    assert(cb.errors.last < cb.errors.head)
  }

  test("an exact duplicate shares all codes and ties its twin's ADC") {
    val rnd = new scala.util.Random(21)
    val base = (0L until 30L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
    val corpus = vecs(base :+ (100L, base.head._2)) // dup of id 0
    val cb = Pq.train(corpus, "id", "embedding", m = 4, ks = 8, iters = 2)
    val codes = Pq.encode(corpus, "id", "embedding", cb, m = 4, ds = 2)
    val dupCodes = codes.filter(col("id").isin(0L, 100L))
      .groupBy("m").agg(countDistinct(col("code")).as("n"))
      .as[(Int, Long)].collect()
    assert(dupCodes.forall(_._2 == 1L), "duplicate diverged in codes")
    val top = Pq.adcTopK(corpus.filter(col("id") === 0), codes, cb,
      "id", "embedding", m = 4, ds = 2, k = 2)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(top.map(_._2).toSet === Set(0L, 100L))
    assert(top.map(_._4).distinct.size === 1, "twin ADC differs")
  }

  test("x80 gates are empty on the testdata corpus") {
    assert(Pq.queries("x80g_pq_train_gate")(spark, sfDir).count() === 0)
    assert(Pq.queries("x80r_pq_dup_recall")(spark, sfDir).count() === 0)
  }

  test("appendCodes assigns a batch byte-identically to a full re-encode") {
    val rnd = new scala.util.Random(31)
    val all = (0L until 60L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
    val corpus = vecs(all)
    val stored = corpus.filter(col("id") % 2 === 0)
    val batch = corpus.filter(col("id") % 2 === 1)
    val cb = Pq.train(stored, "id", "embedding", m = 4, ks = 8, iters = 2)
    val merged = Pq.appendCodes(
      Pq.encode(stored, "id", "embedding", cb, m = 4, ds = 2),
      batch, "id", "embedding", cb, m = 4, ds = 2)
    val full = Pq.encode(corpus, "id", "embedding", cb, m = 4, ds = 2)
    assert(merged.count() === 240) // 60 vectors x 4 subspaces
    // symmetric difference empty => identical (id, m, code) relations
    assert(merged.exceptAll(full).count() === 0)
    assert(full.exceptAll(merged).count() === 0)
  }

  test("drift gate: healthy batch passes, shifted batch trips") {
    val rnd = new scala.util.Random(43)
    val all = (0L until 80L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
    val corpus = vecs(all)
    val stored = corpus.filter(col("id") % 2 === 0)
    val batch = corpus.filter(col("id") % 2 === 1)
    val cb = Pq.train(stored, "id", "embedding", m = 4, ks = 8, iters = 2)
    val trainN = stored.count()
    val (okSum, okN) = Pq.batchQuantizationError(batch, "id", "embedding",
      cb, m = 4, ds = 2)
    // same distribution: per-vector error within 2x of training error
    assert(Pq.driftViolations(cb.errors.last, trainN, okSum, okN, 2.0).isEmpty,
      s"healthy batch flagged: train ${cb.errors.last / trainN}, batch ${okSum / okN}")
    // a scaled+shifted batch reconstructs catastrophically worse: the
    // gate MUST fire (this is the stale-codebook detection contract)
    val shifted = batch.select(col("id"),
      transform(col("embedding"), x => x * 5.0 + 1.0).as("embedding"))
    val (badSum, badN) = Pq.batchQuantizationError(shifted, "id", "embedding",
      cb, m = 4, ds = 2)
    val v = Pq.driftViolations(cb.errors.last, trainN, badSum, badN, 2.0)
    assert(v.nonEmpty && v.head._1 == "drift", s"shifted batch not flagged: $v")
  }

  test("x96 gates are empty on the testdata corpus") {
    assert(Pq.queries("x96g_pq_append_coverage")(spark, sfDir).count() === 0)
    assert(Pq.queries("x96d_pq_code_drift_gate")(spark, sfDir).count() === 0)
    assert(Pq.queries("x96r_pq_append_recall")(spark, sfDir).count() === 0)
  }
}
