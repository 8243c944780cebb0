package graft

import org.apache.spark.sql.functions._
import graft.operators.{Opq, Pq}

class OpqSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Long = 7L) = {
    // deterministic pseudo-random vectors with CORRELATED halves: the
    // second half of each vector echoes the first half scaled — the
    // structure a learned rotation can exploit and the native
    // coordinate split cannot
    val rng = new scala.util.Random(seed)
    (1 to n).map { i =>
      val a = Array.fill(dim / 2)(rng.nextDouble() * 2 - 1)
      (i.toLong, (a ++ a.map(_ * 0.9 + 0.01 * rng.nextDouble())).toSeq)
    }.toDF("id", "vec")
  }

  test("rotate applies R as a pure projection: permutation matrix permutes coordinates") {
    // rotate builds on the registered native dot — train/index register
    // it themselves; a direct caller needs the session prepared
    graft.functions.GraftExtensions.register(spark)
    val perm = Seq( // rotate-by-one permutation of dim 4 (orthogonal)
      Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0),
      Seq(0.0, 0.0, 0.0, 1.0),
      Seq(1.0, 0.0, 0.0, 0.0))
    val df = Seq((1L, Seq(10.0, 20.0, 30.0, 40.0))).toDF("id", "vec")
    val out = df.select(Opq.rotate(perm, col("vec")).as("r"))
      .as[Seq[Double]].head()
    assert(out === Seq(20.0, 30.0, 40.0, 10.0))
  }

  test("reconstruct concatenates the coded subspace centroids in order") {
    val c = corpus(64, 8)
    val cb = Pq.train(c, "id", "vec", m = 2, ks = 4, iters = 1)
    val codes = Pq.encode(c, "id", "vec", cb, m = 2, ds = 4)
    val rec = Opq.reconstruct(codes, cb.centroids)
    // every reconstruction is exactly some (code1, code2) centroid pair
    val cents = cb.centroids.select("m", "code", "cvec")
      .as[(Int, Int, Seq[Double])].collect()
      .groupBy(_._1).map { case (m, rs) => m -> rs.map(r => r._2 -> r._3).toMap }
    val joined = codes.groupBy("id")
      .agg(sort_array(collect_list(struct(col("m"), col("code")))).as("cs"))
      .join(rec, "id")
      .as[(Long, Seq[(Int, Int)], Seq[Double])].collect()
    joined.foreach { case (_, cs, rhat) =>
      val expected = cs.flatMap { case (m, code) => cents(m)(code) }
      assert(rhat === expected)
    }
  }

  test("train: monotone combined trace, orthogonal R, never worse than plain PQ") {
    val c = corpus(300, 8)
    val model = Opq.train(c, "id", "vec", m = 2, ks = 4,
      opqIters = 3, lloydIters = 2)
    // (a) the alternating trace never rises (relative tolerance)
    model.errors.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9 * math.max(1.0, a.abs), s"trace rose $a -> $b in ${model.errors}")
    }
    // (b) R orthogonal to fp precision
    assert(model.orthoErr < 1e-9, s"orthoErr ${model.orthoErr}")
    // (c) OPQ's first iteration with R = I and cold seeds IS plain PQ,
    // so the final error can never exceed a plain PQ train of the same
    // config — the guaranteed form of "rotation helps"
    val plain = Pq.train(c, "id", "vec", m = 2, ks = 4, iters = 2)
    assert(model.errors.last <= plain.errors.last + 1e-9 * plain.errors.last,
      s"OPQ ${model.errors.last} vs plain PQ ${plain.errors.last}")
    // and on this correlated construction the rotation should improve
    // the plain split by a real margin — 0.1% clears float-sum jitter
    // (the guaranteed contract is only <=; the margin is an empirical
    // property of the correlated-halves construction, comfortably met)
    assert(model.errors.last < plain.errors.last * 0.999,
      s"expected >0.1% improvement on correlated halves: ${model.errors.last} vs ${plain.errors.last}")
  }

  test("warm-started Pq.train continues from the given codebook") {
    val c = corpus(200, 8)
    val cb1 = Pq.train(c, "id", "vec", m = 2, ks = 4, iters = 1)
    val cb2 = Pq.train(c, "id", "vec", m = 2, ks = 4, iters = 0,
      init = Some(cb1.asMap))
    // zero further rounds from cb1's codebook: the single assignment
    // error equals cb1's final error (same centroids, same data)
    assert(math.abs(cb2.errors.head - cb1.errors.last) <=
      1e-9 * math.max(1.0, cb1.errors.last))
  }

  test("x96o: OPQ append identity gate empty; drift check healthy on the rotated batch") {
    assert(Opq.queries("x96o_opq_append_identity")(spark, sfDir).count() === 0)
    // drift through the rotation: the odd half rotated with the stored R
    // reconstructs within 2x of the model's training error — the
    // quantizer-agnostic Pq.batchQuantizationError applied to OPQ
    val corpus = Pq.corpusWithDups(spark, sfDir)
    val model = Opq.train(corpus.filter(col("id") % 2 === 0), "id", "embedding",
      m = 8, ks = 16, opqIters = 2, lloydIters = 1)
    val trainN = corpus.filter(col("id") % 2 === 0).count()
    val rot = corpus.filter(col("id") % 2 === 1)
      .select(col("id"),
        Opq.rotate(model.r, col("embedding").cast("array<double>")).as("rvec"))
    val (bSum, bN) = Pq.batchQuantizationError(rot, "id", "rvec", model.cb,
      m = 8, ds = 8)
    assert(Pq.driftViolations(model.errors.last, trainN, bSum, bN, 2.0).isEmpty,
      s"healthy rotated batch flagged: train ${model.errors.last / trainN}, " +
        s"batch ${bSum / bN}")
  }

  test("x94a advantage gate: green with the rotation, FIRES without it") {
    // the learned rotation clears all three clauses on the fixture
    assert(Opq.rotationAdvantage(spark, sfDir, forceIdentity = false).isEmpty)
    // dropping the rotation (R = I at equal budget) must trip the
    // strict distortion clause — the gate's sensitivity contract
    val fired = Opq.rotationAdvantage(spark, sfDir, forceIdentity = true)
    assert(fired.exists(_._1 == "distortion"),
      s"identity rotation did not fire the distortion clause: $fired")
  }
}
