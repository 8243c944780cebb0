package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, Pq}

/** IVF-PQ invariants: index completeness, exact-cover residual
  * encoding (zero self-ADC when the fine codebook can represent every
  * residual), nprobe=nlist degenerating to a full scan, and duplicate
  * recall through the composed index.
  */
class IvfPqSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "embedding")

  private val rnd = new scala.util.Random(42)
  private def corpus(n: Int, dim: Int) =
    vecs((0L until n.toLong).map(i => (i, Seq.fill(dim)(rnd.nextDouble()))))

  test("index is complete: one cell per vector, M codes per vector") {
    val c = corpus(24, 8)
    val idx = IvfPq.build(c, "id", "embedding", nlist = 4, m = 4, ks = 4,
      iters = 1)
    assert(idx.cells.count() === 24)
    assert(idx.codes.count() === 24 * 4)
    assert(idx.coarse.count() === 4)
    // every cell id the assignments use exists in the coarse table
    assert(idx.cells.join(idx.coarse, Seq("cell"), "left_anti").count() === 0)
  }

  test("ks >= N: residuals quantize exactly, self-query ADC is 0 at rank 1") {
    val c = corpus(6, 8)
    val idx = IvfPq.build(c, "id", "embedding", nlist = 2, m = 4, ks = 6,
      iters = 1)
    assert(idx.fineErrors.forall(_ < 1e-12), s"residual errors ${idx.fineErrors}")
    val top = IvfPq.search(c, idx, "id", "embedding", m = 4, ds = 2,
      k = 1, nprobe = 1).as[(Long, Long, Int, Double)].collect().toSeq
    assert(top.sortBy(_._1) === (0L until 6L).map(i => (i, i, 1, 0.0)))
  }

  test("nprobe = nlist scans every cell: top-N covers the whole corpus") {
    val c = corpus(20, 8)
    val idx = IvfPq.build(c, "id", "embedding", nlist = 4, m = 4, ks = 4,
      iters = 1)
    val top = IvfPq.search(c.filter(col("id") === 0), idx, "id", "embedding",
      m = 4, ds = 2, k = 100, nprobe = 4)
    assert(top.select("nid").distinct().count() === 20)
  }

  test("fewer probes never surface a candidate outside the probed cells") {
    val c = corpus(30, 8)
    val idx = IvfPq.build(c, "id", "embedding", nlist = 5, m = 4, ks = 4,
      iters = 1)
    val one = IvfPq.search(c.filter(col("id") === 3), idx, "id", "embedding",
      m = 4, ds = 2, k = 100, nprobe = 1)
    // all results of a 1-probe search share a single cell
    val cellsHit = one.join(idx.cells, one("nid") === idx.cells("id"))
      .select("cell").distinct().count()
    assert(cellsHit === 1)
  }

  test("an exact duplicate is recalled through cell + codes identity") {
    val base = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextDouble())))
    val c = vecs(base :+ (500L, base(7)._2)) // dup of id 7
    val idx = IvfPq.build(c, "id", "embedding", nlist = 4, m = 4, ks = 8,
      iters = 2)
    val top = IvfPq.search(c.filter(col("id") === 7), idx, "id", "embedding",
      m = 4, ds = 2, k = 2, nprobe = 1).as[(Long, Long, Int, Double)]
      .collect().toSeq
    assert(top.map(_._2).toSet === Set(7L, 500L))
    assert(top.map(_._4).distinct.size === 1)
  }

  test("x82 gates are empty on the testdata corpus") {
    assert(IvfPq.queries("x82g_ivfpq_train_gate")(spark, sfDir).count() === 0)
    assert(IvfPq.queries("x82r_ivfpq_dup_recall")(spark, sfDir).count() === 0)
  }

  test("x129 shortlist curve: one row per width, recall/cost monotone, gate empty") {
    val curve = IvfPq.queries("x129_rerank_shortlist_curve")(spark, sfDir)
      .orderBy("shortlist_k").collect()
    assert(curve.map(_.getInt(0)).toSeq === Seq(2, 5, 10, 20, 50, 200))
    val recalls = curve.map(_.getLong(3)).toSeq
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a },
      s"recall not monotone in shortlist: $recalls")
    // the widest shortlist recovers nearly all probe-reachable truth
    val (hits50, ceiling) = (curve.last.getLong(1), curve.last.getLong(5))
    assert(hits50 * 1000L >= 900L * ceiling,
      s"widest shortlist $hits50 of ceiling $ceiling")
    // a narrow shortlist pays less exact scoring — the dial prices real
    assert(curve.head.getLong(4) < curve.last.getLong(4))
    // k' = 2 < K = 10 cannot reach full recall: the curve's left end
    // must actually show the trade (not a flat line)
    assert(recalls.head < recalls.last,
      s"curve is flat: $recalls — the dial prices nothing")
    assert(IvfPq.queries("x129g_shortlist_curve_gate")(spark, sfDir)
      .count() === 0)
  }

  test("x129g clauses fire on tampered curves") {
    val falling = Seq((2, 9L, 10L, 900L, 20L, 9L), (5, 8L, 10L, 800L, 10L, 9L))
    val viol = IvfPq.curveGateRows(spark, falling, minOfCeilingPm = 0L)
      .collect().map(_.getString(0))
    assert(viol.exists(_.startsWith("recall_k")), viol.toSeq)
    assert(viol.exists(_.startsWith("cost_k")), viol.toSeq)
    val weak = Seq((2, 5L, 10L, 500L, 20L, 9L))
    val fl = IvfPq.curveGateRows(spark, weak, minOfCeilingPm = 900L)
      .collect().map(_.getString(0))
    assert(fl.contains("floor"), fl.toSeq)
    val over = Seq((2, 12L, 10L, 1200L, 20L, 12L))
    val ov = IvfPq.curveGateRows(spark, over, minOfCeilingPm = 0L)
      .collect().map(_.getString(0))
    assert(ov.exists(_.startsWith("hits_k")), ov.toSeq)
  }
}
