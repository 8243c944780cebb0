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
}
