package graft

import org.apache.spark.sql.functions._
import graft.operators.Coreset

/** Greedy k-center selection (x102 family): exact behavior on a planted
  * cluster fixture, determinism, the Gonzalez certificate on real data,
  * and per-clause gate sensitivity via the corruption hooks.
  */
class CoresetSpec extends SparkSpecBase {
  import spark.implicits._

  /** 4 orthogonal direction-clusters in dim 8 (axes e0..e3), 20 points
    * each with tiny within-cluster jitter: farthest-point traversal
    * from ANY start must visit all 4 clusters before re-entering one.
    */
  private lazy val clustered = {
    val rows = (0L until 80L).map { id =>
      val c = (id % 4).toInt
      val v = Array.tabulate(8)(i =>
        (if (i == c) 1.0f else 0.0f) + (if (i == (c + 4)) 0.001f * (id / 4 % 5) else 0.0f))
      (id, v)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  test("selection visits every planted cluster before revisiting any") {
    val r = Coreset.kCenterSelect(clustered, "vec_id", "embedding", 4)
    assert(r.centers.length === 4)
    assert(r.centers.map(_._1 % 4).toSet.size === 4,
      s"4 centers must cover 4 clusters: ${r.centers.map(_._1)}")
    // orthogonal clusters: each selection distance is ~2 (cos ~ 0)
    r.trace.foreach(t => assert(t > 1.9, s"cross-cluster distance ~2, got $t"))
    // after all 4 clusters covered the radius is the within-cluster spread
    assert(r.radius < 0.01, s"covered radius must be tiny, got ${r.radius}")
  }

  test("selection is deterministic") {
    val r1 = Coreset.kCenterSelect(clustered, "vec_id", "embedding", 6)
    val r2 = Coreset.kCenterSelect(clustered, "vec_id", "embedding", 6)
    assert(r1.centers === r2.centers)
    assert(r1.trace === r2.trace)
    assert(r1.radius === r2.radius)
  }

  test("trace is non-increasing and the Gonzalez certificate holds on real embeddings") {
    val r = Coreset.kCenterSelect(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding", 12)
    r.trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"selection distance rose $a -> $b")
    }
    assert(SparkEntry.queries("x102g_kcenter_gate")(spark, sfDir).count() === 0)
    val sel = SparkEntry.queries("x102_kcenter_select")(spark, sfDir)
    assert(sel.count() === 12)
    assert(sel.filter(col("rank") === 1 && col("sel_dist").isNotNull).count() === 0)
  }

  test("gate clauses FIRE under the corruption hooks") {
    val t = Coreset.gateViolations(spark, sfDir, skewTrace = true)
    assert(t.exists(_._1.startsWith("trace_")), s"reversed trace must fire: $t")
    val g = Coreset.gateViolations(spark, sfDir, dropCenter = true)
    assert(g.exists(_._1 == "gonzalez"), s"duplicated center must fire: $g")
  }

  test("edge cases: k = 1, empty corpus, k beyond distinct directions") {
    val r1 = Coreset.kCenterSelect(clustered, "vec_id", "embedding", 1)
    assert(r1.centers.length === 1 && r1.trace.isEmpty)
    val re = Coreset.kCenterSelect(clustered.filter($"vec_id" < 0),
      "vec_id", "embedding", 3)
    assert(re.centers.isEmpty && re.radius === 0.0)
    // 3 identical vectors, k = 3: selection stops growing at distance 0
    val dup = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)), (3L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val rd = Coreset.kCenterSelect(dup, "vec_id", "embedding", 3)
    assert(rd.radius === 0.0, s"identical corpus has radius 0, got ${rd.radius}")
  }
}
