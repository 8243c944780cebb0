package graft

import org.apache.spark.sql.functions._
import graft.operators.{ExtensionQueries, Similarity}

/** k-means‖ seeding (x98 family): determinism, the structural candidate
  * bound, the monotone cost trace, seed quality vs the hash seed on
  * clustered data, search exactness of the seeded index, and the
  * sensitivity of the x98a advantage gate (forceHash must make it fire).
  */
class KmeansParallelSpec extends SparkSpecBase {
  import spark.implicits._

  /** 8 tight direction-clusters in dim 16: anchor[c][i] = ±1 by hash,
    * point = anchor + small deterministic jitter. nlist=8 gives the
    * hash seed ~0.24% odds of covering all clusters — the shape
    * k-means‖ exists for.
    */
  private lazy val clustered = {
    // splitmix64 finalizer — a linear-in-(c,i) bit pattern repeats with
    // period 4 in c and collapses the 8 anchors to 4
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def anchor(c: Int): Array[Float] =
      Array.tabulate(16)(i => if ((mix(c * 131L + i) & 1L) == 0) 1f else -1f)
    val rows = (0 until 160).map { id =>
      val a = anchor(id % 8)
      (id.toLong, a.map(v => v + ((id / 8) % 5) * 0.01f))
    }
    rows.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  test("kmeansParallelSeed is deterministic: two runs produce identical seeds and traces") {
    val s1 = Similarity.kmeansParallelSeed(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 3, oversample = 4)
    val s2 = Similarity.kmeansParallelSeed(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 3, oversample = 4)
    assert(s1.candidateCounts === s2.candidateCounts)
    assert(s1.costs === s2.costs)
    val c1 = s1.centroids.orderBy("cell").collect().map(r =>
      (r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))
    val c2 = s2.centroids.orderBy("cell").collect().map(r =>
      (r.getInt(0), r.getSeq[Double](1), r.getDouble(2)))
    assert(c1 === c2)
  }

  test("cost trace is non-increasing and every draw respects the structural cap") {
    val s = Similarity.kmeansParallelSeed(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 4, oversample = 4)
    s.costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9 * math.max(1.0, a.abs), s"psi rose $a -> $b in ${s.costs}")
    }
    s.candidateCounts.foreach(n => assert(n <= Similarity.KppRoundCap.toLong * 4, s"draw $n exceeds cap"))
    assert(s.centroids.count() === 8)
  }

  test("k-means|| seed objective strictly beats the hash seed on clustered data") {
    val hashObj = Similarity.ivfBuildRefined(clustered, "vec_id", "embedding",
      nlist = 8, iters = 0).objectives.head
    val kpp = Similarity.ivfBuildKpp(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 3, oversample = 8, iters = 0)
    val kppObj = kpp.refined.objectives.head
    assert(kppObj > hashObj * 1.05,
      f"kpp seed objective $kppObj%.3f must beat hash $hashObj%.3f decisively")
  }

  test("Lloyd refinement over the k-means|| seed keeps the monotone objective contract") {
    val kpp = Similarity.ivfBuildKpp(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 3, oversample = 4, iters = 3)
    assert(kpp.refined.objectives.size === 4)
    kpp.refined.objectives.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9 * math.max(1.0, a.abs), s"objective fell $a -> $b")
    }
  }

  test("kpp-seeded index stays exact: full-probe search equals brute force") {
    val q = clustered.filter($"vec_id" < 3)
    val kpp = Similarity.ivfBuildKpp(clustered, "vec_id", "embedding",
      nlist = 4, rounds = 2, oversample = 4, iters = 2)
    val brute = Similarity.bruteForceTopK(q, clustered, "vec_id", "embedding", k = 3)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = Similarity.ivfSearch(kpp.refined.index, q, "vec_id", "embedding",
        k = 3, nprobe = 4)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full === brute)
  }

  test("pad path: rounds=0 still seeds exactly nlist cells; a tiny corpus seeds its size") {
    val s0 = Similarity.kmeansParallelSeed(clustered, "vec_id", "embedding",
      nlist = 8, rounds = 0, oversample = 4)
    assert(s0.centroids.count() === 8)
    val tiny = clustered.filter($"vec_id" < 3)
    val st = Similarity.kmeansParallelSeed(tiny, "vec_id", "embedding",
      nlist = 8, rounds = 2, oversample = 4)
    assert(st.centroids.count() === 3)
    val empty = clustered.filter($"vec_id" < 0)
    val se = Similarity.kmeansParallelSeed(empty, "vec_id", "embedding",
      nlist = 8, rounds = 2, oversample = 4)
    assert(se.centroids.count() === 0)
    assert(se.costs.isEmpty && se.candidateCounts.isEmpty)
  }

  test("x98a advantage gate FIRES when the smarter seeding is dropped (forceHash)") {
    assert(ExtensionQueries.seedAdvantage(spark, sfDir, forceHash = false).isEmpty,
      "the gate must be green with the real k-means|| seed")
    val fired = ExtensionQueries.seedAdvantage(spark, sfDir, forceHash = true)
    assert(fired.nonEmpty && fired.head._1 === "seed_objective",
      "the gate must fire when the seed is swapped for the hash sample")
  }
}
