package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA (x99 family): fit determinism, the four x99g contracts on a
  * known-spectrum fixture, projection/reconstruction round trips,
  * optimality vs a random basis, and the sensitivity of the x99a
  * advantage gate (forceRandom must make it fire).
  */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  /** An anisotropic 3-component fixture in dim 8: x = a·u·s1 + b·v·s2 +
    * c·w·s3 + mean, with orthogonal u ⟂ v ⟂ w and decaying scales — the
    * top-3 PCA directions and eigenvalues are known analytically up to
    * the sample noise of the deterministic hash draws.
    */
  private lazy val aniso = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // unit signal in [-1, 1] from the hash
    def u(id: Long, c: Int): Double =
      ((mix(id * 131L + c) & 0xFFFFFL).toDouble / 0xFFFFF - 0.5) * 2.0
    val rows = (0L until 400L).map { id =>
      val (a, b, c) = (u(id, 1), u(id, 2), u(id, 3))
      val x = Array.tabulate(8) { i =>
        val e1 = if (i == 0) 1.0 else 0.0 // u = e0
        val e2 = if (i == 1) 1.0 else 0.0 // v = e1
        val e3 = if (i == 2) 1.0 else 0.0 // w = e2
        (4.0 * a * e1 + 2.0 * b * e2 + 0.5 * c * e3 + 3.0).toFloat
      }
      (id, x)
    }
    rows.toDF("vec_id", "embedding").localCheckpoint(true)
  }

  test("fit is deterministic and recovers the planted anisotropic directions") {
    val m1 = Pca.fit(aniso, "embedding", 3)
    val m2 = Pca.fit(aniso, "embedding", 3)
    assert(m1.basis === m2.basis)
    assert(m1.eigs === m2.eigs)
    // top direction must align with e0 (scale 4), second with e1 (scale 2)
    assert(math.abs(m1.basis(0)(0)) > 0.999, s"pc0 = ${m1.basis(0)}")
    assert(math.abs(m1.basis(1)(1)) > 0.999, s"pc1 = ${m1.basis(1)}")
    assert(math.abs(m1.basis(2)(2)) > 0.999, s"pc2 = ${m1.basis(2)}")
    // sign canonicalization: the pivot coordinate is positive
    assert(m1.basis(0)(0) > 0 && m1.basis(1)(1) > 0 && m1.basis(2)(2) > 0)
    // spectrum ordering follows the planted scales 16 > 4 > 0.25 (x Var(u))
    assert(m1.eigs(0) > m1.eigs(1) && m1.eigs(1) > m1.eigs(2))
    assert(m1.eigs(3) < 1e-9, s"dim 3+ carries no variance: ${m1.eigs}")
    assert(m1.orthoErr < 1e-10)
  }

  test("k = dim reconstructs exactly; rank-3 reconstruction drops only the planted tail") {
    graft.functions.GraftExtensions.register(spark)
    val full = Pca.fit(aniso, "embedding", 8)
    val vec = col("embedding").cast("array<double>")
    val maxErr = aniso
      .select(aggregate(zip_with(vec,
          Pca.reconstruct(full, Pca.project(full, vec)),
          (a, b) => abs(a - b)), lit(0.0),
        (acc, x) => greatest(acc, x)).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(maxErr < 1e-9, s"full-rank PCA must be lossless, max err $maxErr")
    val m3 = Pca.fit(aniso, "embedding", 3)
    assert(m3.residualEnergy < 1e-9,
      s"3 planted components: rank-3 residual must vanish, got ${m3.residualEnergy}")
  }

  test("x99g gate is green on the real embeddings table and x99 emits k coords per vector") {
    assert(SparkEntry.queries("x99g_pca_gate")(spark, sfDir).count() === 0)
    val proj = SparkEntry.queries("x99_pca_project")(spark, sfDir)
    val n = Tables(spark, sfDir, "embeddings").count()
    assert(proj.count() === n * 8)
    assert(proj.select("pc").distinct().count() === 8)
  }

  test("x99a advantage gate: green with PCA, FIRES under forceRandom") {
    assert(operators.Pca.pcaAdvantage(spark, sfDir, forceRandom = false).isEmpty,
      "the gate must be green with the learned basis")
    val fired = operators.Pca.pcaAdvantage(spark, sfDir, forceRandom = true)
    assert(fired.nonEmpty && fired.head._1 === "recon_error",
      "the gate must fire when the basis is swapped for a hash-sign one")
  }

  test("x99r recall gate is green") {
    assert(SparkEntry.queries("x99r_pca_recall")(spark, sfDir).count() === 0)
  }

  test("hashBasis is orthonormal") {
    val b = Pca.hashBasis(16, 6, salt = 1L)
    assert(b.length === 6)
    b.indices.foreach { i =>
      b.indices.foreach { j =>
        val d = b(i).iterator.zip(b(j).iterator).map { case (x, y) => x * y }.sum
        assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9)
      }
    }
  }
}
