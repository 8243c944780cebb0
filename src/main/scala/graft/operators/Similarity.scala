package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions

/** Similarity search over embedding columns (array<float>).
  *
  * All scoring goes through the native codegen'd [[graft.functions.VecDot]]
  * expression (a tight primitive loop inside whole-stage codegen — the
  * HOF zip_with/aggregate formulation measured ~50x slower at pairwise
  * scale). Norms are computed once per vector (O(N)) and reused across
  * all O(N^2)/bucketed comparisons.
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH
  * (random-hyperplane) bucketed variant is the 100 TB scale path — each
  * vector lands in one bucket, and only bucket collisions are scored,
  * turning the O(N*Q) cross join into a per-bucket join.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = GraftExtensions.vecDot(a, b)

  /** (id, vec, nrm) projection with the L2 norm precomputed once. */
  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftExtensions.register(vecs.sparkSession)
    vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", sqrt(dot(col("vec"), col("vec"))))
  }

  /** Pairwise cosine >= threshold between all vectors (a < b). Used for
    * embedding near-dup detection. Cross-join based — intended for
    * bounded candidate sets; at scale gate it behind [[lshBuckets]].
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = withNorm(vecs, idCol, vecCol)
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * Deterministic: ties broken by neighbor id after rounding.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("nrm").as("qnrm"))
    val c = withNorm(corpus, idCol, vecCol)
      .select(col("id").as("nid"), col("vec").as("nvec"), col("nrm").as("nnrm"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Random-hyperplane LSH bucket id (nbits-bit signature) per vector.
    * Hyperplane h[p][d] is a deterministic pseudo-random +-1 derived from
    * xxhash64(p, d) — no RNG state, fully reproducible across runs/nodes.
    */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
                 nbits: Int): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val bucketBits = (0 until nbits).map { p =>
      // dot(vec, h_p) where h_p[d] = +1 if xxhash64(p, d) even else -1
      val dotp = aggregate(
        zip_with(col("vec"), sequence(lit(0), size(col("vec")) - 1),
          (x, d) => x.cast("double") *
            when(xxhash64(lit(p), d) % 2 === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dotp > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    // foldLeft, not reduce: nbits=0 (single bucket = exhaustive search)
    // is a valid configuration and must not throw on the empty list
    v.withColumn("bucket", bucketBits.foldLeft(lit(0L))((a, b) => a.bitwiseOR(b)))
  }

  /** ANN top-k via LSH buckets: score only same-bucket candidates.
    * Approximate — structural properties verified in the spec suite.
    * `nbits` tunes bucket granularity (recall vs cost).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, nbits: Int): DataFrame = {
    GraftExtensions.register(queries.sparkSession)
    val qb = lshBuckets(queries, idCol, vecCol, nbits)
      .withColumn("qnrm", sqrt(dot(col("vec"), col("vec"))))
      .select(col("id").as("qid"), col("vec").as("qvec"), col("qnrm"), col("bucket"))
    val cb = lshBuckets(corpus, idCol, vecCol, nbits)
      .withColumn("nnrm", sqrt(dot(col("vec"), col("vec"))))
      .select(col("id").as("nid"), col("vec").as("nvec"), col("nnrm"), col("bucket"))
    val scored = qb.join(cb, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }
}
