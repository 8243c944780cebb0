package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Similarity search over embedding columns (array<float>).
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH
  * (random-hyperplane) bucketed variant is the 100 TB scale path — each
  * vector lands in one bucket per table, and only bucket collisions are
  * scored, turning the O(N*Q) cross join into a per-bucket join.
  */
object Similarity {

  /** Pairwise cosine >= threshold between all vectors (a < b). Used for
    * embedding near-dup detection. Cross-join based — intended for
    * bounded candidate sets; at scale gate it behind [[lshBuckets]].
    */
  def cosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val v = vecs.select(col(idCol).as("id"), col(vecCol).as("vec"))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(cosineSim(col("x.vec"), col("y.vec")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Brute-force cosine top-k neighbors for each query vector.
    * Deterministic: ties broken by neighbor id after rounding.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineSim(col("qvec"), col("nvec")), 6).as("sim"))
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
    v.withColumn("bucket", bucketBits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** ANN top-k via LSH buckets: score only same-bucket candidates.
    * Approximate — recall measured against [[bruteForceTopK]] in the spec
    * suite. `nbits` tunes bucket granularity (recall vs cost).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, nbits: Int): DataFrame = {
    val qb = lshBuckets(queries, idCol, vecCol, nbits)
      .select(col("id").as("qid"), col("vec").as("qvec"), col("bucket"))
    val cb = lshBuckets(corpus, idCol, vecCol, nbits)
      .select(col("id").as("nid"), col("vec").as("nvec"), col("bucket"))
    val scored = qb.join(cb, Seq("bucket"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(cosineSim(col("qvec"), col("nvec")), 6).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }
}
