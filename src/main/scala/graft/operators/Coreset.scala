package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftExtensions

/** Greedy k-center coreset selection (farthest-point traversal,
  * Gonzalez 1985) over an embedding column — diverse-subset selection
  * for training data: pick k exemplars such that every corpus vector is
  * close to some exemplar, the classic 2-approximation to the optimal
  * k-center cover. The dual of dedup: dedup removes what is too close,
  * k-center KEEPS a spread that covers everything.
  *
  * Distances are spherical (2 − 2·cos on unit vectors — squared
  * Euclidean on the sphere, the [[Similarity]] k-means‖ convention).
  *
  * Scale shape (the k-means‖ pattern): the selected centers live on the
  * DRIVER (k vectors — bounded parameter-server state) and enter the
  * plan as literals, so each of the k rounds is ONE corpus scan — a
  * codegen'd VecDot min-distance update plus a max_by argmax
  * aggregation; no join, no shuffle, superseded per-round checkpoints
  * released as soon as their successor materializes. k scans of the
  * corpus total — the honest farthest-point cost; for k beyond a few
  * hundred, seed with [[Similarity.kmeansParallelSeed]] (multi-point
  * rounds) instead.
  *
  * Everything is deterministic: the first center is the hash-min corpus
  * row and every argmax breaks distance ties toward the smaller id.
  *
  * Guaranteed contracts (gated empty-set in x102g):
  *   - the selection-distance trace r_0 ≥ r_1 ≥ … is non-increasing
  *     (adding a center can only lower every point's distance);
  *   - min pairwise center distance ≥ the final coverage radius (the
  *     Gonzalez certificate: center c_j was selected at distance
  *     r_{j-1} ≥ r_final from all earlier centers — this inequality
  *     failing means the greedy invariant broke);
  *   - every center is a corpus member (data-side semi-join check).
  *
  * Reference analog: none — no vector surface in the reference; SURVEY
  * §7.4 extension mandate (diversity sampling for training-data
  * curation).
  */
object Coreset {
  type Q = (SparkSession, String) => DataFrame

  /** Selected centers in selection order with their selection distance
    * (center i's spherical distance to centers 0..i−1; the first is
    * +∞ by convention, recorded as the trace's sentinel head), the
    * selection-distance trace, and the final coverage radius
    * max_x d(x, centers).
    */
  final case class KCenterResult(centers: IndexedSeq[(Long, IndexedSeq[Double])],
                                 trace: IndexedSeq[Double],
                                 radius: Double)

  private def dot = GraftExtensions.vecDot _

  /** Greedy k-center over `corpus(idCol, vecCol)`. Requires a numeric
    * id (ties break toward the smaller id) and k ≥ 1.
    */
  def kCenterSelect(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): KCenterResult = {
    require(k >= 1, "k must be >= 1")
    GraftExtensions.register(corpus.sparkSession)
    val base = corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .filter(col("nrm") > 0)
      .select(col("id"), transform(col("v"), x => x / col("nrm")).as("uvec"))
    val first = base.orderBy(xxhash64(col("id")), col("id")).limit(1).collect()
    if (first.isEmpty)
      return KCenterResult(IndexedSeq.empty, IndexedSeq.empty, 0.0)

    val centers = scala.collection.mutable.ArrayBuffer[(Long, IndexedSeq[Double])](
      (first(0).getLong(0), first(0).getSeq[Double](1).toIndexedSeq))
    val trace = scala.collection.mutable.ArrayBuffer[Double]()

    def withD2(state: DataFrame, c: IndexedSeq[Double]): DataFrame =
      state.withColumn("d2",
        least(col("d2"), lit(2.0) - lit(2.0) * dot(col("uvec"), typedlit(c))))

    var state = withD2(base.withColumn("d2", lit(java.lang.Double.MAX_VALUE)),
      centers.head._2).localCheckpoint(true)
    try {
      while (centers.length < k) {
        // argmax d2, ties to the smaller id — one aggregation
        val far = state.agg(
          max_by(struct(col("id"), col("uvec")), struct(col("d2"), -col("id"))).as("c"),
          max(col("d2")).as("r")).head()
        val r = far.getDouble(1)
        trace += r
        if (r <= 0) return KCenterResult(centers.toIndexedSeq, trace.toIndexedSeq, 0.0)
        val c = far.getStruct(0)
        centers += ((c.getLong(0), c.getSeq[Double](1).toIndexedSeq))
        val next = withD2(state, centers.last._2).localCheckpoint(true)
        graft.CheckpointBlocks.release(state)
        state = next
      }
      val radius = state.agg(max(col("d2"))).head().getDouble(0)
      KCenterResult(centers.toIndexedSeq, trace.toIndexedSeq, radius)
    } finally graft.CheckpointBlocks.release(state)
  }

  /** Spherical distance between two unit vectors on the driver. */
  private def sphD2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
    2.0 - 2.0 * graft.functions.Num.dot(a, b)

  /** The x102g measurement as violation rows (empty = contracts hold).
    * `skewTrace` corrupts the recorded trace and `dropCenter` replaces
    * the last center with a copy of the first — the spec hooks proving
    * each clause FIRES when its invariant breaks.
    */
  private[graft] def gateViolations(s: SparkSession, d: String,
                                    skewTrace: Boolean = false,
                                    dropCenter: Boolean = false): Seq[(String, String)] = {
    val e = ExtensionQueries.rebalanced(Tables(s, d, "embeddings"))
    val r0 = kCenterSelect(e, "vec_id", "embedding", K)
    val r =
      if (dropCenter && r0.centers.length >= 2)
        r0.copy(centers = r0.centers.init :+ r0.centers.head)
      else if (skewTrace && r0.trace.length >= 2)
        r0.copy(trace = r0.trace.reverse)
      else r0
    val viol = Seq.newBuilder[(String, String)]
    r.trace.sliding(2).zipWithIndex.foreach {
      case (Seq(a, b), i) if b > a + 1e-9 * math.max(1.0, a.abs) =>
        viol += ((f"trace_$i%02d", s"selection distance rose $a -> $b"))
      case _ =>
    }
    val minPair = (for {
      i <- r.centers.indices
      j <- r.centers.indices if j > i
    } yield sphD2(r.centers(i)._2, r.centers(j)._2))
      .foldLeft(Double.MaxValue)(math.min)
    if (r.centers.length >= 2 && minPair < r.radius - 1e-9)
      viol += (("gonzalez",
        f"min pairwise center distance $minPair%.9f < coverage radius ${r.radius}%.9f"))
    // data-side: every center id must be a corpus member
    val ids = r.centers.map(_._1)
    val present = e.select(col("vec_id").cast("long").as("id"))
      .filter(col("id").isInCollection(ids))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    ids.filterNot(present).foreach(id =>
      viol += (("membership", s"center $id not in corpus")))
    viol.result()
  }

  private val K = 12

  val queries: Map[String, Q] = Map(
    // the selected diverse exemplars in selection order (rows-only:
    // k sequential argmax rounds are not expressible in DuckDB SQL) —
    // verified by the x102g contracts
    "x102_kcenter_select" -> ((s, d) => {
      import s.implicits._
      val r = kCenterSelect(
        ExtensionQueries.rebalanced(Tables(s, d, "embeddings")),
        "vec_id", "embedding", K)
      // selection distance of center i is trace(i-1); the first has none
      r.centers.zipWithIndex.map { case ((id, _), i) =>
        (i + 1, id,
          if (i == 0) None
          else Some(math.rint(r.trace(i - 1) * 1e9) / 1e9))
      }.toDF("rank", "id", "sel_dist").orderBy(col("rank"))
    }),

    // Gate (empty-set oracle): the non-increasing selection-distance
    // trace, the Gonzalez pairwise>=radius certificate, and corpus
    // membership of every center.
    "x102g_kcenter_gate" -> ((s, d) => {
      import s.implicits._
      gateViolations(s, d).toDF("clause", "violation").orderBy(col("clause"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x102g_kcenter_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin
  )
}
