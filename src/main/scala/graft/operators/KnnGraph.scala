package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate kNN-GRAPH construction via NN-Descent (Dong, Moses &
  * Li, WWW'11) — the index family next to IVF/PQ that SemDeDup-style
  * canonicalization (x64) and MMR diversification (x105) consume as
  * their (id, nid, sim) relation, and the standard scalable graph-ANN
  * build (the construction phase under HNSW-class serving).
  *
  * Principle: "a neighbor of a neighbor is likely a neighbor." Seed
  * each node with a cheap pseudo-random candidate set, then iterate:
  * every node's adjacency (out-edges AND in-edges, capped) introduces
  * its members to each other, candidates score exactly, and each node
  * keeps its best k. Converges in a handful of rounds on metric data.
  *
  * Scale shape — bounded per-round joins, never all-pairs: the seed is
  * k hash-bucket self-joins of expected bucket size 2 (≈ k·N candidate
  * rows); each round caps per-node adjacency at 2k by a window
  * (in-degree skew from hub nodes cannot blow the local join up), so
  * the introduction join emits ≤ 4k²·N rows, deduped before exact
  * scoring, and the keep-best-k is the q54 WindowGroupLimit shape.
  * Round state is one (id, nid, sim) relation of k·N rows,
  * checkpointed and released per round (the BPE learner discipline).
  * Everything is deterministic: xxhash64 seeding, 6dp-rounded sims,
  * smaller-nid tie-breaks — the graph is a pure function of the corpus.
  */
object KnnGraph {
  type Q = (SparkSession, String) => DataFrame

  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftExtensions.vecDot(a, b)

  /** Exact cosine of candidate pairs against the normed relation. */
  private def score(cand: DataFrame, v: DataFrame): DataFrame =
    cand
      .join(v.select(col("id"), col("vec").as("va"), col("nrm").as("na")), "id")
      .join(v.select(col("id").as("nid"), col("vec").as("vb"),
        col("nrm").as("nb")), "nid")
      .select(col("id"), col("nid"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("sim"))

  /** Keep each node's best k by (sim desc, nid) — the WindowGroupLimit
    * shape: a map-side k-heap, never a per-node full sort.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("nid"), col("sim"))
  }

  /** Build the graph and return it with the per-round objective
    * trajectory (Σ round(sim·1e6) over the k·N graph, exact integers):
    * each round unions new candidates with the current graph and keeps
    * best-k, so the objective is non-decreasing BY CONSTRUCTION — the
    * gate pins that the implementation actually delivers it.
    */
  def buildWithObjective(corpus: DataFrame, idCol: String, vecCol: String,
                         k: Int, rounds: Int): (DataFrame, Seq[Long]) = {
    require(k >= 1 && rounds >= 0, "k >= 1 and rounds >= 0")
    val v = Similarity.normedVecs(corpus, idCol, vecCol).localCheckpoint(true)
    try {
      val n = v.count()
      val nBuckets = math.max(n / 2, 1L)
      // the graph REFINES at 2k working neighbors and EMITS top-k: a
      // wider working list is the standard NN-Descent move against
      // premature convergence — introductions draw from a richer
      // adjacency, and only the final cut narrows to k
      val kBuild = 2 * k
      // hash pairing round `salt`: node i meets the nodes sharing
      // xxhash64(id, j) % nBuckets for j in [salt·k, salt·k + k) —
      // k 2-expected-size bucket partitions ≈ a random k-regular graph
      // (the expander NN-Descent wants), no global sort or window.
      // Fresh salts per round keep EXPLORING after the introduction
      // step stabilizes (a converged graph re-introduces the same
      // candidates forever — the classic local-optimum stall).
      def hashCand(salt: Int): DataFrame = {
        val withJ = v.select(col("id"),
          explode(sequence(lit(salt * k), lit(salt * k + k - 1))).as("j"))
          .select(col("id"), col("j"),
            pmod(xxhash64(col("id"), col("j")), lit(nBuckets)).as("bk"))
        withJ.as("x").join(withJ.as("y"),
            col("x.j") === col("y.j") && col("x.bk") === col("y.bk") &&
              col("x.id") =!= col("y.id"))
          .select(col("x.id").as("id"), col("y.id").as("nid"))
          .distinct()
      }
      var g = topK(score(hashCand(0), v), kBuild).localCheckpoint(true)
      val objectives = Seq.newBuilder[Long]
      // objective over the EMITTED top-k slice (what the caller gets)
      def objective(graph: DataFrame): Long =
        topK(graph, k)
          .agg(coalesce(sum(round(col("sim") * 1e6).cast("long")), lit(0L)))
          .head().getLong(0)
      objectives += objective(g)
      (1 to rounds).foreach { r =>
        // adjacency = out-edges ∪ in-edges, capped at 2k per node so a
        // hub's in-degree cannot quadratically inflate its local join
        val adj = topK(
          g.unionByName(g.select(col("nid").as("id"), col("id").as("nid"),
            col("sim"))).distinct(),
          kBuild)
        // the introduction step: a pivot's adjacency members meet —
        // plus this round's fresh hash pairings (bounded k·N rows)
        val cand = adj.as("x").join(adj.as("y"),
            col("x.id") === col("y.id") && col("x.nid") =!= col("y.nid"))
          .select(col("x.nid").as("id"), col("y.nid").as("nid"))
          .unionByName(hashCand(r))
          .distinct()
        val prev = g
        g = topK(g.unionByName(score(cand, v)).distinct(), kBuild)
          .localCheckpoint(true)
        graft.CheckpointBlocks.release(prev)
        objectives += objective(g)
      }
      val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
      val out = g.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("id"), col("rank"), col("nid"), col("sim"))
      // the graph frame is already checkpointed; hand it out as-is (the
      // session releases it with the memo, the ScaleCheck probe per run)
      (out, objectives.result())
    } finally graft.CheckpointBlocks.release(v)
  }

  def build(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, rounds: Int): DataFrame =
    buildWithObjective(corpus, idCol, vecCol, k, rounds)._1

  // --- declared family ----------------------------------------------------

  private val K = 5
  private val Rounds = 4

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[Long])]()

  def clearMemo(): Unit = {
    memo.values.forEach { case (df, _) => graft.CheckpointBlocks.release(df) }
    memo.clear()
  }

  /** The declared family's corpus: a LOW-INTRINSIC-DIMENSION manifold
    * embedded in the 64-dim ambient space — vec = W·u + 0.02·noise,
    * where u is a deterministic 4-dim latent per id (xxhash uniforms),
    * W a fixed ±1 sign matrix, and the noise the embeddings column.
    * NN-Descent's premise (a neighbor of a neighbor is a neighbor) is
    * a statement about intrinsic dimensionality: real embedding
    * corpora live on low-dim manifolds, which is exactly why graph-ANN
    * construction works on them — and on ISOTROPIC random vectors (the
    * raw synthetic embeddings, intrinsic dim = ambient 64) no
    * neighbor-of-neighbor method, and no reason to build a kNN graph,
    * exists. The spec pins that contrast explicitly.
    */
  private[graft] def graphCorpus(s: SparkSession, d: String): DataFrame = {
    val latent = (0 until 4).map(m =>
      (pmod(xxhash64(col("vec_id"), lit(m)), lit(1000L)).cast("double") /
        lit(1000.0)).as(s"u$m"))
    ExtensionQueries.rebalanced(graft.Tables(s, d, "embeddings"))
      .select(col("vec_id").as("id") +: col("embedding") +: latent: _*)
      .select(col("id"), transform(col("embedding"), (x, j) =>
        (0 until 4).map(m =>
          when(xxhash64(lit(m), j) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)) *
            col(s"u$m")).reduce(_ + _) + lit(0.02) * x.cast("double"))
        .as("vec"))
  }

  private def built(s: SparkSession, d: String): (DataFrame, Seq[Long]) = {
    val key = (s, d)
    Option(memo.get(key)).getOrElse {
      MemoEviction.register(s, "knng") { () =>
        memo.keySet.removeIf(_._1 eq s)
      }
      val r = buildWithObjective(graphCorpus(s, d), "id", "vec", K, Rounds)
      Option(memo.putIfAbsent(key, r)).getOrElse(r)
    }
  }

  /** The x120g body over an explicit build — the spec hook proving the
    * clauses fire (a rounds=0 seed graph misses exact neighbors; a
    * tampered objective trajectory trips monotonicity).
    */
  private[graft] def gateRows(s: SparkSession, d: String,
                              graph: DataFrame, objectives: Seq[Long],
                              minRecall: Double): DataFrame = {
    import s.implicits._
    val viol = Seq.newBuilder[(String, String)]
    objectives.sliding(2).zipWithIndex.foreach {
      case (Seq(a, b), i) if b < a =>
        viol += ((f"monotone_$i%02d", s"objective fell $a -> $b"))
      case _ =>
    }
    // recall@K against the exhaustive relation (exact integers)
    val e = graphCorpus(s, d)
    val exact = Similarity.bruteForceTopK(e, e, "id", "vec", K)
      .select(col("qid").as("id"), col("nid"))
    val truthN = exact.count()
    val hit = exact.join(graph.select(col("id"), col("nid")),
      Seq("id", "nid"), "left_semi").count()
    if (truthN > 0 && hit * 1000L < math.round(minRecall * 1000) * truthN)
      viol += (("recall",
        s"$hit of $truthN exact neighbors recovered (< $minRecall)"))
    // structure: no self-loops, no duplicate neighbors, <= K per node
    val self = graph.filter(col("id") === col("nid")).count()
    if (self > 0) viol += (("self_loops", s"$self self edges"))
    val dup = graph.groupBy(col("id"), col("nid"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    if (dup > 0) viol += (("dup_edges", s"$dup duplicate edges"))
    val over = graph.groupBy(col("id")).agg(count(lit(1)).as("c"))
      .filter(col("c") > K).count()
    if (over > 0) viol += (("degree", s"$over nodes exceed K=$K"))
    viol.result().toDF("clause", "violation").orderBy(col("clause"))
  }

  val queries: Map[String, Q] = Map(
    // the built graph: k·N rows (id, rank, nid, sim), deterministic by
    // construction. Rows-only (hash-seeded introduction rounds aren't
    // SQL-expressible); the x120g gate below carries the contract.
    "x120_knn_graph" -> ((s, d) =>
      built(s, d)._1.orderBy(col("id"), col("rank"))),

    // Gate (empty-set oracle): per-round objective non-decreasing,
    // recall@K vs the exhaustive kNN relation above the floor, and the
    // graph is structurally sound (no self-loops/dups, degree <= K).
    "x120g_knn_graph_gate" -> ((s, d) => {
      val (graph, objectives) = built(s, d)
      gateRows(s, d, graph, objectives, minRecall = 0.9)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x120g_knn_graph_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin
  )
}
