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

  // --- graph-ANN search (x122): the serving half -------------------------

  /** Greedy beam search over a built kNN graph — the HNSW-class serving
    * pattern on the flat graph: start from a fixed hash-chosen entry
    * set, repeatedly expand the current beam's out-neighbors, score
    * candidates exactly, keep the best `beam` per query, fixed `hops`.
    * Returns the top-k slice plus the per-hop beam-objective trajectory
    * (Σ round(sim·1e6) over each query's top-k — monotone by
    * construction: each hop unions candidates into the beam).
    *
    * NAVIGABILITY: a pure kNN graph has only LOCAL edges, so a greedy
    * walk from a cold entry needs O(N^(1/d)) hops to cross the manifold
    * — the exact failure HNSW's upper layers exist to fix. The search
    * therefore walks the kNN edges UNION the deterministic hash-pairing
    * edges the build seeded with (salt 0): those are a uniform random
    * ~k-regular EXPANDER — diameter O(log N) — so the beam reaches any
    * region of the corpus in logarithmically many hops and the kNN
    * edges then descend locally. Same two-layer idea as NSW's long
    * early-insert links, with the long layer free (it is a pure hash
    * function of the ids — nothing extra is stored).
    *
    * Scale shape: the entry set is `entries` rows (driver-bounded, the
    * HNSW entry-point idea); each hop joins the Q·beam frontier against
    * the ~2k-regular adjacency (≤ 2·Q·beam·k candidate rows, deduped
    * before exact scoring) and re-caps by a WindowGroupLimit — the
    * corpus is probed by id-keyed joins only, never scanned per query.
    * Queries never shuffle the graph; the graph never shuffles the
    * corpus.
    */
  def searchWithObjective(graph: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, queries: DataFrame,
                          k: Int, beam: Int, hops: Int,
                          entries: Int = 4): (DataFrame, Seq[Long]) = {
    require(k >= 1 && beam >= k && hops >= 0 && entries >= 1,
      "k >= 1, beam >= k, hops >= 0, entries >= 1")
    val v = Similarity.normedVecs(corpus, idCol, vecCol).localCheckpoint(true)
    val q = Similarity.normedVecs(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("nrm").as("qnrm"))
      .localCheckpoint(true)
    try {
      // exact score of (qid, nid) pairs; self-matches excluded (the
      // x06/x16 family convention — a query that IS a corpus member
      // must retrieve neighbors, not itself)
      def scoreQ(pairs: DataFrame): DataFrame = pairs
        .filter(col("qid") =!= col("nid"))
        .join(v.select(col("id").as("nid"), col("vec").as("nvec"),
          col("nrm").as("nnrm")), "nid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("nid"),
          round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6)
            .as("sim"))
      def beamCap(scored: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("nid"))
        scored.withColumn("r", row_number().over(w))
          .filter(col("r") <= beam).select(col("qid"), col("nid"), col("sim"))
      }
      // fixed entry set: the `entries` smallest-hash corpus nodes (a
      // per-partition heap + driver merge, never a global sort)
      val entry = v.select(col("id").as("nid"), xxhash64(col("id")).as("h"))
        .orderBy(col("h")).limit(entries).select(col("nid"))
      // two-layer adjacency: the kNN edges (local descent) + the
      // salt-0 hash-pairing expander (long-range navigation) — the
      // latter re-derives from ids alone, identical to the build seed
      val n = v.count()
      val nBuckets = math.max(n / 2, 1L)
      val withJ = v.select(col("id"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
        .select(col("id"), col("j"),
          pmod(xxhash64(col("id"), col("j")), lit(nBuckets)).as("bk"))
      val longEdges = withJ.as("x").join(withJ.as("y"),
          col("x.j") === col("y.j") && col("x.bk") === col("y.bk") &&
            col("x.id") =!= col("y.id"))
        .select(col("x.id").as("nid"), col("y.id").as("next"))
      val adjacency = graph.select(col("id").as("nid"), col("nid").as("next"))
        .unionByName(longEdges).distinct().localCheckpoint(true)
      try {
      var frontier = beamCap(scoreQ(
        q.select(col("qid")).crossJoin(broadcast(entry))))
        .localCheckpoint(true)
      val objectives = Seq.newBuilder[Long]
      def objective(f: DataFrame): Long = {
        val w = Window.partitionBy(col("qid"))
          .orderBy(col("sim").desc, col("nid"))
        f.withColumn("r", row_number().over(w)).filter(col("r") <= k)
          .agg(coalesce(sum(round(col("sim") * 1e6).cast("long")), lit(0L)))
          .head().getLong(0)
      }
      objectives += objective(frontier)
      (1 to hops).foreach { _ =>
        val cand = frontier.select(col("qid"), col("nid"))
          .join(adjacency, Seq("nid"))
          .select(col("qid"), col("next").as("nid"))
          .distinct()
        val prev = frontier
        frontier = beamCap(frontier.unionByName(scoreQ(cand)).distinct())
          .localCheckpoint(true)
        graft.CheckpointBlocks.release(prev)
        objectives += objective(frontier)
      }
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      val out = frontier.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("nid"), col("sim"))
      (out, objectives.result())
      } finally graft.CheckpointBlocks.release(adjacency)
    } finally {
      graft.CheckpointBlocks.release(q)
      graft.CheckpointBlocks.release(v)
    }
  }

  def search(graph: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, queries: DataFrame, k: Int, beam: Int,
             hops: Int): DataFrame =
    searchWithObjective(graph, corpus, idCol, vecCol, queries,
      k, beam, hops)._1

  // --- declared family ----------------------------------------------------

  private val K = 5
  private val Rounds = 4

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[Long])]()

  def clearMemo(): Unit = {
    memo.values.forEach { case (df, _) => graft.CheckpointBlocks.release(df) }
    memo.clear()
    searchMemo.values.forEach { case (df, _) =>
      graft.CheckpointBlocks.release(df) }
    searchMemo.clear()
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

  private val Beam = 16
  private val Hops = 8

  private val searchMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[Long])]()

  private def searched(s: SparkSession, d: String): (DataFrame, Seq[Long]) = {
    val key = (s, d)
    Option(searchMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngs") { () =>
        searchMemo.keySet.removeIf(_._1 eq s)
      }
      val corpus = graphCorpus(s, d)
      val r = searchWithObjective(built(s, d)._1, corpus, "id", "vec",
        corpus.filter(col("id") < 10), K, Beam, Hops)
      Option(searchMemo.putIfAbsent(key, r)).getOrElse(r)
    }
  }

  /** The x122g body over an explicit search — the spec hook proving
    * the clauses fire (a hops=0 entry-set beam misses exact neighbors;
    * a tampered trajectory trips monotonicity).
    */
  private[graft] def searchGateRows(s: SparkSession, d: String,
                                    result: DataFrame, objectives: Seq[Long],
                                    minRecall: Double): DataFrame = {
    import s.implicits._
    val viol = Seq.newBuilder[(String, String)]
    objectives.sliding(2).zipWithIndex.foreach {
      case (Seq(a, b), i) if b < a =>
        viol += ((f"monotone_$i%02d", s"beam objective fell $a -> $b"))
      case _ =>
    }
    val e = graphCorpus(s, d)
    val exact = Similarity.bruteForceTopK(
        e.filter(col("id") < 10), e, "id", "vec", K)
      .select(col("qid"), col("nid"))
    val truthN = exact.count()
    val hit = exact.join(result.select(col("qid"), col("nid")),
      Seq("qid", "nid"), "left_semi").count()
    if (truthN > 0 && hit * 1000L < math.round(minRecall * 1000) * truthN)
      viol += (("recall",
        s"$hit of $truthN exact neighbors served (< $minRecall)"))
    val self = result.filter(col("qid") === col("nid")).count()
    if (self > 0) viol += (("self_matches", s"$self self rows served"))
    val under = result.groupBy(col("qid")).agg(count(lit(1)).as("c"))
      .filter(col("c") =!= K).count()
    if (under > 0) viol += (("k_rows", s"$under queries without exactly K rows"))
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
    }),

    // graph-ANN SERVING (x122): greedy beam search over the x120 graph
    // from a fixed hash entry set — the HNSW-class query path, probing
    // the corpus by id-keyed joins only. Rows-only; gated below.
    "x122_knn_graph_search" -> ((s, d) =>
      searched(s, d)._1.orderBy(col("qid"), col("rank"))),

    // Gate (empty-set oracle): per-hop beam objective non-decreasing,
    // recall@K vs the exhaustive relation above the floor (the beam
    // walked TO the true neighbors from cold entry points), exactly K
    // distinct non-self rows per query.
    "x122g_knn_search_gate" -> ((s, d) => {
      val (result, objectives) = searched(s, d)
      searchGateRows(s, d, result, objectives, minRecall = 0.9)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x120g_knn_graph_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "x122g_knn_search_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin
  )
}
