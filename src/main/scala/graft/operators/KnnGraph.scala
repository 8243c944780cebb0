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

  /** `topK(edges.distinct(), k)` in ONE explicitly-sized exchange
    * instead of three planner-inserted ones: the old chain paid an
    * Exchange on the full row for `distinct`, another on `id` for the
    * window, and an AQE re-planning cycle to coalesce each. Here one
    * `repartition(parts, id)` establishes the layout; the (id, nid)
    * dedup and the window both run partition-local (hash(id) clusters
    * every (id, nid) group), and `parts` comes from the operator's own
    * row bound. Row-identical: `sim` is a pure function of (id, nid),
    * so dropping duplicate pairs keeps THE row the distinct kept.
    */
  private def topKMerged(edges: DataFrame, k: Int, estRows: Long): DataFrame = {
    val parts = graft.CheckpointBlocks.partitionsFor(
      edges.sparkSession, estRows)
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
    edges.repartition(parts, col("id"))
      .dropDuplicates("id", "nid")
      .withColumn("rank", row_number().over(w))
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
    // two-step checkpoint: materialize once to learn the row count,
    // then consolidate to a size-derived id-hash layout (claimed, so
    // every id/nid-keyed join below reads the corpus WITHOUT an
    // exchange — the per-round score() used to re-shuffle v twice per
    // round). The whole family's math is partition-layout-proof
    // (integer objective sums, per-row sims, totally-ordered windows),
    // which is what licenses resizing here and NOT in the k-means
    // families.
    val v0 = graft.CheckpointBlocks.cleanCheckpoint(
      Similarity.normedVecs(corpus, idCol, vecCol))
    val n = v0.count()
    val v = graft.CheckpointBlocks.resizeCheckpoint(v0, Seq("id"), n)
    try {
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
      // raw pairing pairs, NOT deduped here: every consumer runs its
      // own keyed dedup (dedupCand below), and the old internal
      // .distinct() was a redundant full-row exchange on top of it
      val pairParts = graft.CheckpointBlocks.partitionsFor(
        corpus.sparkSession, k * n)
      def hashCand(salt: Int): DataFrame = {
        val withJ = v.select(col("id"),
          explode(sequence(lit(salt * k), lit(salt * k + k - 1))).as("j"))
          .select(col("id"), col("j"),
            pmod(xxhash64(col("id"), col("j")), lit(nBuckets)).as("bk"))
          .repartition(pairParts, col("j"), col("bk"))
        withJ.as("x").join(withJ.as("y"),
            col("x.j") === col("y.j") && col("x.bk") === col("y.bk") &&
              col("x.id") =!= col("y.id"))
          .select(col("x.id").as("id"), col("y.id").as("nid"))
      }
      // candidate dedup keyed + sized to colocate with v: the
      // follow-up score() joins on "id" read both sides exchange-free
      val vParts = v.rdd.getNumPartitions
      def dedupCand(cand: DataFrame): DataFrame =
        cand.repartition(vParts, col("id")).dropDuplicates("id", "nid")
      // per-round working state is ≤ kBuild·n rows keyed by id, and
      // topKMerged already left it hash(id)-partitioned — checkpoint
      // claims that layout without re-exchanging
      def ckptG(df: DataFrame): DataFrame =
        graft.CheckpointBlocks.claimedCheckpoint(df, Seq("id"))
      var g = ckptG(topKMerged(score(dedupCand(hashCand(0)), v),
        kBuild, kBuild * n))
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
        val adj = topKMerged(
          g.unionByName(g.select(col("nid").as("id"), col("id").as("nid"),
            col("sim"))),
          kBuild, 2L * kBuild * n)
        // the introduction step: a pivot's adjacency members meet —
        // plus this round's fresh hash pairings (bounded k·N rows);
        // adj is hash(id)-partitioned out of topKMerged, so the
        // introduction self-join runs exchange-free
        val cand = dedupCand(adj.as("x").join(adj.as("y"),
            col("x.id") === col("y.id") && col("x.nid") =!= col("y.nid"))
          .select(col("x.nid").as("id"), col("y.nid").as("nid"))
          .unionByName(hashCand(r)))
        val prev = g
        g = ckptG(topKMerged(g.unionByName(score(cand, v)),
          kBuild, 2L * kBuild * n))
        graft.CheckpointBlocks.release(prev)
        objectives += objective(g)
      }
      val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
      // materialize the emitted top-k slice as ITS OWN checkpoint and
      // free the 2k working state now: the returned frame is a root
      // LogicalRDD, so CheckpointBlocks.release on it (memo eviction,
      // the append dispatch, probe loops) actually frees the blocks —
      // releasing a derived projection is a deliberate no-op
      // g is claimed hash(id), so the rank window runs exchange-free
      // and the emitted slice inherits (and re-claims) that layout
      val out = graft.CheckpointBlocks.claimedCheckpoint(
        g.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("id"), col("rank"), col("nid"), col("sim")),
        Seq("id"))
      graft.CheckpointBlocks.release(g)
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
  /** Build the (normed corpus, two-layer adjacency) pair the serving
    * operators walk — checkpointed, caller releases both. Serving
    * paths that answer MANY requests against one built graph (x122
    * search, x124 curve, x128 filtered search in the declared family)
    * should build this ONCE and pass it via `sharedIndex`: the
    * adjacency distinct and the corpus norm pass are the state-sized
    * part of every search, and rebuilding them per request is the
    * per-query-rescan anti-pattern at serving time.
    */
  def servingIndex(graph: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, k: Int): (DataFrame, DataFrame) = {
    // consolidate + claim hash layouts once at index-build time: the
    // corpus keyed by id (every hop's scoreQ joins it on nid = its id)
    // and the adjacency keyed by nid (every hop's frontier expansion
    // joins it on nid) — the two store-sized relations of serving stop
    // being exchanged per hop, for every consumer of this index
    val v0 = graft.CheckpointBlocks.cleanCheckpoint(
      Similarity.normedVecs(corpus, idCol, vecCol))
    val n = v0.count()
    val v = graft.CheckpointBlocks.resizeCheckpoint(v0, Seq("id"), n)
    val adjacency =
      try graft.CheckpointBlocks.claimedCheckpoint(
        twoLayerAdjacency(graph, v, k), Seq("nid"))
      catch {
        case t: Throwable => graft.CheckpointBlocks.release(v); throw t
      }
    (v, adjacency)
  }

  def searchWithObjective(graph: DataFrame, corpus: DataFrame,
                          idCol: String, vecCol: String, queries: DataFrame,
                          k: Int, beam: Int, hops: Int,
                          entries: Int = 4,
                          sharedIndex: Option[(DataFrame, DataFrame)] = None)
      : (DataFrame, Seq[Long]) = {
    require(k >= 1 && beam >= k && hops >= 0 && entries >= 1,
      "k >= 1, beam >= k, hops >= 0, entries >= 1")
    val owned = sharedIndex.isEmpty
    val (v, adjacency) = sharedIndex.getOrElse(
      servingIndex(graph, corpus, idCol, vecCol, k))
    try {
      val q0 = graft.CheckpointBlocks.cleanCheckpoint(
        Similarity.normedVecs(queries, idCol, vecCol)
          .select(col("id").as("qid"), col("vec").as("qvec"),
            col("nrm").as("qnrm")))
      val q = graft.CheckpointBlocks.resizeCheckpoint(
        q0, Seq("qid"), q0.count())
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
            round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")),
              6).as("sim"))
        val r = runBeam(adjacency, v, q, scoreQ, k, beam, hops, entries,
          countCost = false)
        // materialize the Q·k slice and free the beam-width frontier —
        // the memoized result is then itself a releasable checkpoint
        val out = r.topK.localCheckpoint(true)
        graft.CheckpointBlocks.release(r.handle)
        (out, r.objectives)
      } finally graft.CheckpointBlocks.release(q)
    } finally if (owned) {
      graft.CheckpointBlocks.release(adjacency)
      graft.CheckpointBlocks.release(v)
    }
  }

  /** Two-layer serving adjacency over a built graph: the kNN edges
    * (local descent) + the salt-0 hash-pairing EXPANDER (long-range
    * navigation — re-derives from ids alone, identical to the build
    * seed, nothing extra stored). Caller checkpoints and releases.
    */
  /** Output is hash(nid)-partitioned by construction (the closing
    * dedup's explicit keyed exchange) — callers checkpoint it with
    * `claimedCheckpoint(_, Seq("nid"))`.
    */
  private def twoLayerAdjacency(graph: DataFrame, v: DataFrame,
                                k: Int): DataFrame = {
    val n = v.count()
    val nBuckets = math.max(n / 2, 1L)
    val pairParts = graft.CheckpointBlocks.partitionsFor(
      v.sparkSession, k * n)
    val withJ = v.select(col("id"),
      explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("id"), col("j"),
        pmod(xxhash64(col("id"), col("j")), lit(nBuckets)).as("bk"))
      .repartition(pairParts, col("j"), col("bk"))
    val longEdges = withJ.as("x").join(withJ.as("y"),
        col("x.j") === col("y.j") && col("x.bk") === col("y.bk") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").as("nid"), col("y.id").as("next"))
    graph.select(col("id").as("nid"), col("nid").as("next"))
      .unionByName(longEdges)
      .repartition(graft.CheckpointBlocks.partitionsFor(
        v.sparkSession, 3L * k * n), col("nid"))
      .dropDuplicates("nid", "next")
  }

  private case class BeamRun(topK: DataFrame, objectives: Seq[Long],
                             candPairs: Long, handle: DataFrame)

  /** One greedy beam search over a PREBUILT adjacency — the shared
    * inner loop of serving (x122) and the beam operating curve (x124,
    * which sweeps `beam` against one adjacency + one ground truth).
    * `handle` is the final checkpointed frontier `topK` reads from;
    * the caller releases it (via the memo, or immediately after
    * consuming the slice). `candPairs` counts candidate pairs EXACTLY
    * SCORED (the serving-cost dial) when `countCost` is set — the
    * self-match cut is applied before counting, so the number matches
    * what scoreQ actually scores; the counts are skipped on the
    * serving path — no extra jobs.
    */
  private def runBeam(adjacency: DataFrame, v: DataFrame, q: DataFrame,
                      scoreQ: DataFrame => DataFrame, k: Int, beam: Int,
                      hops: Int, entries: Int, countCost: Boolean,
                      trackObjective: Boolean = true): BeamRun = {
    // per-hop frontier state is ≤ Q·beam rows keyed by qid; per-hop
    // merge = ONE explicit qid-exchange (dedup + cap both run
    // partition-local on it), and the checkpoint claims the layout
    val qN = q.count()
    val qParts = graft.CheckpointBlocks.partitionsFor(
      q.sparkSession, qN * beam)
    val vParts = v.rdd.getNumPartitions
    def beamCap(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      scored.repartition(qParts, col("qid"))
        .dropDuplicates("qid", "nid")
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= beam).select(col("qid"), col("nid"), col("sim"))
    }
    // fixed entry set: the `entries` smallest-hash corpus nodes (a
    // per-partition heap + driver merge, never a global sort)
    val entry = v.select(col("id").as("nid"), xxhash64(col("id")).as("h"))
      .orderBy(col("h")).limit(entries).select(col("nid"))
    val entryPairs = q.select(col("qid")).crossJoin(broadcast(entry))
    // count AFTER the self-match cut (qid =!= nid) so cand_pairs is
    // exactly the pairs scoreQ scores — corpus-drawn queries would
    // otherwise inflate the serving-cost dial with self pairs that are
    // never scored
    def scoredPairs(pairs: DataFrame): DataFrame =
      pairs.filter(col("qid") =!= col("nid"))
    var candPairs = if (countCost) scoredPairs(entryPairs).count() else 0L
    def ckptF(df: DataFrame): DataFrame =
      graft.CheckpointBlocks.claimedCheckpoint(df, Seq("qid"))
    var frontier = ckptF(beamCap(scoreQ(entryPairs)))
    val objectives = Seq.newBuilder[Long]
    def objective(f: DataFrame): Long = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("nid"))
      f.withColumn("r", row_number().over(w)).filter(col("r") <= k)
        .agg(coalesce(sum(round(col("sim") * 1e6).cast("long")), lit(0L)))
        .head().getLong(0)
    }
    // the per-hop trajectory is the SERVING contract (x122g's
    // monotonicity); sweep/append callers that ignore it skip every
    // objective job (the curve derives its endpoint from the slice)
    if (trackObjective) objectives += objective(frontier)
    (1 to hops).foreach { _ =>
      // hop-candidate dedup keyed + sized to colocate with v: scoreQ's
      // nid join then reads both sides exchange-free
      val cand0 = frontier.select(col("qid"), col("nid"))
        .join(adjacency, Seq("nid"))
        .select(col("qid"), col("next").as("nid"))
        .repartition(vParts, col("nid"))
        .dropDuplicates("qid", "nid")
      // counting must not re-run the hop join for the scoring pass —
      // pin it once, count the pinned relation, release after the
      // frontier materializes
      val cand = if (countCost) {
        val c = graft.CheckpointBlocks.claimedCheckpoint(
          scoredPairs(cand0), Seq("nid"))
        candPairs += c.count(); c
      } else cand0
      val prev = frontier
      frontier = ckptF(beamCap(frontier.unionByName(scoreQ(cand))))
      if (countCost) graft.CheckpointBlocks.release(cand)
      graft.CheckpointBlocks.release(prev)
      if (trackObjective) objectives += objective(frontier)
    }
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid"))
    val out = frontier.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
    BeamRun(out, objectives.result(), candPairs, frontier)
  }

  def search(graph: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, queries: DataFrame, k: Int, beam: Int,
             hops: Int): DataFrame =
    searchWithObjective(graph, corpus, idCol, vecCol, queries,
      k, beam, hops)._1

  /** Append a new vector batch into a BUILT kNN graph without a
    * rebuild — the x70/x96 incremental-maintenance contract applied to
    * the graph index family. Three bounded steps:
    *
    *  1. each batch vector beam-searches the EXISTING graph (the x122
    *     walk — id-keyed joins, the corpus never scanned per query)
    *     for candidate neighbors;
    *  2. batch-internal pairs score exactly (|B|² with the batch
    *     broadcast — the x84 measured-batch discipline applies to the
    *     caller's batching);
    *  3. each batch node keeps its top-k of (searched ∪ internal), and
    *     every EXISTING node named by those edges re-cuts its own k
    *     over (old edges ∪ reverse edges) — the HNSW bidirectional
    *     link step. Re-pruning touches ONLY the ≤ |B|·k affected
    *     nodes: their ids broadcast into a semi/anti-join split of the
    *     stored graph, so the index is scanned once and never
    *     shuffled; unaffected rows pass through byte-identical.
    *
    * Per-node sim-sums of existing nodes are non-decreasing BY
    * CONSTRUCTION (each affected node keeps the best k of a superset
    * of its old edges); the x125g gate pins that, plus coverage and a
    * recall floor for the appended nodes.
    */
  /** The EDGE DELTA of appending `batch` into a built graph — the new
    * nodes' top-k edges PLUS the reverse edges they induce on existing
    * nodes — WITHOUT merging it into the stored relation. This is the
    * streaming leg's unit of state: per-batch deltas append to an
    * edge log and the serving graph derives by a top-k cut at read
    * (the LSM shape), so history is never rewritten. [[appendToGraph]]
    * is merge(graph, delta) for the batch caller. Returns a
    * checkpointed frame; the caller releases it.
    */
  /** The reverse-edge cut of [[appendDelta]] step 3b, extracted so its
    * plan shape is PINNABLE (the returned delta is checkpointed, which
    * hides the join from plan inspection): the batch-id side is
    * micro-batch-sized by the appendDelta dispatch and must ship as a
    * BROADCAST anti probe — the k·|B|-row edge relation never
    * exchanges to meet it. PlanAuditSpec asserts the BroadcastHashJoin
    * survives `spark.sql.autoBroadcastJoinThreshold=-1` (the explicit
    * hint, not planner stats, carries the decision).
    */
  private[graft] def reverseEdges(newEdges: DataFrame,
                                  batchIds: DataFrame): DataFrame =
    newEdges
      .join(broadcast(batchIds), newEdges("nid") === batchIds("id"),
        "left_anti")
      .select(col("nid").as("id"), newEdges("id").as("nid"), col("sim"))

  def appendDelta(graph: DataFrame, baseCorpus: DataFrame,
                  batch: DataFrame, idCol: String, vecCol: String,
                  k: Int, beam: Int, hops: Int,
                  entries: Int = 4,
                  exactInternalCutoff: Long = 1024L): DataFrame = {
    require(k >= 1 && beam >= 2 * k && hops >= 0,
      "k >= 1, beam >= 2k, hops >= 0")
    // same consolidate-and-claim discipline as servingIndex: the base
    // corpus keyed by id and the adjacency keyed by nid stop being
    // exchanged per hop of the batch's beam walk
    val v0 = graft.CheckpointBlocks.cleanCheckpoint(
      Similarity.normedVecs(baseCorpus, idCol, vecCol))
    val vN = v0.count()
    val v = graft.CheckpointBlocks.resizeCheckpoint(v0, Seq("id"), vN)
    val b0 = graft.CheckpointBlocks.cleanCheckpoint(
      Similarity.normedVecs(batch, idCol, vecCol))
    val bN = b0.count()
    val b = graft.CheckpointBlocks.resizeCheckpoint(b0, Seq("id"), bN)
    try {
      def scoreQ(pairs: DataFrame): DataFrame = pairs
        .filter(col("qid") =!= col("nid"))
        .join(v.select(col("id").as("nid"), col("vec").as("nvec"),
          col("nrm").as("nnrm")), "nid")
        .join(broadcast(b.select(col("id").as("qid"), col("vec").as("qvec"),
          col("nrm").as("qnrm"))), "qid")
        .select(col("qid"), col("nid"),
          round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6)
            .as("sim"))
      val adjacency = graft.CheckpointBlocks.claimedCheckpoint(
        twoLayerAdjacency(graph, v, k), Seq("nid"))
      try {
        // 1. candidates from the existing graph: the walk keeps a 2k
        // slice so reverse edges draw from a richer pool than the
        // final cut (the build's kBuild idea at serving time)
        val q = b.select(col("id").as("qid"), col("vec").as("qvec"),
          col("nrm").as("qnrm"))
        val run = runBeam(adjacency, v, q, scoreQ, 2 * k, beam, hops,
          entries, countCost = false, trackObjective = false)
        val searched = run.topK
          .select(col("qid").as("id"), col("nid"), col("sim"))
        // 2. batch-internal edges (ids are disjoint from base).
        // MEASURED dispatch, the x84/x20 convention: a normal micro-
        // batch scores its |B|² pairs exactly (broadcast-sized), but a
        // BACKFILL-sized batch must not go quadratic — past the cutoff
        // the batch builds its own bounded NN-Descent graph instead
        // (≤ 4k²·|B| candidate rows per round), the same machinery the
        // initial index build uses. The streaming leg inherits this,
        // so a first-drain backfill of millions of docs stays linear.
        val batchN = bN
        val (bgHandle, internal) =
          if (batchN <= exactInternalCutoff)
            (None, b.as("x").join(broadcast(b.as("y")),
                col("x.id") =!= col("y.id"))
              .select(col("x.id").as("id"), col("y.id").as("nid"),
                round(dot(col("x.vec"), col("y.vec")) /
                  (col("x.nrm") * col("y.nrm")), 6).as("sim")))
          else {
            val bg = build(b, "id", "vec", k, rounds = 3)
            (Some(bg), bg.select(col("id"), col("nid"), col("sim")))
          }
        // 3a. the new nodes' edges — merged cut, then claim the layout
        // topKMerged already established
        val newEdges = graft.CheckpointBlocks.claimedCheckpoint(
          topKMerged(searched.unionByName(internal), k, 3L * k * batchN),
          Seq("id"))
        graft.CheckpointBlocks.release(run.handle)
        // the dispatch build's graph (a releasable checkpoint) has been
        // consumed into newEdges — free it, or every backfill batch of
        // a long-lived stream pins its own k-edge graph forever
        bgHandle.foreach(graft.CheckpointBlocks.release)
        // 3b. reverse edges for EXISTING endpoints only (batch→batch
        // pairs were already complete in `internal`)
        val reverse = reverseEdges(newEdges, b.select(col("id")))
        val delta = graft.CheckpointBlocks.sizedCheckpoint(
          newEdges
            .select(col("id"), col("nid"), col("sim"))
            .unionByName(reverse),
          Seq("id"), 2L * k * batchN)
        graft.CheckpointBlocks.release(newEdges)
        delta
      } finally graft.CheckpointBlocks.release(adjacency)
    } finally {
      graft.CheckpointBlocks.release(b)
      graft.CheckpointBlocks.release(v)
    }
  }

  def appendToGraph(graph: DataFrame, baseCorpus: DataFrame,
                    batch: DataFrame, idCol: String, vecCol: String,
                    k: Int, beam: Int, hops: Int,
                    entries: Int = 4,
                    exactInternalCutoff: Long = 1024L): DataFrame = {
    val delta = appendDelta(graph, baseCorpus, batch, idCol, vecCol,
      k, beam, hops, entries, exactInternalCutoff)
    // checkpoint the batch-id relation once: it feeds THREE broadcast
    // builds below (semi, anti, affected), and un-checkpointed each
    // broadcast re-ran the batch scan + norm pass from scratch
    val batchIds = graft.CheckpointBlocks.cleanCheckpoint(
      Similarity.normedVecs(batch, idCol, vecCol)
        .select(col("id")))
    try {
      // split the delta back into the new nodes' edges and the reverse
      // edges on existing nodes (ids are disjoint by contract)
      val newEdges = delta.join(broadcast(batchIds), Seq("id"), "left_semi")
      val reverse = delta.join(broadcast(batchIds), Seq("id"), "left_anti")
      val affected = reverse.select(col("id")).distinct()
      // fresh-alias every union branch: the stored graph (and the
      // delta checkpoint) each appear in two branches' lineage, and
      // Union constraint rewriting trips on the duplicated expression
      // ids otherwise
      def realias(df: DataFrame): DataFrame = df.select(
        col("id").as("id"), col("nid").as("nid"), col("sim").as("sim"))
      val old = graph.select(col("id"), col("nid"), col("sim"))
      val deltaN = delta.count()
      val repruned = realias(topKMerged(
        realias(old.join(broadcast(affected), Seq("id"), "left_semi"))
          .unionByName(realias(reverse)), k, 2L * deltaN * k))
      val untouched = realias(graph
        .join(broadcast(affected), Seq("id"), "left_anti")
        .select(col("id"), col("nid"), col("sim")))
      val w = Window.partitionBy(col("id"))
        .orderBy(col("sim").desc, col("nid"))
      // materialize the merged graph, then the delta blocks can go —
      // the caller holds (and releases) one checkpoint. One explicit
      // sized id-exchange feeds the final rank window, and the
      // checkpoint claims that layout
      val mergedRows = graph.count() + deltaN
      val merged = graft.CheckpointBlocks.claimedCheckpoint(
        untouched.unionByName(repruned)
          .unionByName(realias(newEdges))
          .repartition(graft.CheckpointBlocks.partitionsFor(
            graph.sparkSession, mergedRows), col("id"))
          .withColumn("rank", row_number().over(w))
          .select(col("id"), col("rank"), col("nid"), col("sim")),
        Seq("id"))
      merged
    } finally {
      graft.CheckpointBlocks.release(batchIds)
      graft.CheckpointBlocks.release(delta)
    }
  }

  /** Serving graph from an append-only edge LOG — the read path over
    * accumulated [[appendDelta]] batches (the LSM shape: writes never
    * rewrite history; the top-k cut happens at read). Duplicate
    * (id, nid) observations collapse first — sims are a pure function
    * of the vectors, so any surviving row is THE row — then each node
    * keeps its best k by the usual (sim desc, nid) WindowGroupLimit.
    */
  def graphFromEdgeLog(edges: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nid"))
    edges.dropDuplicates("id", "nid")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("nid"), col("sim"))
  }

  /** The BEAM-WIDTH operating curve of graph-ANN serving (the x115
    * nprobe-curve discipline applied to the x122 dial): for each beam
    * width, recall@k against the exact relation, candidate pairs
    * exactly scored (the serving cost), and the final beam objective —
    * the table a deployment reads to pick `beam` for a recall target.
    *
    * Unlike nprobe (nested probe sets → suffix sums), beam trajectories
    * are NOT decomposable — a wider beam walks a genuinely different
    * path (no frontier-superset argument holds: the top-b of a wider
    * beam's candidates is NOT the beam-b frontier), so every beam must
    * run its own EXACT evolution. But the evolutions need not run
    * SERIALLY: the frontier rows carry a `bm` tag and all beams walk in
    * ONE traversal — the per-hop adjacency join runs once over the
    * concatenated frontiers instead of once per beam, each distinct
    * (qid, nid) candidate is exactly scored ONCE and shared across the
    * beams that reached it (the frontiers overlap heavily), and the
    * per-beam candidate counts come from one groupBy instead of a
    * count job per beam per hop. Per-(qid, bm) window caps (`r <= bm`)
    * reproduce each beam's capped frontier EXACTLY, so the batched
    * curve is row-identical to beam-at-a-time runs. Shared once per
    * curve, as before: the two-layer adjacency (corpus-sized,
    * checkpointed), the normed corpus/query relations, and the ONE
    * exhaustive ground-truth pass — the sweep never rescans or
    * reshuffles the corpus, and now never re-walks shared hops either.
    *
    * recall_pm is integer per-mille (exact arithmetic, rounded once at
    * emit) and cand_pairs exact counts, so the curve hashes identically
    * across runs.
    */
  def beamOperatingCurve(graph: DataFrame, corpus: DataFrame, idCol: String,
                         vecCol: String, queries: DataFrame, k: Int,
                         beams: Seq[Int], hops: Int,
                         entries: Int = 4,
                         sharedIndex: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    require(beams.nonEmpty && beams.forall(_ >= k),
      "beams must be non-empty, each >= k")
    val sp = corpus.sparkSession
    val owned = sharedIndex.isEmpty
    val (v, adjacency) = sharedIndex.getOrElse(
      servingIndex(graph, corpus, idCol, vecCol, k))
    val q = {
      val q0 = graft.CheckpointBlocks.cleanCheckpoint(
        Similarity.normedVecs(queries, idCol, vecCol)
          .select(col("id").as("qid"), col("vec").as("qvec"),
            col("nrm").as("qnrm")))
      graft.CheckpointBlocks.resizeCheckpoint(q0, Seq("qid"), q0.count())
    }
    try {
      def scoreQ(pairs: DataFrame): DataFrame = pairs
        .filter(col("qid") =!= col("nid"))
        .join(v.select(col("id").as("nid"), col("vec").as("nvec"),
          col("nrm").as("nnrm")), "nid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("nid"),
          round(dot(col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6)
            .as("sim"))
      val qN = q.count()
      // ONE exhaustive pass — the ground truth every beam grades against
      val exact = graft.CheckpointBlocks.sizedCheckpoint(
        Similarity.bruteForceTopK(queries, corpus, idCol, vecCol, k)
          .select(col("qid"), col("nid")),
        Seq("qid"), qN * k)
      try {
          val truthN = exact.count()
          import sp.implicits._
          // ONE batched traversal over (qid, bm)-tagged frontiers.
          // Every per-beam evolution below is EXACTLY runBeam's: same
          // entry set, same 6dp scoring, same (sim desc, nid) cap
          // tie-break, same distinct-before-cap — only concatenated.
          val bms = beams.distinct.sorted
          val beamTags = broadcast(bms.toDF("bm"))
          val vParts = v.rdd.getNumPartitions
          val capParts = graft.CheckpointBlocks.partitionsFor(
            sp, qN * bms.map(_.toLong).sum)
          // merged cap: ONE explicit qid-exchange; the (qid, bm, nid)
          // dedup and the (qid, bm) window both run partition-local on
          // it (hash(qid) clusters every finer-keyed group)
          def cap(scored: DataFrame): DataFrame = {
            val w = Window.partitionBy(col("qid"), col("bm"))
              .orderBy(col("sim").desc, col("nid"))
            scored.repartition(capParts, col("qid"))
              .dropDuplicates("qid", "bm", "nid")
              .withColumn("r", row_number().over(w))
              .filter(col("r") <= col("bm"))
              .select(col("qid"), col("bm"), col("nid"), col("sim"))
          }
          // score each DISTINCT (qid, nid) once, share across beams —
          // scoreQ's self-cut drops the tagged self pairs on join-back
          def scoreTagged(cand: DataFrame): DataFrame = cand
            .join(scoreQ(cand.select(col("qid"), col("nid"))
              .repartition(vParts, col("nid")).dropDuplicates("qid", "nid")),
              Seq("qid", "nid"))
            .select(col("qid"), col("bm"), col("nid"), col("sim"))
          def cut(pairs: DataFrame): DataFrame =
            pairs.filter(col("qid") =!= col("nid"))
          // per-beam exactly-scored pair counts (runBeam's candPairs),
          // accumulated from ONE groupBy per hop instead of a count job
          // per beam per hop
          val candCounts =
            scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
          def addCounts(cand: DataFrame): Unit =
            cut(cand).groupBy(col("bm")).count().collect()
              .foreach(r => candCounts(r.getInt(0)) += r.getLong(1))
          val entry = v.select(col("id").as("nid"),
              xxhash64(col("id")).as("h"))
            .orderBy(col("h")).limit(entries).select(col("nid"))
          val entryPairs = q.select(col("qid")).crossJoin(beamTags)
            .crossJoin(broadcast(entry))
          addCounts(entryPairs)
          // claimed layouts for the loop state: frontier keyed qid out
          // of cap's explicit exchange, candidates keyed nid so the
          // adjacency/corpus joins read them exchange-free
          def ckptF(df: DataFrame): DataFrame =
            graft.CheckpointBlocks.claimedCheckpoint(df, Seq("qid"))
          var frontier = ckptF(cap(scoreTagged(entryPairs)))
          (1 to hops).foreach { _ =>
            val cand = graft.CheckpointBlocks.claimedCheckpoint(
              cut(frontier.select(col("qid"), col("bm"), col("nid"))
                .join(adjacency, Seq("nid"))
                .select(col("qid"), col("bm"), col("next").as("nid"))
                .repartition(vParts, col("nid"))
                .dropDuplicates("qid", "bm", "nid")),
              Seq("nid"))
            addCounts(cand)
            val prev = frontier
            frontier = ckptF(cap(frontier.unionByName(scoreTagged(cand))))
            graft.CheckpointBlocks.release(cand)
            graft.CheckpointBlocks.release(prev)
          }
          // per-(qid, bm) top-k slice → hits and endpoint objectives for
          // ALL beams in two aggregate jobs
          val w = Window.partitionBy(col("qid"), col("bm"))
            .orderBy(col("sim").desc, col("nid"))
          val slice = graft.CheckpointBlocks.sizedCheckpoint(
            frontier.withColumn("rank", row_number().over(w))
              .filter(col("rank") <= k)
              .select(col("bm"), col("qid"), col("nid"), col("sim")),
            Seq("qid"), qN * bms.size * k)
          graft.CheckpointBlocks.release(frontier)
          try {
            val hitRows = slice.join(exact, Seq("qid", "nid"), "left_semi")
              .groupBy(col("bm")).count().collect()
              .map(r => r.getInt(0) -> r.getLong(1)).toMap
            val objRows = slice.groupBy(col("bm"))
              .agg(coalesce(sum(round(col("sim") * 1e6).cast("long")),
                lit(0L)).as("o"))
              .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
            val rows = beams.sorted.map { b =>
              val hit = hitRows.getOrElse(b, 0L)
              (b, hit, truthN,
                if (truthN == 0) 0L else math.round(hit * 1000.0 / truthN),
                candCounts(b), objRows.getOrElse(b, 0L))
            }
            rows.toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs",
              "objective")
          } finally graft.CheckpointBlocks.release(slice)
        } finally graft.CheckpointBlocks.release(exact)
    } finally {
      graft.CheckpointBlocks.release(q)
      if (owned) {
        graft.CheckpointBlocks.release(adjacency)
        graft.CheckpointBlocks.release(v)
      }
    }
  }

  // --- declared family ----------------------------------------------------

  private val K = 5
  private val Rounds = 4

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Seq[Long])]()

  def clearMemo(): Unit = {
    memo.values.forEach { case (df, _) => graft.CheckpointBlocks.release(df) }
    memo.clear()
    idxMemo.values.forEach { case (v, a) =>
      graft.CheckpointBlocks.release(a)
      graft.CheckpointBlocks.release(v)
    }
    idxMemo.clear()
    searchMemo.values.forEach { case (df, _) =>
      graft.CheckpointBlocks.release(df) }
    searchMemo.clear()
    curveMemo.values.forEach(graft.CheckpointBlocks.release(_))
    curveMemo.clear()
    appendMemo.values.forEach { case (m, g) =>
      graft.CheckpointBlocks.release(m)
      graft.CheckpointBlocks.release(g)
    }
    appendMemo.clear()
    filteredMemo.values.forEach { case (df, _) =>
      graft.CheckpointBlocks.release(df) }
    filteredMemo.clear()
    corpusMemo.values.forEach(graft.CheckpointBlocks.release(_))
    corpusMemo.clear()
    // dim is a 4-byte constant, but each bench pass replays from a
    // cleared memo by contract — drop it too (signs are dim-keyed pure
    // constants and carry no session reference; they stay)
    dimMemo.clear()
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
  /** The fixed ±1 sign matrix W, PRECOMPUTED once per embedding width
    * by evaluating the defining expression — sign(m)(j) = +1 iff
    * xxhash64(m, j) is even, j an INT position — in one tiny driver
    * job (the Similarity.hyperplaneSigns discipline). The signs then
    * bake into literals so the manifold projection is a codegen'd
    * array constructor instead of an INTERPRETED `transform` lambda
    * re-hashing 4 xxhash64 calls per element per row — measured ~4 s
    * per full-corpus evaluation at sf0.1, paid on EVERY un-memoized
    * graphCorpus consumer (build, append, gates, filtered serving).
    * Bit-identical: same signs, same left-to-right add order
    * (((s0·u0 + s1·u1) + s2·u2) + s3·u3) + 0.02·x as the lambda's
    * reduce(_ + _).
    */
  private val signMemo = new java.util.concurrent.ConcurrentHashMap[
    Int, IndexedSeq[IndexedSeq[Double]]]()

  private def manifoldSigns(s: SparkSession,
                            dim: Int): IndexedSeq[IndexedSeq[Double]] =
    Option(signMemo.get(dim)).getOrElse {
      // j must stay IntegerType: the lambda hashed the INT element
      // position, and xxhash64 of int vs long differ
      val rows = s.range(dim).select(col("id").cast("int").as("j"))
        .select((0 until 4).map(m =>
          when(xxhash64(lit(m), col("j")) % 2 === 0, lit(1.0))
            .otherwise(lit(-1.0)).as(s"s$m")): _*)
        .collect()
      val signs = (0 until 4).map(m =>
        rows.map(_.getDouble(m)).toIndexedSeq)
      Option(signMemo.putIfAbsent(dim, signs)).getOrElse(signs)
    }

  /** Embedding width per (session, dir) — one head() job, memoized so
    * the dozens of graphCorpus consumers per query don't re-pay it.
    */
  private val dimMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Int]()

  private def embeddingDim(s: SparkSession, d: String): Int = {
    val key = (s, d)
    Option(dimMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngdim") { () =>
        dimMemo.keySet.removeIf(_._1 eq s)
      }
      val dim = graft.Tables(s, d, "embeddings")
        .select(size(col("embedding"))).head().getInt(0)
      Option(dimMemo.putIfAbsent(key, dim)).getOrElse(dim)
    }
  }

  /** Memoized MATERIALIZATION of the manifold corpus. Two reasons it
    * must be a checkpoint, not a lazy plan: (1) every family query
    * used to re-run the parquet scan + projection per consumer (the
    * gates alone evaluate it four times); (2) the codegen'd array
    * constructor is collapse-friendly, and left lazy the optimizer
    * INLINES it into the gates' N×N brute-force join — recomputing the
    * 64-element construction per PAIR, an O(N²·dim) blowup the old
    * interpreted lambda only avoided by accident (HOFs block
    * projection collapse). Materializing once restores O(N·dim)
    * construction and every consumer reads cached blocks.
    */
  private val corpusMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private[graft] def graphCorpus(s: SparkSession, d: String): DataFrame = {
    val key = (s, d)
    Option(corpusMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngc") { () =>
        corpusMemo.keySet.removeIf(_._1 eq s)
      }
      val latent = (0 until 4).map(m =>
        (pmod(xxhash64(col("vec_id"), lit(m)), lit(1000L)).cast("double") /
          lit(1000.0)).as(s"u$m"))
      val dim = embeddingDim(s, d)
      val signs = manifoldSigns(s, dim)
      val raw = ExtensionQueries.rebalanced(graft.Tables(s, d, "embeddings"))
        .select(col("vec_id").as("id") +: col("embedding") +:
          col("label") +: latent: _*)
        .select(col("id"), array((0 until dim).map { j =>
          (0 until 4).map(m => lit(signs(m)(j)) * col(s"u$m")).reduce(_ + _) +
            lit(0.02) * element_at(col("embedding"), j + 1).cast("double")
        }: _*).as("vec"),
          // metadata rider for the filtered-search family (x128); the
          // build/serve paths project it away via normedVecs
          col("label"))
      val ck0 = graft.CheckpointBlocks.cleanCheckpoint(raw)
      val ck = graft.CheckpointBlocks.resizeCheckpoint(
        ck0, Seq("id"), ck0.count())
      Option(corpusMemo.putIfAbsent(key, ck)) match {
        case Some(w) => graft.CheckpointBlocks.release(ck); w
        case None => ck
      }
    }
  }

  private def built(s: SparkSession, d: String): (DataFrame, Seq[Long]) = {
    val key = (s, d)
    Option(memo.get(key)).getOrElse {
      MemoEviction.register(s, "knng") { () =>
        memo.keySet.removeIf(_._1 eq s)
      }
      val r = buildWithObjective(graphCorpus(s, d), "id", "vec", K, Rounds)
      Option(memo.putIfAbsent(key, r)) match {
        case Some(w) => graft.CheckpointBlocks.release(r._1); w
        case None => r
      }
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
    // the exhaustive pass is O(N²·dim) per STREAMED partition: the
    // memoized corpus checkpoint is consolidated to its row-count
    // layout, so fan the streamed side back out or the nested-loop
    // scoring serializes onto one core
    val eb = ExtensionQueries.rebalanced(e)
    val exact = Similarity.bruteForceTopK(eb, eb, "id", "vec", K)
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

  /** The declared family's shared (normed corpus, adjacency) pair:
    * x122 serving, the x124 curve, and x128 filtered serving all walk
    * the SAME built graph over the same corpus — one norm pass + one
    * adjacency distinct serves all three (each rebuilding its own was
    * two redundant corpus-sized distincts per bench pass).
    */
  private val idxMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame)]()

  private def servingIdx(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val key = (s, d)
    Option(idxMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngi") { () =>
        idxMemo.keySet.removeIf(_._1 eq s)
      }
      val r = servingIndex(built(s, d)._1, graphCorpus(s, d), "id", "vec", K)
      Option(idxMemo.putIfAbsent(key, r)) match {
        case Some(w) =>
          graft.CheckpointBlocks.release(r._2)
          graft.CheckpointBlocks.release(r._1)
          w
        case None => r
      }
    }
  }

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
        corpus.filter(col("id") < 10), K, Beam, Hops,
        sharedIndex = Some(servingIdx(s, d)))
      Option(searchMemo.putIfAbsent(key, r)) match {
        case Some(w) => graft.CheckpointBlocks.release(r._1); w
        case None => r
      }
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

  /** Predicate-filtered graph-ANN search — "nearest among rows
    * matching pred" over a built kNN graph (the ACORN problem:
    * filtered HNSW). Three design points, each the survivor of a
    * documented failure mode:
    *
    *  - NAVIGATE UNFILTERED, COLLECT FILTERED: the beam walks the full
    *    two-layer graph (restricting traversal to matching nodes
    *    disconnects the graph at selective predicates — the subgraph
    *    induced by a 10% predicate on a k-regular graph shatters),
    *    while matching candidates accumulate into a separate result
    *    set cut to top-k once at the end.
    *  - MEASURED WIDENING (the x114 discipline): with selectivity s,
    *    an unfiltered frontier of `beam` rows carries only ~s·beam
    *    matches, so the navigation beam widens to beam/s (capped at
    *    8·beam — the honest bound past which the walk degenerates into
    *    a scan and the dispatch below should have fired).
    *  - MEASURED DISPATCH: when the filtered subset itself is small
    *    (keptN ≤ 16·k), graph navigation cannot beat exactly scoring
    *    the subset — brute-force it (perfect recall, one broadcast-
    *    sized join). The count that decides is measured, not guessed —
    *    the pageRankAuto/x20 convention.
    *
    * Scale shape: the kept-id relation joins candidates id-keyed (the
    * corpus is never scanned per query on the walk path), the result
    * accumulator is ≤ hops·Q·beamEff rows cut by one WindowGroupLimit,
    * and the exact path scores Q × keptN with keptN measured small.
    */
  def searchFiltered(graph: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, queries: DataFrame, k: Int, beam: Int,
                     hops: Int, pred: Column,
                     entries: Int = 4,
                     sharedIndex: Option[(DataFrame, DataFrame)] = None)
      : (DataFrame, Boolean) = {
    require(k >= 1 && beam >= k && hops >= 0, "k >= 1, beam >= k, hops >= 0")
    val keptRel = corpus.filter(pred)
    val keptN = keptRel.count()
    if (keptN <= 16L * k) {
      // exact path: the filtered subset is candidate-pool sized
      (Similarity.bruteForceTopK(queries, keptRel, idCol, vecCol, k), false)
    } else {
      val owned = sharedIndex.isEmpty
      val (v, sharedAdj) = sharedIndex match {
        case Some((sv, sa)) => (sv, Some(sa))
        case None =>
          val v0 = graft.CheckpointBlocks.cleanCheckpoint(
            Similarity.normedVecs(corpus, idCol, vecCol))
          (graft.CheckpointBlocks.resizeCheckpoint(
            v0, Seq("id"), v0.count()), None)
      }
      val q = {
        val q0 = graft.CheckpointBlocks.cleanCheckpoint(
          Similarity.normedVecs(queries, idCol, vecCol)
            .select(col("id").as("qid"), col("vec").as("qvec"),
              col("nrm").as("qnrm")))
        graft.CheckpointBlocks.resizeCheckpoint(q0, Seq("qid"), q0.count())
      }
      val kept = graft.CheckpointBlocks.sizedCheckpoint(
        keptRel.select(col(idCol).as("nid")), Seq("nid"), keptN)
      try {
        val n = v.count()
        // widen navigation so ~beam matching rows stay in flight
        val beamEff = math.min(
          math.ceil(beam.toDouble * n / math.max(keptN, 1L)).toLong,
          8L * beam).toInt
        def scoreQ(pairs: DataFrame): DataFrame = pairs
          .filter(col("qid") =!= col("nid"))
          .join(v.select(col("id").as("nid"), col("vec").as("nvec"),
            col("nrm").as("nnrm")), "nid")
          .join(broadcast(q), "qid")
          .select(col("qid"), col("nid"),
            round(dot(col("qvec"), col("nvec")) /
              (col("qnrm") * col("nnrm")), 6).as("sim"))
        val qN = q.count()
        val vParts = v.rdd.getNumPartitions
        val navParts = graft.CheckpointBlocks.partitionsFor(
          corpus.sparkSession, qN * beamEff)
        // merged cap: one explicit qid-exchange carries the dedup and
        // the window (the distinct().window() chain paid two + AQE)
        def navCap(scored: DataFrame): DataFrame = {
          val w = Window.partitionBy(col("qid"))
            .orderBy(col("sim").desc, col("nid"))
          scored.repartition(navParts, col("qid"))
            .dropDuplicates("qid", "nid")
            .withColumn("r", row_number().over(w))
            .filter(col("r") <= beamEff)
            .select(col("qid"), col("nid"), col("sim"))
        }
        val adjacency = sharedAdj.getOrElse(
          graft.CheckpointBlocks.claimedCheckpoint(
            twoLayerAdjacency(graph, v, k), Seq("nid")))
        try {
          def ckptF(df: DataFrame): DataFrame =
            graft.CheckpointBlocks.claimedCheckpoint(df, Seq("qid"))
          val entry = v.select(col("id").as("nid"), xxhash64(col("id")).as("h"))
            .orderBy(col("h")).limit(entries).select(col("nid"))
          var frontier = ckptF(navCap(scoreQ(
            q.select(col("qid")).crossJoin(broadcast(entry)))))
          // matching rows seen so far, re-cut per hop (bounded k·Q).
          // STORE-PROBE DECOMPOSITION (the exactStoreProbe discipline):
          // df ⋉ kept would have to broadcast the CORPUS-FILTER-sized
          // kept relation (a semi join builds on its right), falling
          // back to shuffling it once per hop past the threshold —
          // probe kept with the bounded frontier nids instead (≤
          // Q·beamEff rows, the same bound the unconditional
          // broadcast(q) in scoreQ already assumes), so kept is
          // SCANNED per cut, never exchanged
          // callers hand matchCut a hash(qid)-partitioned, deduped
          // frame (the claimed frontier, or a mergeQ output), so the
          // broadcast semi probes preserve the layout and the rank
          // window runs exchange-free
          def matchCut(df: DataFrame): DataFrame = {
            val w = Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("nid"))
            val matched = kept.join(
              broadcast(df.select(col("nid")).distinct()),
              Seq("nid"), "left_semi")
            df.join(broadcast(matched), Seq("nid"), "left_semi")
              .withColumn("r", row_number().over(w))
              .filter(col("r") <= k)
              .select(col("qid"), col("nid"), col("sim"))
          }
          def mergeQ(df: DataFrame): DataFrame =
            df.repartition(navParts, col("qid")).dropDuplicates("qid", "nid")
          var results = ckptF(matchCut(frontier))
          (1 to hops).foreach { _ =>
            val cand = frontier.select(col("qid"), col("nid"))
              .join(adjacency, Seq("nid"))
              .select(col("qid"), col("next").as("nid"))
              .repartition(vParts, col("nid"))
              .dropDuplicates("qid", "nid")
            val scored = graft.CheckpointBlocks.claimedCheckpoint(
              scoreQ(cand), Seq("nid"))
            val prevF = frontier
            val prevR = results
            frontier = ckptF(navCap(frontier.unionByName(scored)))
            results = ckptF(matchCut(mergeQ(results.unionByName(scored))))
            graft.CheckpointBlocks.release(prevF)
            graft.CheckpointBlocks.release(prevR)
            graft.CheckpointBlocks.release(scored)
          }
          val w = Window.partitionBy(col("qid"))
            .orderBy(col("sim").desc, col("nid"))
          val out = graft.CheckpointBlocks.claimedCheckpoint(
            results.withColumn("rank", row_number().over(w))
              .filter(col("rank") <= k)
              .select(col("qid"), col("rank"), col("nid"), col("sim")),
            Seq("qid"))
          graft.CheckpointBlocks.release(frontier)
          graft.CheckpointBlocks.release(results)
          (out, true)
        } finally if (owned) graft.CheckpointBlocks.release(adjacency)
      } finally {
        graft.CheckpointBlocks.release(q)
        if (owned) graft.CheckpointBlocks.release(v)
        graft.CheckpointBlocks.release(kept)
      }
    }
  }

  // --- incremental append family (x125) ----------------------------------

  /** Deterministic index/batch split of the manifold corpus: every
    * eighth id arrives "later" — batch size proportional to the corpus
    * at every sf, ids disjoint by construction.
    */
  private[graft] def appendSplit(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val c = graphCorpus(s, d)
    (c.filter(pmod(col("id"), lit(8)) =!= 0),
      c.filter(pmod(col("id"), lit(8)) === 0))
  }

  private val appendMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame)]()

  /** (merged graph after append, base graph before it). */
  private def appended(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val key = (s, d)
    Option(appendMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knnga") { () =>
        appendMemo.keySet.removeIf(_._1 eq s)
      }
      val (base, batch) = appendSplit(s, d)
      val g0 = build(base, "id", "vec", K, Rounds)
      val merged = appendToGraph(g0, base, batch, "id", "vec",
        K, Beam, Hops)
      val r = (merged, g0)
      Option(appendMemo.putIfAbsent(key, r)) match {
        case Some(w) =>
          graft.CheckpointBlocks.release(merged)
          graft.CheckpointBlocks.release(g0)
          w
        case None => r
      }
    }
  }

  /** The x125g body over an explicit (merged, base) pair — the spec
    * hook proving the clauses fire (a hops=0 append misses exact
    * neighbors; a merged graph that dropped a base node's good edge
    * trips no_degrade).
    */
  private[graft] def appendGateRows(s: SparkSession, d: String,
                                    merged: DataFrame, baseGraph: DataFrame,
                                    minRecall: Double): DataFrame = {
    import s.implicits._
    val (base, batch) = appendSplit(s, d)
    val viol = Seq.newBuilder[(String, String)]
    // coverage: every batch id carries exactly K edges
    val batchN = batch.count()
    val covered = merged.join(batch.select(col("id")), Seq("id"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("c"))
    val exactK = covered.filter(col("c") === K).count()
    if (exactK != batchN)
      viol += (("coverage",
        s"$exactK of $batchN batch nodes carry exactly K=$K edges"))
    // structure over the whole merged graph
    val self = merged.filter(col("id") === col("nid")).count()
    if (self > 0) viol += (("self_loops", s"$self self edges"))
    val dup = merged.groupBy(col("id"), col("nid"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    if (dup > 0) viol += (("dup_edges", s"$dup duplicate edges"))
    val over = merged.groupBy(col("id")).agg(count(lit(1)).as("c"))
      .filter(col("c") > K).count()
    if (over > 0) viol += (("degree", s"$over nodes exceed K=$K"))
    // recall: the appended nodes' edges vs the exhaustive kNN of the
    // batch against the FULL post-append corpus
    val full = graphCorpus(s, d)
    val exact = Similarity.bruteForceTopK(
      ExtensionQueries.rebalanced(batch), full, "id", "vec", K)
      .select(col("qid").as("id"), col("nid"))
    val truthN = exact.count()
    val hit = exact.join(merged.select(col("id"), col("nid")),
      Seq("id", "nid"), "left_semi").count()
    if (truthN > 0 && hit * 1000L < math.round(minRecall * 1000) * truthN)
      viol += (("recall",
        s"$hit of $truthN exact batch neighbors present (< $minRecall)"))
    // no_degrade: every base node's integer sim-sum is >= its
    // pre-append sum (affected nodes keep the best k of a SUPERSET of
    // their old edges; untouched rows pass through byte-identical)
    def sums(g: DataFrame): DataFrame = g
      .groupBy(col("id"))
      .agg(sum(round(col("sim") * 1e6).cast("long")).as("s"))
    val degraded = sums(baseGraph).as("b")
      .join(sums(merged).as("m"), "id")
      .filter(col("m.s") < col("b.s")).count()
    if (degraded > 0)
      viol += (("no_degrade", s"$degraded base nodes lost similarity mass"))
    viol.result().toDF("clause", "violation").orderBy(col("clause"))
  }

  // --- filtered search family (x128) --------------------------------------

  /** The declared filtered-serving predicate: 3 of the 10 labels
    * (~30% selectivity) — squarely in the walk regime at every sf, so
    * the declared query exercises graph navigation, not the small-
    * subset exact dispatch (the spec exercises that side explicitly).
    */
  private[graft] val FilterPred: Column = col("label") < 3

  private val filteredMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, Boolean)]()

  private def searchedFiltered(s: SparkSession, d: String)
      : (DataFrame, Boolean) = {
    val key = (s, d)
    Option(filteredMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngf") { () =>
        filteredMemo.keySet.removeIf(_._1 eq s)
      }
      val corpus = graphCorpus(s, d)
      val r = searchFiltered(built(s, d)._1, corpus, "id", "vec",
        corpus.filter(col("id") < 10), K, Beam, Hops, FilterPred,
        sharedIndex = Some(servingIdx(s, d)))
      Option(filteredMemo.putIfAbsent(key, r)) match {
        case Some(w) => graft.CheckpointBlocks.release(r._1); w
        case None => r
      }
    }
  }

  /** The x128g body over an explicit result — the spec hook (a naive
    * post-filtered result trips recall; an unfiltered one trips pred).
    */
  private[graft] def filteredGateRows(s: SparkSession, d: String,
                                      result: DataFrame, tookWalk: Boolean,
                                      minRecall: Double): DataFrame = {
    import s.implicits._
    val viol = Seq.newBuilder[(String, String)]
    val corpus = graphCorpus(s, d)
    val kept = corpus.filter(FilterPred).select(col("id").as("nid"))
    val offPred = result.join(kept, Seq("nid"), "left_anti").count()
    if (offPred > 0)
      viol += (("pred", s"$offPred served rows violate the predicate"))
    // k_rows over the DECLARED query relation, not the served result's
    // own qids: a query the serving path dropped entirely would be
    // invisible to a groupBy(result) check — left-join the declared
    // qids so a missing query counts as 0 rows and fires the clause
    val declaredQ = corpus.filter(col("id") < 10).select(col("id").as("qid"))
    val underK = declaredQ
      .join(result.groupBy(col("qid")).agg(count(lit(1)).as("c")),
        Seq("qid"), "left")
      .filter(coalesce(col("c"), lit(0L)) =!= K).count()
    if (underK > 0)
      viol += (("k_rows", s"$underK queries without exactly K rows"))
    val exact = Similarity.bruteForceTopK(corpus.filter(col("id") < 10),
        corpus.filter(FilterPred), "id", "vec", K)
      .select(col("qid"), col("nid"))
    val truthN = exact.count()
    val hit = exact.join(result.select(col("qid"), col("nid")),
      Seq("qid", "nid"), "left_semi").count()
    if (truthN > 0 && hit * 1000L < math.round(minRecall * 1000) * truthN)
      viol += (("recall",
        s"$hit of $truthN filtered neighbors served (< $minRecall)"))
    if (!tookWalk)
      viol += (("dispatch",
        "declared predicate should take the walk path, not the exact scan"))
    viol.result().toDF("clause", "violation").orderBy(col("clause"))
  }

  private val CurveBeams = Seq(K, 8, 16)

  private val curveMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  private def curve(s: SparkSession, d: String): DataFrame = {
    val key = (s, d)
    Option(curveMemo.get(key)).getOrElse {
      MemoEviction.register(s, "knngc") { () =>
        curveMemo.keySet.removeIf(_._1 eq s)
      }
      val corpus = graphCorpus(s, d)
      val r = beamOperatingCurve(built(s, d)._1, corpus, "id", "vec",
        corpus.filter(col("id") < 10), K, CurveBeams, Hops,
        sharedIndex = Some(servingIdx(s, d)))
        .localCheckpoint(true)
      Option(curveMemo.putIfAbsent(key, r)) match {
        case Some(w) => graft.CheckpointBlocks.release(r); w
        case None => r
      }
    }
  }

  /** The x124g body over an explicit curve — the spec hook proving the
    * clauses fire (a shuffled recall column trips monotonicity; a
    * curve whose widest beam misses the floor trips the floor).
    *
    * TOLERANCE FORM (round 17): recall_pm / cand_pairs non-decreasing
    * in beam is EMPIRICAL for the declared fixture, not structural —
    * a wider beam walks a genuinely different path (no frontier-
    * superset argument holds, unlike the x129 shortlist curve whose
    * nesting IS structural), so a correct implementation on a drifted
    * fixture/scale could show a small local dip and a strict clause
    * would block a round on correct code. The step clauses therefore
    * allow a bounded dip (recall: 50 pm; cost: 5% of the previous
    * step) — big enough to absorb fixture noise, far too small to
    * pass a real regression (the spec's tampered curve drops 100 pm /
    * 10%) — and two ENDPOINT clauses pin what the dial is FOR,
    * scale-free: the widest beam must not recall less than the
    * narrowest, and must not cost less than the narrowest (a flat or
    * inverted dial prices nothing). The hits<=truth and floor clauses
    * are exact as before.
    */
  private[graft] def curveGateRows(s: SparkSession, curveDf: DataFrame,
                                   minRecallPm: Long): DataFrame = {
    import s.implicits._
    val rows = curveDf.orderBy(col("beam"))
      .select(col("beam"), col("hits"), col("truth_n"), col("recall_pm"),
        col("cand_pairs"))
      .collect()
    val viol = Seq.newBuilder[(String, String)]
    val RecallDipPm = 50L
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (b.getLong(3) < a.getLong(3) - RecallDipPm)
          viol += ((f"recall_beam_${b.getInt(0)}%02d",
            s"recall fell ${a.getLong(3)} -> ${b.getLong(3)} " +
              s"(> $RecallDipPm pm tolerance)"))
        if (b.getLong(4) < a.getLong(4) - a.getLong(4) / 20)
          viol += ((f"cost_beam_${b.getInt(0)}%02d",
            s"cand_pairs fell ${a.getLong(4)} -> ${b.getLong(4)} " +
              "(> 5% tolerance)"))
      case _ =>
    }
    for (first <- rows.headOption; last <- rows.lastOption
         if rows.length >= 2) {
      if (last.getLong(3) < first.getLong(3))
        viol += (("recall_endpoint",
          s"widest-beam recall ${last.getLong(3)} < narrowest " +
            s"${first.getLong(3)}"))
      if (last.getLong(4) < first.getLong(4))
        viol += (("cost_endpoint",
          s"widest-beam cand_pairs ${last.getLong(4)} < narrowest " +
            s"${first.getLong(4)}"))
    }
    rows.foreach { r =>
      if (r.getLong(1) > r.getLong(2))
        viol += ((f"hits_beam_${r.getInt(0)}%02d",
          s"hits ${r.getLong(1)} exceed truth ${r.getLong(2)}"))
    }
    if (rows.nonEmpty && rows.last.getLong(3) < minRecallPm)
      viol += (("floor",
        s"recall_pm ${rows.last.getLong(3)} at widest beam < $minRecallPm"))
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
    }),

    // the BEAM-WIDTH operating curve (x124): recall@K, exactly-scored
    // candidate pairs, and final objective per beam in {5,8,16} over
    // ONE shared adjacency + ONE exhaustive ground-truth pass — the
    // table that prices the x122 serving dial. Rows-only (the walk
    // isn't SQL-expressible); the x124g gate carries the contract.
    "x124_knn_beam_curve" -> ((s, d) => curve(s, d).orderBy(col("beam"))),

    // Gate (empty-set oracle): recall and cost monotone non-decreasing
    // in beam, hits bounded by truth, and the widest beam clears the
    // 0.9 recall floor (the curve ENDS somewhere worth operating).
    "x124g_knn_beam_gate" -> ((s, d) =>
      curveGateRows(s, curve(s, d), minRecallPm = 900L)),

    // incremental graph MAINTENANCE (x125): every eighth vector
    // arrives as a later batch and is appended without a rebuild —
    // beam-search candidates + batch-internal exact pairs + reverse
    // edges re-pruned on the ≤ |B|·k affected nodes only (broadcast
    // id split; the stored graph is scanned once, never shuffled).
    // Rows-only; the x125g gate carries the contract.
    "x125_knn_graph_append" -> ((s, d) =>
      appended(s, d)._1.orderBy(col("id"), col("rank"))),

    // Gate (empty-set oracle): batch coverage at exactly K edges,
    // structural soundness, recall@K for the appended nodes vs the
    // exhaustive post-append relation, and no base node loses
    // similarity mass (the superset-re-prune invariant).
    "x125g_knn_append_gate" -> ((s, d) => {
      val (merged, g0) = appended(s, d)
      appendGateRows(s, d, merged, g0, minRecall = 0.9)
    }),

    // predicate-FILTERED graph serving (x128): nearest among label<3
    // rows — navigate the full graph, collect matching candidates,
    // widen the beam by measured selectivity, exact-scan dispatch for
    // tiny subsets. Rows-only; the x128g gate carries the contract.
    "x128_knn_search_filtered" -> ((s, d) =>
      searchedFiltered(s, d)._1.orderBy(col("qid"), col("rank"))),

    // Gate (empty-set oracle): every served row satisfies the
    // predicate, exactly K rows per query, recall@K vs brute force
    // over the FILTERED corpus above the floor, and the declared
    // predicate took the walk path (the dispatch threshold is sane).
    "x128g_knn_filtered_gate" -> ((s, d) => {
      val (result, tookWalk) = searchedFiltered(s, d)
      filteredGateRows(s, d, result, tookWalk, minRecall = 0.9)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "x120g_knn_graph_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "x122g_knn_search_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "x124g_knn_beam_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "x125g_knn_append_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin,
    "x128g_knn_filtered_gate" ->
      """SELECT CAST(NULL AS VARCHAR) AS clause, CAST(NULL AS VARCHAR) AS violation
        |WHERE false""".stripMargin
  )
}
