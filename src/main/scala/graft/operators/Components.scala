package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns the dedup family's PAIR relations (x02/x03/x04/x05) into
  * duplicate CLUSTERS, so a pipeline can keep exactly one canonical
  * document per cluster (the member with the smallest id).
  *
  * Min-label propagation with pointer jumping: each round every node
  * takes the smallest root among itself and its neighbors' roots
  * (propagation), then replaces its root by its root's root (path
  * halving). Propagation alone needs O(diameter) rounds; the jumping
  * step compresses chains so convergence is O(log n) rounds even on
  * path graphs — near-dup clusters (near-cliques) converge in 2-3.
  * Each round is a handful of shuffle joins on (node|root) keys; the
  * standard Spark iterative-algorithm shape (same as GraphX Pregel),
  * with per-round localCheckpoint so lineage stays O(1) deep. The
  * convergence check rides the round's own materialization job (an
  * accumulator bumped per changed label while the checkpoint runs)
  * instead of a separate join+count job per round — two jobs per
  * round, not three, and the check itself shuffles nothing.
  */
object Components {

  /** (node, root) for every node appearing in `edges` (a, b); root is
    * the minimum node id in the node's component.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("root", col("node"))
      .localCheckpoint(true)
    // the round-0 labels checkpoint, released once round 1's labels land
    var initLabels: DataFrame = labels
    var round = 0
    var changed = 1L
    var lastCounted: DataFrame = null
    while (changed > 0 && round < maxRounds) {
      // smallest root among the node's neighbors
      val nbrMin = sym
        .join(labels.select(col("node").as("v"), col("root")), "v")
        .groupBy(col("u").as("node")).agg(min(col("root")).as("nbr_root"))
      val propagated = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("root"), coalesce(col("nbr_root"), col("root"))).as("root"),
          col("root").as("old_root"))
        .localCheckpoint(true)
      // pointer jumping: root := root's root (roots are nodes themselves)
      val jumped = propagated
        .join(propagated.select(col("node").as("root"), col("root").as("rr")),
          Seq("root"), "left")
        .select(col("node"), coalesce(col("rr"), col("root")).as("root"),
          col("old_root"))
      // convergence check folded into the round's own materialization:
      // the accumulator is bumped per changed label WHILE the checkpoint
      // job runs, replacing the former separate join+count job. A task
      // retry could only overcount (costing one extra confirming round,
      // same fixpoint); zero is exact — every partition ran once and saw
      // no change.
      val acc = spark.sparkContext.longAccumulator("cc-changed")
      val counted = jumped.mapPartitions { it =>
        it.map { r => if (r.get(1) != r.get(2)) acc.add(1); r }
      }(org.apache.spark.sql.Encoders.row(jumped.schema))
      val prevCounted = lastCounted
      lastCounted = counted.localCheckpoint(true)
      // the round's intermediate checkpoint and the PREVIOUS round's
      // labels are dead once the new labels land — release them now
      // instead of accumulating one block set per round until GC
      graft.CheckpointBlocks.release(propagated)
      if (prevCounted != null) graft.CheckpointBlocks.release(prevCounted)
      if (initLabels != null) {
        graft.CheckpointBlocks.release(initLabels); initLabels = null
      }
      labels = lastCounted.select("node", "root")
      changed = acc.value
      round += 1
    }
    graft.CheckpointBlocks.release(sym)
    // the accumulator can only OVERcount (task retry/speculation), so a
    // nonzero at the round bound gets one exact recheck — a cheap filter
    // over the already-materialized frame, no join — before aborting
    if (changed != 0 && lastCounted != null)
      changed = lastCounted.filter(col("root") =!= col("old_root")).count()
    require(changed == 0, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** Keep-canonical dedup: all ids of `docs` except non-root members of
    * duplicate clusters — one representative (the min id) survives per
    * cluster; documents with no duplicate pair pass through untouched.
    */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val dupes = connectedComponents(pairs)
      .filter(col("root") =!= col("node"))
      .select(col("node").as(idCol))
    docs.join(dupes, Seq(idCol), "left_anti")
  }

  /** Integer-arithmetic PageRank over a directed edge list (src, dst):
    * `iters` synchronous rounds of
    * r' = 0.15*SCALE + 0.85 * Σ_in floor(r_src / outdeg_src), all in
    * 64-bit integer micro-units (SCALE = 1e12 per node), damping as the
    * exact rational 85/100 via integer division — so the fixpoint
    * surface is BIT-deterministic across engines (float PageRank sums
    * in nondeterministic order; this one is oracle-able in plain SQL).
    * Callers must pass a graph with no dangling nodes (every node with
    * an in-edge also has an out-edge — e.g. a symmetrized bipartite
    * graph); rank mass then stays conserved up to the floor truncation.
    *
    * Scale shape per round: one (src-keyed) join rank⋈edges⋈outdeg and
    * one dst-keyed map-side-combinable sum — the standard distributed
    * PageRank shuffle pair; per-round localCheckpoint keeps lineage
    * O(1) deep. Headroom: 85 * Σ contributions stays under 2^63 for
    * corpora up to ~10^5 nodes at this SCALE; shrink SCALE for more.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // outdeg is STATIC across rounds: fold it into the edge relation
    // once, so each round broadcasts only the rank — not a fresh
    // outdeg broadcast build per round
    val ed = e.join(broadcast(outdeg), "src").localCheckpoint(true)
    var rank = e.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1000000000000L))
      .localCheckpoint(true)
    // e has served all three consumers (outdeg, ed, the initial rank) —
    // release its edge-sized blocks now rather than pinning two copies
    // of the edge data (e AND ed) for the whole computation
    graft.CheckpointBlocks.release(e)
    var rankCkpt = rank
    (1 to iters).foreach { i =>
      // rank is a node-cardinality relation (tiny next to the edge
      // list) — broadcast it so each round's only shuffle is the
      // dst-keyed partial-aggregated sum, never the edges. Right while
      // nodes fit the broadcast budget (dimension-sized graphs like this
      // bipartite one); a billion-node graph takes [[pageRankShuffle]]
      // (edges pre-partitioned on src — same algebra, selected by
      // [[pageRankAuto]])
      rank = ed.join(broadcast(rank), col("src") === col("node"))
        .select(col("dst"),
          call_function("div", col("rank"), col("outdeg")).as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(150000000000L) +
          call_function("div", lit(85L) * sum(col("contrib")), lit(100L))).as("rank"))
        .select(col("dst").as("node"), col("rank"))
      // checkpoint every 3rd round, not every round: each rank feeds the
      // next round exactly once, so a short lazy chain recomputes
      // nothing — the checkpoint only bounds lineage depth, and eager
      // materialization per round was most of the wall time. The
      // superseded checkpoint is DEAD the moment the new one is
      // materialized (nothing downstream reads it) — release it
      if (i % 3 == 0 && i < iters) {
        val prev = rankCkpt
        rank = rank.localCheckpoint(true)
        rankCkpt = rank
        graft.CheckpointBlocks.release(prev)
      }
    }
    rank
  }

  /** The billion-node variant of [[pageRank]] — IDENTICAL integer
    * algebra (same micro-units, same floor divisions, hence
    * bit-identical ranks; ComponentsSpec asserts equality), different
    * data movement: nothing is broadcast. The static edges⋈outdeg join
    * runs ONCE, pre-partitioned on src and checkpointed — the
    * checkpoint preserves the hash partitioning, so each round's
    * src-keyed rank join moves only the node-cardinality rank relation
    * into the edges' existing layout, and the dst-keyed sum stays
    * map-side-combinable. Per-round cost: shuffle(nodes) + the
    * aggregation — the edge list never moves again after round 0.
    * Use when the node relation outgrows the broadcast budget (the web
    * graph case); [[pageRankAuto]] dispatches on node count.
    */
  def pageRankShuffle(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src"), col("dst"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(outdeg, "src").repartition(col("src"))
      .localCheckpoint(true)
    var rank = ed.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1000000000000L))
      .localCheckpoint(true)
    var rankCkpt = rank
    (1 to iters).foreach { i =>
      rank = ed.join(rank, col("src") === col("node"))
        .select(col("dst"),
          call_function("div", col("rank"), col("outdeg")).as("contrib"))
        .groupBy(col("dst"))
        .agg((lit(150000000000L) +
          call_function("div", lit(85L) * sum(col("contrib")), lit(100L))).as("rank"))
        .select(col("dst").as("node"), col("rank"))
      if (i % 3 == 0 && i < iters) {
        val prev = rankCkpt
        rank = rank.localCheckpoint(true)
        rankCkpt = rank
        graft.CheckpointBlocks.release(prev)
      }
    }
    rank
  }

  /** Dispatch between the broadcast-dimension and shuffle-join PageRank
    * on measured node count: below `broadcastNodeLimit` distinct source
    * nodes the per-round broadcast of the rank relation is the cheaper
    * plan (no rank shuffle at all); above it the rank relation no
    * longer fits a sane broadcast and the pre-partitioned shuffle form
    * takes over. Both paths produce bit-identical ranks.
    */
  def pageRankAuto(edges: DataFrame, iters: Int,
                   broadcastNodeLimit: Long = 2000000L): DataFrame = {
    val nodes = edges.select(col("src")).distinct().count()
    if (nodes <= broadcastNodeLimit) pageRank(edges, iters)
    else pageRankShuffle(edges, iters)
  }

  /** Per-node triangle counts over an undirected edge list (a, b) —
    * the classic graph-health / community-density statistic (clustering
    * coefficients, spam-farm detection on link graphs).
    *
    * Degree-ordered orientation (Chiba–Nishizeki; Suri &
    * Vassilvitskii's MR formulation, WWW'11): each undirected edge is
    * directed from its lower-(degree, id) endpoint to the higher, which
    * makes every triangle enumerable exactly once as u→v, v→w, u→w AND
    * bounds each node's out-adjacency by O(√m) regardless of skew — a
    * celebrity node's edges are charged to its (low-degree) neighbors.
    *
    * EDGE-ITERATOR form, not wedge-join: the out-adjacency lists
    * (node-sized relation, rows capped at O(√m) elements) join onto the
    * edge relation and each edge row computes N⁺(u) ∩ N⁺(v) in-place —
    * every w in the intersection closes the triangle (u, v, w). The
    * wedge relation (m^{3/2} rows — measured 40M+ on the sf0.1
    * co-purchase graph, where it cost 28 s against the intersection
    * form's ~3 s) is never materialized: triangles leave the operator
    * only as the already-final per-node contribution rows (u and v get
    * +|I| each, each w gets +1, emitted through ONE explode so the join
    * runs once). Both joins are equi-joins on a key column (AQE-sized,
    * broadcastable when the adjacency relation is small); nodes in no
    * triangle are absent from the output (join-reachability defines the
    * support, same convention as the oracle's).
    */
  /** Adjacency-broadcast cutoff for [[triangleCounts]]: ~8M oriented
    * edges is 64 MB of PACKED neighbor ids, but the thing that actually
    * ships is the UnsafeRow-encoded (node, sorted-array) relation
    * inside a hashed relation — array headers, row pointers, and the
    * map's load factor put the materialized broadcast at roughly 2-4×
    * the packed payload, i.e. a few hundred MB resident on the driver
    * and every executor near the cap. That is an acceptable ceiling for
    * a deliberate "small graph" fast path and nothing more; above it
    * the joins stay partitioned (sort-merge), the honest billion-edge
    * shape.
    */
  private val BroadcastEdgeLimit = 8000000L

  def triangleCounts(edges: DataFrame): DataFrame = {
    graft.functions.GraftExtensions.register(edges.sparkSession)
    // canonical undirected edge set: (u < v), self-loops dropped,
    // distinct. Eagerly checkpointed: DataFrame reuse does NOT dedup
    // differently-aliased subtrees (the degree build and the
    // orientation join each re-derive e, so without materialization the
    // upstream edge-build pipeline runs once per consumer — verified in
    // the formatted plan as repeated Scan+Join+Aggregate subtrees).
    // Node ids normalize to long up front: the sorted-intersect kernel
    // is a bigint expression.
    val e = edges
      .select(least(col("a"), col("b")).cast("long").as("u"),
        greatest(col("a"), col("b")).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // feeds the degree agg + the orientation
    var oriented: DataFrame = null
    // finally-release is safe BECAUSE the result is eagerly checkpointed
    // inside the try (releasing before that materialization would hand
    // back a frame over destroyed blocks); without it, a failed join
    // would pin two edge-sized block sets for the session
    try {
      // single pass over e: both endpoints explode from one scan
      val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      // orient low-(deg, id) -> high-(deg, id)
      oriented = e
        .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
            .otherwise(col("u")).as("dst"))
        .localCheckpoint(true) // feeds the adjacency agg + two join sides
      // out-adjacency lists, sorted ascending: distinct oriented edges
      // => no duplicate elements; the one O(deg log deg) sort per node
      // buys the codegen'd two-pointer intersection below (no per-row
      // hash set, no boxing — array_intersect allocates an OpenHashSet
      // per edge, which at millions of edges is pure GC churn)
      val adj = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      // The adjacency relation totals O(m) longs. Left partitioned, the
      // two joins sort-merge ~2 array payloads per edge through the
      // exchanges (~1.2 GB on the sf0.1 co-purchase graph); broadcast,
      // the edge scan stays in place and only the O(m)-byte adjacency
      // moves once per executor. The decision comes from the MEASURED
      // edge count (free — the blocks are already checkpointed), never
      // a planner estimate, with the partitioned join as the
      // over-threshold fallback (the 100 TB path: a billion-edge
      // adjacency cannot broadcast).
      val broadcastable = oriented.count() <= BroadcastEdgeLimit
      def side(a: DataFrame): DataFrame = if (broadcastable) broadcast(a) else a
      val tri = oriented
        .join(side(adj.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
        .join(side(adj.select(col("src").as("dst"), col("nbrs").as("nv"))), Seq("dst"))
        .select(col("src"), col("dst"),
          graft.functions.GraftExtensions.sortedIntersect(
            col("nu"), col("nv")).as("ws"))
        .filter(size(col("ws")) > 0)
      // one explode emits all three corners' contributions per edge
      val contrib = tri.select(explode(concat(
          array(
            struct(col("src").as("node"), size(col("ws")).cast("long").as("c")),
            struct(col("dst").as("node"), size(col("ws")).cast("long").as("c"))),
          transform(col("ws"), w => struct(w.as("node"), lit(1L).as("c")))))
        .as("p"))
      // node-sized result, eagerly checkpointed before the releases
      contrib.select(col("p.node").as("node"), col("p.c").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("triangles"))
        .localCheckpoint(true)
    } finally {
      if (oriented != null) graft.CheckpointBlocks.release(oriented)
      graft.CheckpointBlocks.release(e)
    }
  }
}
