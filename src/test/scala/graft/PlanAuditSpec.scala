package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-level regression guard: every declared query is planned against
  * sf0.001 and checked for the two anti-patterns that turn a working
  * sf0.01 query into a 100 TB non-starter — cartesian products and
  * unbounded nested-loop joins. A refactor that silently drops an
  * equi-join condition (or defeats a pushdown that made one safe) fails
  * here, not in production.
  *
  * Uses `sparkPlan` (the pre-AQE physical plan): the AQE wrapper node
  * hides its inner plan from TreeNode traversal, and a cartesian is
  * visible before adaptive re-planning anyway.
  */
class PlanAuditSpec extends SparkSpecBase {

  /** x06 is the intentional O(N*Q) brute-force ANN baseline (its
    * qid != nid scoring join is a nested loop BY DESIGN; the LSH and
    * IVF variants are its scale paths), and the two precision gates
    * embed the same exhaustive brute-force scoring as their reference
    * relation.
    */
  /** x26g's nested loop is a 1-row broadcast scalar aggregate (the
    * total-count threshold) — the standard scalar-subquery shape, not
    * an unbounded join.
    */
  /** x82's nested loop is the IVF probe assignment — queries × coarse
    * centroids, a BOUNDED product (Q × nlist, both config-sized; the
    * same shape ivfAssign runs inside the x16 index memo, hidden there
    * by the checkpoint). The corpus-sized codes scan joins by equi-key.
    */
  /** x97's product is corpus × EVAL SET — the eval side is
    * benchmark-sized by definition and explicitly broadcast; every
    * corpus row must be scored against every eval item (that IS the
    * decontamination check), so the BNLJ is the intended bounded shape.
    */
  /** x115's exhaustive pass is its GROUND TRUTH by definition (the
    * curve measures recall against the exact relation, so one
    * brute-force scoring join is the price of the table — same shape
    * and exemption rationale as x06); its Q × nlist cell-rank product
    * is the bounded ivfAssign shape x82 documents. x114's gates embed
    * the same filtered exhaustive reference.
    */
  private val nestedLoopByDesign =
    Set("x06_ann_brute_topk", "x07p_ann_lsh_precision", "x16p_ann_ivf_precision",
      "x26g_heavy_hitters_recall",
      "x82_ann_ivfpq_topk", "x82r_ivfpq_dup_recall",
      "x82r2_ivfpq_near_dup_recall",
      "x95_ann_ivfpq_rerank", "x95g_ivfpq_rerank_gate",
      "x83e_pixel_embed_topk", "x97_semantic_decontam",
      // x83eg ranks a LITERAL 20-blob twin fixture against itself
      // (bruteForceTopK's non-equi self-pairing) — both sides are
      // fixture-sized by construction, never corpus-shaped
      "x83eg_pixel_embed_gate",
      "x114p_ann_filtered_precision", "x114r_ann_filtered_recall",
      "x115_ivf_operating_curve")

  test("no declared query plans a cartesian product or an unintended nested-loop join") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        val plan = f(spark, sfDir).queryExecution.sparkPlan
        val cart = plan.collect { case c: CartesianProductExec => c }
        val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
        // the by-design exemption covers BOTH shapes: the same non-equi
        // join plans as either BNLJ or CartesianProduct depending on
        // whether stats put one side under the broadcast threshold
        val bad =
          (if (cart.nonEmpty && !nestedLoopByDesign(name))
             Seq(s"$name: CartesianProduct") else Nil) ++
            (if (bnlj.nonEmpty && !nestedLoopByDesign(name))
               Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
        bad
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q52 star join broadcasts its dimension sides") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SparkEntry.queries("q52_star_join")(spark, sfDir)
      .queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    // customer and nation must come in as broadcasts; only the fact
    // tables may shuffle. A stats/threshold regression that demotes a
    // dim to a shuffle join fails here, not at 100 TB
    assert(bhj.size >= 2, s"expected >=2 broadcast dim joins, got:\n$plan")
  }

  test("q54's rank filter is pushed into a WindowGroupLimit (map+reduce k-heap)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val plan = SparkEntry.queries("q54_topk_group")(spark, sfDir)
      .queryExecution.sparkPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    // Partial (pre-shuffle) + Final: no group is fully sorted or fully
    // shuffled — losing this rewrite silently reverts to sort-everything
    assert(limits.size === 2, s"expected partial+final WindowGroupLimit, got:\n$plan")
  }

  test("x93's per-source cap gets the same WindowGroupLimit rewrite") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val plan = SparkEntry.queries("x93_source_cap")(spark, sfDir)
      .queryExecution.sparkPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    // one skewed mega-source must never force a full sort of its docs:
    // the cap caps map-side, before the shuffle
    assert(limits.size === 2, s"expected partial+final WindowGroupLimit, got:\n$plan")
  }

  test("x51's per-doc top-k gets the same WindowGroupLimit rewrite") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val plan = SparkEntry.queries("x51_tfidf")(spark, sfDir)
      .queryExecution.sparkPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    assert(limits.size === 2, s"expected partial+final WindowGroupLimit, got:\n$plan")
  }

  test("x62's top-k is TakeOrderedAndProject (per-partition k-heap), never a global sort") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.SortExec
    val plan = SparkEntry.queries("x62_bm25_topk")(spark, sfDir)
      .queryExecution.sparkPlan
    val topk = plan.collect { case t: TakeOrderedAndProjectExec => t }
    assert(topk.size === 1, s"expected TakeOrderedAndProject, got:\n$plan")
    // orderBy(...).limit(k) planning as Sort + Limit would materialize a
    // full global sort of every scored doc at 100 TB
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"no global sort may survive under the top-k:\n$plan")
  }

  test("x50's host blocklist is a broadcast anti join, never a shuffle") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SparkEntry.queries("x50_url_canonicalize")(spark, sfDir)
      .queryExecution.sparkPlan
    val anti = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.toString == "LeftAnti" => j
    }
    // the blocklist must ship to executors, not shuffle the corpus
    assert(anti.size === 1, s"expected one broadcast LeftAnti, got:\n$plan")
  }

  test("x91's 6-way join broadcasts every dimension; only facts shuffle") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val plan = SparkEntry.queries("x91_local_supplier_volume")(spark, sfDir)
      .queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    val shuffled = plan.collect {
      case j: SortMergeJoinExec => j
      case j: ShuffledHashJoinExec => j
    }
    // region/nation/customer/supplier are dimension-sized: all must come
    // in as broadcasts; at most the lineitem-orders fact join may shuffle
    assert(bhj.size >= 4, s"expected >=4 broadcast dim joins, got:\n$plan")
    assert(shuffled.size <= 1, s"at most the fact join may shuffle:\n$plan")
  }

  test("x88's sketch lookup broadcasts the 4x256-cell relation onto the probes") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SparkEntry.queries("x88_cms_point_estimates")(spark, sfDir)
      .queryExecution.sparkPlan
    // the CMS relation is bounded by construction — it must ship as a
    // broadcast, never shuffle the probe side against it
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"expected a broadcast sketch join, got:\n$plan")
  }

  test("x86's per-type stats broadcast onto the event scan") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SparkEntry.queries("x86_event_zscore")(spark, sfDir)
      .queryExecution.sparkPlan
    // stats are one row per event_type; the event log must not shuffle
    // to meet them
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.size === 1,
      s"expected one broadcast stats join, got:\n$plan")
  }

  test("x107 mojibake repair is scan-side: no join, no aggregate") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val plan = SparkEntry.queries("x107_mojibake_repair")(spark, sfDir)
      .queryExecution.sparkPlan
    // detection + guarded repair are pure string expressions over one
    // parquet scan — any join or aggregate means the shape regressed
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"x107 must not join:\n$plan")
    assert(plan.collect { case a: BaseAggregateExec => a }.isEmpty,
      s"x107 must not aggregate:\n$plan")
  }

  test("x108's manifest is one map-side-combined aggregation: a single shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val plan = SparkEntry.queries("x108_shard_manifest")(spark, sfDir)
      .queryExecution.sparkPlan
    // partial+final HashAggregate around AT MOST one hash exchange (the
    // NShards-row combine; a single-partition input needs none at all);
    // the orderBy's range exchange moves ≤16 rows
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.size === 2, s"expected partial+final aggregate, got:\n$plan")
    val hashEx = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") => e
    }
    assert(hashEx.size <= 1, s"at most one hash exchange may move data:\n$plan")
  }

  test("x111's threshold sweep never joins: bucket aggregates + a generator") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = SparkEntry.queries("x111_threshold_sweep")(spark, sfDir)
      .queryExecution.sparkPlan
    // the 21-row curve must derive from bucket aggregates through an
    // explode — a per-threshold join against the corpus would rescan it
    // 21 times at 100 TB
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"x111 must not join:\n$plan")
  }

  test("x116's threshold curve never joins: bucket aggregates + a generator") {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val plan = SparkEntry.queries("x116_neardup_threshold_curve")(spark, sfDir)
      .queryExecution.sparkPlan
    // the pair relation arrives pre-materialized (shared memo); the
    // 11-row curve must fall out of bucket aggregates and a generator —
    // a per-threshold join against the pairs would rescan them 11 times
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"x116 must not join:\n$plan")
  }

  test("the operating-curve operator expands nprobe via a generator, never a per-nprobe rescan") {
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    // pin the OPERATOR's plan (the declared x115 serves a shared
    // checkpointed memo, which hides the shape): the x111 suffix-sum
    // form — crank buckets explode their covered nprobe values through
    // ONE Generate; a join or window keyed by nprobe would rescan the
    // assignment relation up to nlist times
    val e = Tables(spark, sfDir, "embeddings")
    val plan = Similarity.ivfOperatingCurve(
        Similarity.ivfBuild(e, "vec_id", "embedding", nlist = 8),
        e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .queryExecution.sparkPlan
    assert(plan.collect { case g: GenerateExec => g }.nonEmpty,
      s"the curve must expand nprobe via a generator:\n$plan")
  }

  test("incremental passage dedup probes the stored index with a broadcast semi-join; the store side never exchanges") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    import graft.operators.PassageDedup
    // the scale-critical decision pass_incr's 16x slope depends on:
    // the stored window index is SCANNED and the batch's distinct
    // windows land on it as a broadcast semi probe — shuffling the
    // stored side grew 3x across a 16x index in the probe. The
    // broadcast comes from a MEASURED count, so it must hold even with
    // planner auto-broadcast OFF (stats through explode+distinct were
    // measured 228x under on this shape — the hint, not the planner,
    // carries it).
    val docs = Tables(spark, sfDir, "documents")
    val stored = PassageDedup.windowIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 5)
      .localCheckpoint(true)
    try {
      val batch = docs.filter(col("doc_id") % 2 === 1)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try PassageDedup.incrementalPassageSpans(batch, stored,
          "doc_id", "text", 5).queryExecution.sparkPlan
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      // the probe join: the one whose STREAMED side is the stored-index
      // scan (a checkpointed RDD scan here, a parquet scan in production)
      val storeProbe = plan.collect {
        case j: BroadcastHashJoinExec
          if j.joinType.toString == "LeftSemi" &&
            j.left.collectLeaves().exists(
              _.getClass.getSimpleName == "RDDScanExec") => j
      }
      assert(storeProbe.nonEmpty,
        s"expected the stored-index semi probe as a BroadcastHashJoin:\n$plan")
      // the streamed (stored) side must be scan-only — any exchange
      // below it means the O(index) shuffle the measured broadcast
      // exists to avoid
      assert(storeProbe.forall(
        _.left.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"the stored side of the semi probe must not exchange:\n$plan")
    } finally graft.CheckpointBlocks.release(stored)
  }

  test("a backfill-sized batch degrades the store probe to a partitioned join (the measured dispatch flips)") {
    import org.apache.spark.sql.execution.joins.{SortMergeJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.functions.col
    import graft.operators.PassageDedup
    val docs = Tables(spark, sfDir, "documents")
    val stored = PassageDedup.windowIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", 5)
      .localCheckpoint(true)
    try {
      val batch = docs.filter(col("doc_id") % 2 === 1)
      // limit 0: every batch measures over it — the conservative
      // degrade path a giant backfill takes instead of OOMing the
      // driver. Auto-broadcast off too: the dispatch only WITHHOLDS the
      // hint (a production backfill exceeds the planner threshold on
      // its own; this fixture doesn't), so the flip shows with the
      // planner's stats-based broadcast disabled.
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try PassageDedup.incrementalPassageSpans(batch, stored,
            "doc_id", "text", 5, broadcastWindowLimit = 0L)
          .queryExecution.sparkPlan
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val partitioned = plan.collect {
        case j: SortMergeJoinExec if j.joinType.toString == "LeftSemi" => j
        case j: ShuffledHashJoinExec if j.joinType.toString == "LeftSemi" => j
      }
      assert(partitioned.nonEmpty,
        s"over-limit batch must fall back to a partitioned semi join:\n$plan")
    } finally graft.CheckpointBlocks.release(stored)
  }

  test("the streaming exact-dedup store probe broadcasts both legs; the hash history never exchanges") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.{col, md5}
    import graft.streaming.CorpusStream
    // batch ▷ store cannot broadcast its left side, so the naive anti
    // join silently shuffles the whole hash history once per batch as
    // soon as it outgrows the planner threshold; the decomposed shape
    // (store ⋉ broadcast(batch) feeding a bounded broadcast anti) must
    // hold with auto-broadcast OFF — the hints, not planner stats,
    // carry it
    val docs = Tables(spark, sfDir, "documents")
    val hashed = docs.select(col("doc_id"),
      md5(col("text")).as("content_hash"))
    val store = docs.select(md5(col("text")).as("content_hash"))
      .localCheckpoint(true)
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = CorpusStream.exactStoreProbe(hashed, store,
            batchN = 10L, broadcastLimit = 1000000L)
          .queryExecution.sparkPlan
        val semi = plan.collect {
          case j: BroadcastHashJoinExec if j.joinType.toString == "LeftSemi" => j
        }
        val anti = plan.collect {
          case j: BroadcastHashJoinExec if j.joinType.toString == "LeftAnti" => j
        }
        assert(semi.size === 1 && anti.size === 1,
          s"expected broadcast semi probe + broadcast anti cut, got:\n$plan")
        assert(plan.collect { case x: ShuffleExchangeExec => x }.isEmpty,
          s"neither the store nor the batch may exchange:\n$plan")
        // past the measured limit the dispatch flips to the partitioned
        // anti-join (the O(store) shuffle is then the honest price)
        val big = CorpusStream.exactStoreProbe(hashed, store,
            batchN = 10L, broadcastLimit = 5L)
          .queryExecution.sparkPlan
        assert(big.collect {
          case j: SortMergeJoinExec if j.joinType.toString == "LeftAnti" => j
          case j: ShuffledHashJoinExec if j.joinType.toString == "LeftAnti" => j
        }.nonEmpty, s"over-limit batch must take the partitioned anti:\n$big")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally graft.CheckpointBlocks.release(store)
  }

  test("graph append's reverse-edge cut broadcasts the batch ids even with auto-broadcast off") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    import graft.operators.KnnGraph
    // appendDelta's step-3b anti probe: batch ids are micro-batch-sized
    // by the dispatch; the k·|B| edge relation must never exchange to
    // meet them (knng_app's flat slope depends on it). The returned
    // delta is checkpointed, so the shape is pinned on the extracted
    // production body.
    val e = Tables(spark, sfDir, "embeddings")
    val edges = e.select(col("vec_id").as("id"),
      (col("vec_id") + 1).as("nid"),
      org.apache.spark.sql.functions.lit(0.5).as("sim"))
    val ids = e.filter(col("vec_id") % 7 === 0).select(col("vec_id").as("id"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try KnnGraph.reverseEdges(edges, ids).queryExecution.sparkPlan
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val anti = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.toString == "LeftAnti" => j
    }
    assert(anti.size === 1,
      s"expected one broadcast LeftAnti batch-id cut, got:\n$plan")
    assert(plan.collect { case x: ShuffleExchangeExec => x }.isEmpty,
      s"the edge side must not exchange to meet the batch ids:\n$plan")
  }

  test("a claimed sized checkpoint joins on its key without a store-side exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions.col
    // the kNN-family contract: the corpus/adjacency checkpoints carry a
    // CLAIMED hash layout (AQE drops the partitioning a localCheckpoint
    // would otherwise record), so every per-hop key-equi join exchanges
    // only the moving side. Auto-broadcast off: the shape must come
    // from the claim, not planner stats.
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val store = graft.CheckpointBlocks.sizedCheckpoint(e, Seq("id"), 2000L)
    try {
      val probe = spark.range(50).select((col("id") * 3).as("id"))
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan =
        try probe.join(store, Seq("id")).queryExecution.sparkPlan
        finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      assert(plan.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"expected a sort-merge join under auto-broadcast off:\n$plan")
      // at most the PROBE side exchanges (zero when the claimed layout
      // is single-partition and the probe collapses into it); the
      // store-side Scan ExistingRDD must feed the join directly
      val exchanges = plan.collect { case x: ShuffleExchangeExec => x }
      assert(exchanges.size <= 1,
        s"only the probe side may exchange against a claimed store:\n$plan")
      val smj = plan.collect { case j: SortMergeJoinExec => j }.head
      assert(smj.right.collect {
        case x: ShuffleExchangeExec => x }.isEmpty,
        s"the claimed store side must not exchange:\n$plan")
    } finally graft.CheckpointBlocks.release(store)
  }

  test("PQ encode is a pure projection: no join, no aggregate, no exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.functions.col
    // the per-row argmin replaced the |sv|·Ks broadcast join and its
    // min(struct) aggregate — a regression back to the join would
    // re-shuffle every encode pass (train keeps its join on purpose:
    // the member sums' fold order is part of the committed surface)
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val cb = graft.operators.Pq.train(e, "id", "embedding", 4, 8, 0)
    val plan = graft.operators.Pq.encode(e, "id", "embedding", cb, 4, 16)
      .queryExecution.sparkPlan
    assert(plan.collect { case j: BaseJoinExec => j }.isEmpty,
      s"encode must not join:\n$plan")
    assert(plan.collect { case a: BaseAggregateExec => a }.isEmpty,
      s"encode must not aggregate:\n$plan")
    assert(plan.collect { case x: ShuffleExchangeExec => x }.isEmpty,
      s"encode must not exchange:\n$plan")
  }

  test("filtered ANN search re-shuffles its candidate relation exactly once (the top-k window)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    // pin the OPERATOR's plan (the declared x114 serves a shared
    // checkpointed memo): (qid, nid) is unique by construction — one
    // cell per stored vector, distinct probe ranks per query — so the
    // candidate relation must flow cell-join → top-k window with ONE
    // hash exchange. A defensive distinct() regression would add a
    // second exchange over the operator's dominant intermediate.
    val e = Tables(spark, sfDir, "embeddings")
    val idx = Similarity.ivfBuild(e, "vec_id", "embedding", nlist = 8)
    val plan = Similarity.ivfSearchFilteredKept(idx.centroids,
        idx.assignments.filter(col("nid") % 3 === 0),
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 3, probeEff = 2)
      .queryExecution.sparkPlan
    val hashEx = plan.collect {
      case x: ShuffleExchangeExec
        if x.outputPartitioning.toString.contains("hashpartitioning") => x
    }
    // two windows hash-exchange: the bounded Q-row probe ranking and
    // the top-k over candidates — nothing else may shuffle
    assert(hashEx.size <= 2,
      s"expected <=2 hash exchanges (probe rank + top-k), got ${hashEx.size}:\n$plan")
  }
}
