package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the block-manager storage behind localCheckpoint'd frames.
  *
  * `Dataset.unpersist` is the WRONG tool for these: it only asks the
  * CacheManager to uncache the query, and the CacheManager never knows
  * about checkpoint RDDs — `localCheckpoint` persists the underlying
  * RDD directly. (This is also why `catalog.clearCache()` can't drop
  * them and Bench sweeps `sc.getPersistentRDDs` between passes.) The
  * blocks do get reclaimed eventually — ContextCleaner, after the frame
  * becomes unreachable and a GC runs — but a long-lived session that
  * drops a memo wants the storage back NOW, not at the next full GC.
  *
  * [[release]] reaches the actual RDD through the frame's ROOT
  * LogicalRDD node and unpersists it — and only the root: a derived
  * frame (a projection/filter OVER a checkpoint) is refused, because
  * its leaf checkpoint may well be alive elsewhere and destroying it
  * would poison every sibling consumer. No-op for anything that is not
  * itself a checkpoint result.
  *
  * CONTRACT: only call on DEAD frames. A local checkpoint's lineage is
  * truncated, so once its blocks are dropped the frame cannot be
  * recomputed — any later action on it throws "checkpoint block not
  * found". Valid call sites are dropped memo entries, putIfAbsent
  * losers, and superseded per-round iteration state.
  */
object CheckpointBlocks {
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => () // derived frame: never touch an upstream checkpoint
    }

  /** `localCheckpoint(eager)` that also DROPS the checkpoint's origin
    * constraints. A plain local checkpoint carries its input plan's
    * constraints verbatim (LogicalRDD bypasses the prune-to-output
    * filter); when the checkpointed frame is later self-joined or
    * unioned, relation deduplication re-aliases one instance's output
    * while the carried constraints still name the OLD expression ids,
    * and Union constraint rewriting faults with `key not found: id#N`
    * (Spark 4.1.2). Any checkpoint whose INPUT went through a Filter
    * and whose result feeds a self-join/union must use this form —
    * un-filtered inputs carry no constraints and are safe either way.
    * Constraints are an optimizer hint only; dropping them never
    * changes results. [[release]] works on the result as usual (same
    * underlying checkpoint RDD).
    */
  def cleanCheckpoint(df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.GraftCleanCheckpoint.strip(
      df.localCheckpoint(true))

  /** Rows per checkpoint partition for [[sizedCheckpoint]] — the
    * size-adaptive replacement for checkpointing iteration state at
    * whatever partition count the producing plan happened to have
    * (usually `spark.sql.shuffle.partitions`). Local measurement
    * (sf0.1, 32 cores): the kNN family's checkpoints held ~60 rows per
    * partition, so every one of the ~200 jobs per build/search ran
    * 32-task stages whose per-task shuffle-file cost dominated (88 of
    * 214 task-CPU-seconds in x125 were shuffle WRITE time alone).
    * Overridable via SPARK_GRAFT_CKPT_ROWS_PER_PART; the default
    * targets partitions of tens of MB for vector rows — the guide's
    * 100 MB - 1 GB post-shuffle partition rule, derived from measured
    * row count rather than a core-count constant.
    */
  val RowsPerPartition: Long =
    sys.env.get("SPARK_GRAFT_CKPT_ROWS_PER_PART")
      .flatMap(_.toLongOption).filter(_ >= 1L).getOrElse(65536L)

  /** Checkpoint `df` hash-partitioned by `keys` at a partition count
    * derived from `estRows` (consolidate-only: never more partitions
    * than the plan would otherwise produce, so no new fan-out shuffle
    * appears at scale), and CLAIM that partitioning on the resulting
    * LogicalRDD (see GraftCleanCheckpoint.stripClaiming — AQE drops
    * it otherwise). Downstream effect, measured in plans: every
    * key-equi join against the checkpoint stops re-exchanging the
    * checkpointed side, and at fixture scale the iteration state
    * collapses to single-task stages instead of
    * `spark.sql.shuffle.partitions`-task ones.
    *
    * ONLY for frames whose downstream math is partition-layout-proof
    * (integer sums, per-row expressions, windows with total
    * tie-broken orders — the kNN graph family's documented
    * bit-determinism discipline). Frames feeding order-sensitive
    * double aggregations (k-means member sums, GD partials) must keep
    * their natural layout: a different accumulation order moves the
    * last float bits, and those families are no_oracle precisely
    * because their outputs depend on it.
    */
  /** Size-derived partition count: estRows at [[RowsPerPartition]],
    * floored at 1, capped at the cluster's parallelism. Used both for
    * sized checkpoints and for the EXPLICIT repartitions iterative
    * operators place before their dedup+window merges — an explicit
    * count keeps AQE from spending a re-planning cycle coalescing a
    * shuffle whose right size was known from the operator's own row
    * bound.
    */
  def partitionsFor(spark: org.apache.spark.sql.SparkSession,
                    estRows: Long): Int =
    math.max(1L, math.min(
      (math.max(estRows, 0L) + RowsPerPartition - 1) / RowsPerPartition,
      spark.sparkContext.defaultParallelism.toLong)).toInt

  def sizedCheckpoint(df: DataFrame, keys: Seq[String],
                      estRows: Long): DataFrame = {
    val n = partitionsFor(df.sparkSession, estRows)
    org.apache.spark.sql.classic.GraftCleanCheckpoint.stripClaiming(
      df.repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
        .localCheckpoint(true),
      keys)
  }

  /** Checkpoint a frame whose plan ALREADY established a hash(keys)
    * layout (an explicit `repartition(n, keys)` upstream, with only
    * layout-preserving operators — project/filter/window/partial-agg —
    * in between) and claim that layout on the LogicalRDD. Avoids the
    * double exchange [[sizedCheckpoint]] would pay re-partitioning an
    * already-partitioned plan. The claim contract is the caller's:
    * claiming a layout the data does not have mis-joins silently.
    */
  def claimedCheckpoint(df: DataFrame, keys: Seq[String]): DataFrame =
    org.apache.spark.sql.classic.GraftCleanCheckpoint.stripClaiming(
      df.localCheckpoint(true), keys)

  /** [[sizedCheckpoint]] over an ALREADY-materialized checkpoint whose
    * row count the caller just measured, releasing the source blocks on
    * every path (the resize reads cached blocks, so the extra pass is
    * one cheap narrow job — paid once, against the dozens of
    * downstream jobs the consolidated layout speeds up).
    */
  def resizeCheckpoint(ck: DataFrame, keys: Seq[String],
                       estRows: Long): DataFrame =
    try sizedCheckpoint(ck, keys, estRows) finally release(ck)
}
