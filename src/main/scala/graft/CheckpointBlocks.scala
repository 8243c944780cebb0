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
}
