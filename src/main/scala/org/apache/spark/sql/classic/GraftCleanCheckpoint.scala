package org.apache.spark.sql.classic

import org.apache.spark.sql.execution.LogicalRDD

/** Rewraps a `localCheckpoint` result WITHOUT its origin constraints.
  *
  * `LogicalRDD` overrides `constraints` to return the checkpointed
  * plan's constraints VERBATIM (bypassing `QueryPlan`'s prune-to-output
  * filter). When such a checkpoint later appears on both sides of a
  * self-join or in several branches of a Union, `DeduplicateRelations`
  * re-aliases one instance's OUTPUT but the carried origin constraints
  * still name the old expression ids — and `Union.rewriteConstraints`
  * then faults with `key not found: id#N` on any frame whose checkpoint
  * input carried a Filter (seen on Spark 4.1.2; plain un-filtered
  * inputs carry no constraints, which is why most checkpoints never
  * trip it). Dropping the origin constraints is sound: they are a pure
  * optimizer hint (filter inference), never a correctness input.
  *
  * Lives in this package only to reach `Dataset.ofRows`; the engine
  * calls it through `graft.CheckpointBlocks.cleanCheckpoint`.
  */
object GraftCleanCheckpoint {
  def strip(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        Dataset.ofRows(session,
          lr.copy()(session, originStats = None, originConstraints = None))
      case _ => df
    }
}
