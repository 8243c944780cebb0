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

  /** [[strip]] that additionally RECLAIMS the hash partitioning a
    * checkpoint loses under AQE. `Dataset.localCheckpoint` records the
    * physical plan's output partitioning in the LogicalRDD, but with
    * adaptive execution the physical root is an AdaptiveSparkPlan whose
    * partitioning reads `UnknownPartitioning` at checkpoint time — so a
    * frame that was JUST repartitioned by its join key checkpoints as
    * unpartitioned, and every downstream join re-exchanges it.
    *
    * The caller asserts (by contract, having called `repartition(n,
    * keys)` immediately before the checkpoint) that the materialized
    * blocks ARE hash(keys)-partitioned; this rewraps the LogicalRDD
    * with that `HashPartitioning` so EnsureRequirements can elide the
    * store-side Exchange on every later key-equi join against it. An
    * over-claim would silently mis-join — only call on the result of a
    * `repartition(n, keys)` with the SAME keys and n equal to the
    * RDD's actual partition count.
    */
  def stripClaiming(df: org.apache.spark.sql.DataFrame, keys: Seq[String])
      : org.apache.spark.sql.DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[SparkSession]
        val attrs = keys.map(k => lr.output.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"stripClaiming: no output column '$k' in ${lr.output.map(_.name)}")))
        val part = org.apache.spark.sql.catalyst.plans.physical
          .HashPartitioning(attrs, lr.rdd.getNumPartitions)
        Dataset.ofRows(session,
          lr.copy(outputPartitioning = part)(
            session, originStats = None, originConstraints = None))
      case _ => df
    }
}
