package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for algebraic aggregates — the
  * materialized-view refresh a warehouse runs per ingest batch: keep a
  * PARTIAL-aggregate relation per key (cnt, sum, min, max), and fold
  * each new batch in by re-aggregating partials, never re-scanning
  * history. This is the same partial/final algebra Spark's own
  * hash-aggregate uses across shuffle; persisting the partial relation
  * (a plain parquet shape) turns it into cross-batch state — the
  * CorpusStream ledger pattern generalized to any algebraic aggregate.
  *
  * Values ride as exact integers (the engine's cents convention): the
  * merged sums are then order-free, so a merged view hash-matches a
  * from-scratch aggregation bit-for-bit, which is exactly what the x77
  * oracle checks.
  */
object IncrementalAgg {

  /** Partial-aggregate relation of one batch: per `keys`,
    * (cnt, sum, min, max) over the integral `valueCol`.
    */
  def partials(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum"),
        min(col(valueCol)).as("min"), max(col(valueCol)).as("max"))

  /** Fold any number of partial relations into the merged view —
    * re-aggregation of partials (sum of cnts/sums, min of mins, max of
    * maxes). Associative and commutative, so batches can merge in any
    * order and a stored view absorbs a delta without touching history.
    */
  def merge(keys: Seq[String], parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial relation")
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum")).as("sum"),
        min(col("min")).as("min"), max(col("max")).as("max"))
  }
}
