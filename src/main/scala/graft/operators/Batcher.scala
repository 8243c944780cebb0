package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OP-43: page-range batching (reference release_batcher.py:14-46).
  *
  * For each release row with a `page_count`, emits one row per batch:
  * (batch_number, start_page_num, end_page_num) with end clamped to
  * page_count. Declarative explode(sequence(...)) — the fan-out that the
  * reference performs by looping and SQS-sending becomes partitionable
  * rows (one partition ≈ one batch at scale; SURVEY §3.4).
  */
object Batcher {

  def pageRanges(releases: DataFrame, batchSize: Int = 10): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    releases
      .withColumn("start_page_num",
        explode(sequence(lit(1), greatest(col("page_count"), lit(1)), lit(batchSize))))
      .withColumn("batch_number",
        (((col("start_page_num") - 1) / batchSize).cast("int") + 1))
      .withColumn("end_page_num",
        least(col("start_page_num") + (batchSize - 1), col("page_count")).cast("int"))
      .withColumn("start_page_num", col("start_page_num").cast("int"))
  }
}
