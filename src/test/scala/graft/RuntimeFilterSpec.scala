package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter pruning: for a shuffle join against a SELECTIVE
  * dimension, Catalyst injects a bloom filter built from the dim keys
  * into the fact side BEFORE the shuffle — fact rows that cannot match
  * never leave their scan partition. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the matching
  * fraction; this spec pins that the rewrite actually engages on our
  * join shape (thresholds lowered to fire at test scale).
  */
class RuntimeFilterSpec extends SparkSpecBase {

  private val confs = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("selective dim join injects a bloom probe into the fact side") {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val dim = spark.read.parquet(s"$sfDir/orders.parquet")
        .filter(col("o_totalprice") > 400000) // selective: few keys survive
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a bloom runtime filter on the fact scan, got:\n$optimized")

      // and the filtered join still returns exactly the unfiltered rows
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      assert(joined.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
