package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.CoLocatedJoin

/** Co-located bucketed join: correctness + the scale property itself —
  * the join plan must contain zero shuffle exchanges, proving the
  * write-time bucketing is what partitions the join.
  */
class CoLocatedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("co-bucketed tables sort-merge join with zero shuffles") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a non-broadcast join so the assertion tests bucketing, not
    // broadcast, as the shuffle-avoidance mechanism
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      CoLocatedJoin.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
      CoLocatedJoin.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)

      val joined = CoLocatedJoin.join(spark, "bkt_orders", "bkt_lineitem",
        "o_orderkey")
      // sparkPlan, NOT executedPlan: if a shuffle regressed into this
      // plan, AQE would wrap executedPlan in an AdaptiveSparkPlanExec
      // LEAF that hides it from collect — the assertion would pass on
      // exactly the regression it guards against
      val shuffles = joined.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free co-located join, got:\n${joined.queryExecution.sparkPlan}")

      // same result as the plain (shuffling) join
      val expected = orders.join(lineitem, "o_orderkey")
      assert(joined.count() === expected.count())
      val l = joined.agg(sum(col("l_quantity").cast("long"))).as[Long].head()
      val r = expected.agg(sum(col("l_quantity").cast("long"))).as[Long].head()
      assert(l === r)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
