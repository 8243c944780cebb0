package graft

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SketchQueries

/** Sketch estimators: error bounds vs the exact aggregates, and the
  * exact-median baseline vs a from-first-principles computation. The
  * empty-gate property of x17g/x18g is asserted by QueriesSmokeSpec;
  * here the bounds are checked directly against exact values.
  */
class SketchSpec extends SparkSpecBase {

  test("approx distinct is within 5% of exact per group") {
    val approx = SketchQueries.queries("x17_approx_distinct")(spark, sfDir)
    val exact = Tables(spark, sfDir, "events").groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(a - e) <= 0.05 * e,
        s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("exact median matches a sort-based computation") {
    val byQuery = SketchQueries.queries("x19_exact_median")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val manual = Tables(spark, sfDir, "events")
      .select(col("event_type"), col("value"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rows) =>
        val vs = rows.map(_.getDouble(1)).sorted
        val rank = 0.5 * (vs.length - 1)
        val (lo, hi) = (vs(rank.toInt), vs(math.ceil(rank).toInt))
        val g = rank - rank.toInt
        t -> BigDecimal(lo + g * (hi - lo))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    assert(byQuery == manual)
  }

  test("approx median lands inside each group's value range") {
    val rows = SketchQueries.queries("x18_approx_median")(spark, sfDir)
      .join(Tables(spark, sfDir, "events")
          .groupBy(col("event_type"))
          .agg(min(col("value")).as("lo"), max(col("value")).as("hi")),
        "event_type")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("approx_median")
      assert(m >= r.getAs[Double]("lo") && m <= r.getAs[Double]("hi"))
    }
  }
}
