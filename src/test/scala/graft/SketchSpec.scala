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

  test("CMS: estimates dominate exact counts and the sketch merges by addition") {
    import spark.implicits._
    val a = (Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).toDF("user_id")
    val b = (Seq.fill(4)(1L) ++ Seq(4L)).toDF("user_id")
    val union = a.unionByName(b)
    // mergeability: union-of-sketches re-summed per cell == sketch of union
    val merged = SketchQueries.cmsSketch(a, "user_id")
      .unionByName(SketchQueries.cmsSketch(b, "user_id"))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .as[(Int, String, Long)].collect().toSet
    val direct = SketchQueries.cmsSketch(union, "user_id")
      .as[(Int, String, Long)].collect().toSet
    assert(merged === direct)
    // domination: est >= exact for every key (equality here — 4 keys
    // cannot collide into 256 columns on all 4 rows)
    val probes = Seq(1L, 2L, 3L, 4L).toDF("user_id")
    val est = SketchQueries.cmsEstimates(direct.toSeq.toDF("r", "c", "cnt"),
      probes, "user_id").as[(Long, Long)].collect().toMap
    assert(est === Map(1L -> 9L, 2L -> 3L, 3L -> 1L, 4L -> 1L))
  }
}
