package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.{GraftExtensions, SortedLongIntersectCount}

/** The exact-Jaccard verification kernel: two-pointer |A ∩ B| over
  * sorted array<bigint>, exercised through BOTH execution paths —
  * whole-stage codegen (DataFrame) and interpreted eval (direct
  * Expression.eval), which must agree everywhere.
  */
class SortedIntersectSpec extends SparkSpecBase {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def viaDf(a: Seq[Long], b: Seq[Long]): Any = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(GraftExtensions.sortedIntersectCount(col("a"), col("b")))
      .collect()(0)
    if (r.isNullAt(0)) null else r.getLong(0)
  }

  private def viaEval(a: Seq[Long], b: Seq[Long]): Any = {
    def lit(x: Seq[Long]) =
      Literal(ArrayData.toArrayData(x.toArray), ArrayType(LongType, containsNull = false))
    SortedLongIntersectCount(lit(a), lit(b)).eval(null)
  }

  private val cases: Seq[(Seq[Long], Seq[Long], Long)] = Seq(
    (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L), 2L),
    (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
    (Seq(1L, 2L), Seq(3L, 4L), 0L),
    (Seq.empty[Long], Seq(1L), 0L),
    (Seq.empty[Long], Seq.empty[Long], 0L),
    // negative hashes sort below positive — xxhash64 output spans Long
    (Seq(Long.MinValue, -5L, 0L, Long.MaxValue), Seq(-5L, Long.MaxValue), 2L),
    // duplicates advance both cursors: multiset-min semantics
    (Seq(1L, 1L, 2L), Seq(1L, 1L, 1L, 2L), 3L),
    // asymmetric sizes
    ((1L to 100L), Seq(50L, 101L), 1L))

  test("codegen and interpreted paths agree on every case") {
    for ((a, b, want) <- cases) {
      assert(viaDf(a, b) === want, s"codegen: $a ∩ $b")
      assert(viaEval(a, b) === want, s"eval: $a ∩ $b")
    }
  }

  test("null array yields null on both paths") {
    val r = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(GraftExtensions.sortedIntersectCount(col("a"), col("b")))
      .collect()(0)
    assert(r.isNullAt(0))
    val nullLit = Literal(null, ArrayType(LongType))
    val arrLit = Literal(ArrayData.toArrayData(Array(1L)), ArrayType(LongType))
    assert(SortedLongIntersectCount(arrLit, nullLit).eval(null) === null)
  }

  test("null ELEMENT yields null, never a partial count") {
    // element nulls are only reachable when the array type admits them
    val df = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 3L)))
      .toDF("a", "b")
      .select(GraftExtensions.sortedIntersectCount(col("a"), col("b")))
    assert(df.collect()(0).isNullAt(0))
  }

  test("type mismatch is an analysis error, not a runtime surprise") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Seq(1, 2), Seq(1L))).toDF("a", "b")
        .select(GraftExtensions.sortedIntersectCount(col("a"), col("b")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("sorted_intersect_count") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("countAtLeast: exact count when reachable, -1 when doomed (randomized)") {
    import graft.functions.SortedIntersectKernel
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      val exact = a.toSet.intersect(b.toSet).size.toLong
      val minReq = rnd.nextInt(20).toLong
      val got = SortedIntersectKernel.countAtLeast(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b), minReq)
      if (exact >= minReq) assert(got === exact, s"minReq=$minReq a=${a.toSeq} b=${b.toSeq}")
      else assert(got === -1L, s"minReq=$minReq exact=$exact got=$got")
    }
  }

  test("countAtLeast in a DataFrame: survivors exact, prunes flagged") {
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L, 5L), 3L), // exact 3 >= 3
      (Seq(1L, 2L, 3L, 4L), Seq(2L, 3L, 4L, 5L), 4L), // exact 3 < 4
      (Seq.empty[Long], Seq(1L), 1L)
    ).toDF("a", "b", "m")
      .select(GraftExtensions.sortedIntersectCountAtLeast(
        col("a"), col("b"), col("m")).as("c"))
      .as[Long].collect().toSeq
    assert(df === Seq(3L, -1L, -1L))
  }
}
