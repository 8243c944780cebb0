package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Unit tests for the column-level building blocks, incl. the reference
  * warts (take-while discard after gap; whitespace-only strings are
  * truthy and join).
  */
class GraftFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def twj(items: Seq[String]): String = {
    val df = items.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("ord", "v")
    df.agg(takeWhileJoin(collect_list(struct($"ord", $"v"))).as("j"))
      .collect()(0).getString(0)
  }

  test("takeWhileJoin joins the leading non-empty run") {
    assert(twj(Seq("hhhhh", "lskdjf", "", "adba", "dlskj")) === "hhhhh lskdjf")
  }
  test("takeWhileJoin stops at null too") {
    assert(twj(Seq("a", null, "b")) === "a")
  }
  test("takeWhileJoin of leading empty is empty (fragments discarded)") {
    assert(twj(Seq("", "a", "b")) === "")
  }
  test("takeWhileJoin keeps whitespace-only items (truthy in the reference)") {
    // " ".strip() inside the fold doesn't happen; trim only at the end
    assert(twj(Seq("a", " ", "b")) === "a   b")
  }
  test("takeWhileJoin on empty group") {
    assert(twj(Seq.empty) === "")
  }
  test("takeWhileJoin is order-driven by ord, not input order") {
    val df = Seq((2L, "b"), (0L, "a"), (1L, ""), (3L, "c"))
      .toDF("ord", "v").repartition(3)
    val r = df.agg(takeWhileJoin(collect_list(struct($"ord", $"v"))))
      .collect()(0).getString(0)
    assert(r === "a")
  }

  test("normalizeToken matches reference header normalization") {
    val r = Seq("  NCA   Number ").toDF("c")
      .select(normalizeToken($"c")).collect()(0).getString(0)
    assert(r === "nca_number")
  }

  test("cosineSim: zero-norm vectors yield null, never a NaN that passes filters") {
    import graft.functions.GraftFunctions.cosineSim
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    val sims = df.select(cosineSim($"a", $"b").as("sim"))
      .as[Option[Double]].collect().toSeq
    assert(sims(0) === Some(1.0))
    assert(sims(1) === None, "zero vector must be null, not NaN")
    // and a similarity-threshold filter must NOT keep the zero vector
    assert(df.filter(cosineSim($"a", $"b") >= 0.9).count() === 1)
  }

  test("parseAmount coerces garbage to null, strips commas") {
    val r = Seq("1,234,567.89", "500.00 1000 500", "750.25", "N/A")
      .toDF("c").select(parseAmount($"c")).collect().map(x =>
        if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(r.toSeq === Seq(Some(1234567.89), None, Some(750.25), None))
  }

  test("cosineSim of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))).toDF("a", "b")
    val r = df.select(round(cosineSim($"a", $"b"), 6)).collect().map(_.getDouble(0))
    assert(r.toSeq === Seq(1.0, 0.0))
  }

  test("shingles produces sorted distinct word n-grams; short docs get one shingle") {
    val r = Seq("the quick brown fox", "hi").toDF("t")
      .select(shingles($"t", 3)).collect().map(_.getSeq[String](0))
    assert(r(0) === Seq("quick brown fox", "the quick brown"))
    assert(r(1) === Seq("hi"))
  }
}
