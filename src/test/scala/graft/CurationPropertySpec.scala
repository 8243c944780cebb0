package graft

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._
import graft.operators.{BpeQueries, PiiQueries, ZOrder}

/** Property-based checks for the round-10 primitives, against
  * from-first-principles reference computations on scalacheck-generated
  * inputs (fixed seeds — deterministic, no flaky CI):
  *
  *  - morton2 must be injective and equal the bit-by-bit interleave
  *  - luhnValid must agree with a digit-walk reference on random runs
  *  - one BPE merge pass must equal a reference greedy fold
  */
class CurationPropertySpec extends SparkSpecBase {
  import spark.implicits._

  test("morton2 equals the bit-by-bit interleave on random 16-bit pairs") {
    val pairGen = Gen.listOfN(200,
      Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)))
    def mortonRef(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | ((x >> i & 1L) << (2 * i)) | ((y >> i & 1L) << (2 * i + 1))
      }
    for (s <- 1L to 5L) {
      val pairs = pairGen.pureApply(Gen.Parameters.default, rng.Seed(s)).distinct
      val got = pairs.toDF("x", "y")
        .select($"x", $"y", ZOrder.morton2($"x", $"y").as("z"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (x, y, z) =>
        assert(z === mortonRef(x, y), s"morton($x, $y)")
      }
      assert(got.map(_._3).distinct.length === pairs.length, "injective")
    }
  }

  test("luhnValid agrees with the reference on random digit runs of any length") {
    def luhnRef(num: String): Boolean =
      num.reverse.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    val numGen = Gen.listOfN(150, for {
      len <- Gen.choose(1, 20)
      ds <- Gen.listOfN(len, Gen.choose(0, 9))
    } yield ds.mkString)
    for (s <- 1L to 5L) {
      val nums = numGen.pureApply(Gen.Parameters.default, rng.Seed(s)).distinct
      val got = nums.toDF("n")
        .select($"n", PiiQueries.luhnValid($"n").as("v"))
        .as[(String, Boolean)].collect()
      got.foreach { case (n, v) => assert(v === luhnRef(n), s"luhn($n)") }
    }
  }

  test("applyMerge equals a reference greedy left-to-right fold") {
    def mergeRef(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r)
          acc.init :+ (l + r)
        else acc :+ s
      }
    val symGen = Gen.listOfN(120, for {
      len <- Gen.choose(0, 10)
      ss <- Gen.listOfN(len, Gen.oneOf("a", "b", "ab", "c"))
    } yield ss)
    for (s <- 1L to 5L; (l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "c"))) {
      val inputs = symGen.pureApply(Gen.Parameters.default, rng.Seed(s))
      val got = inputs.toDF("syms")
        .select($"syms", BpeQueries.applyMerge($"syms", l, r).as("m"))
        .as[(Seq[String], Seq[String])].collect()
      got.foreach { case (in, out) =>
        assert(out === mergeRef(in, l, r), s"merge($l,$r) on $in")
      }
    }
  }
}
