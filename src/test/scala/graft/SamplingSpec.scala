package graft

import org.apache.spark.sql.functions._
import graft.operators.SamplingQueries

/** The sampling family's value proposition is determinism properties no
  * seeded RNG sample has — prove them directly rather than relying on
  * the oracle hash alone.
  */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("stratified sample keeps every minority row and ~34% of the majority") {
    val out = SamplingQueries.queries("x27_stratified_sample")(spark, sfDir)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val inLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap

    inLang.keys.filter(_ != "en").foreach { l =>
      assert(byLang(l) === inLang(l), s"minority class $l must keep every row")
    }
    val frac = byLang("en").toDouble / inLang("en")
    // 86/256 = 0.336; md5 buckets are near-uniform, wide tolerance
    assert(frac > 0.2 && frac < 0.5, s"en kept fraction $frac")
  }

  test("sample membership is invariant under repartitioning") {
    def ids(parts: Int): Set[Long] =
      docs.repartition(parts)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= "19")
        .select("doc_id").as[Long].collect().toSet
    assert(ids(1) === ids(7))
  }

  test("a row's split assignment never changes when the corpus grows") {
    val full = SamplingQueries.queries("x22_split_assign")(spark, sfDir)
      .as[(Long, String)].collect().toMap
    // same operator over a half-corpus "earlier snapshot"
    val halfDocs = docs.filter(col("doc_id") % 2 === 0)
    val half = halfDocs
      .select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 2) <= "cb", "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 2) <= "e5", "val")
          .otherwise("test").as("split"))
      .as[(Long, String)].collect().toMap
    half.foreach { case (id, split) =>
      assert(full(id) === split, s"doc $id changed split when the corpus grew")
    }
    assert(half.nonEmpty)
  }

  test("sourceMix: weight 1 keeps all, weight 0 and absent sources keep none") {
    val rows = (0L until 256L).flatMap(i =>
      Seq((i, "all"), (i + 1000, "none"), (i + 2000, "unlisted")))
      .toDF("id", "src")
    val kept = SamplingQueries.sourceMix(rows, "id", "src",
        Map("all" -> 1.0, "none" -> 0.0))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(kept === Map("all" -> 256L),
      "weight-1 keeps every row; weight-0 and unlisted sources keep none")
  }

  test("sourceMix fraction tracks the weight on uniformly-spread keys") {
    val rows = (0L until 4096L).map(i => (i, "s")).toDF("id", "src")
    val n = SamplingQueries.sourceMix(rows, "id", "src", Map("s" -> 0.25))
      .count()
    // 64/256 buckets of a uniform hash: binomial around 1024
    assert(n > 850 && n < 1200, s"expected ~1024 of 4096, got $n")
  }

  /** The x22 split assignment, recomputed independently on the driver. */
  private def driverSplit(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = md.take(1).map(b => f"$b%02x").mkString
    if (hex <= "cb") "train" else if (hex <= "e5") "val" else "test"
  }

  test("x100 leakage audit finds exactly the planted dup pairs that straddle train/eval") {
    // the docsWithDups fixture copies id<50 verbatim to id+10000; the
    // expected leak set is computable on the driver from the split
    // hash alone (copy pairs where one side trains and the other evals)
    val nDocs = docs.count()
    val ids = (0L until math.min(50L, nDocs))
    val expected = ids.flatMap { id =>
      val (s1, s2) = (driverSplit(id), driverSplit(id + 10000))
      Seq(
        if (s1 == "train" && s2 != "train") Some((id, id + 10000, s2)) else None,
        if (s2 == "train" && s1 != "train") Some((id + 10000, id, s1)) else None
      ).flatten
    }.toSet
    assert(expected.nonEmpty, "fixture must plant at least one straddling pair")
    val got = SparkEntry.queries("x100_split_leakage")(spark, sfDir)
      .as[(Long, Long, String)].collect().toSet
    // planted pairs must all be reported; anything extra must be a
    // genuine same-content pair in the raw corpus — verify by hash
    assert(expected.subsetOf(got), s"missing ${expected.diff(got)}")
    val extra = got.diff(expected)
    if (extra.nonEmpty) {
      val norm = docs.select(col("doc_id"),
        md5(lower(trim(col("text")))).as("h"))
        .as[(Long, String)].collect().toMap
      extra.foreach { case (a, b, _) =>
        val (ra, rb) = (a % 10000, b % 10000)
        assert(norm.get(ra).isDefined && norm(ra) === norm(rb),
          s"extra pair ($a, $b) must share a content hash")
      }
    }
  }

  test("x110 group split co-locates every duplicate pair; leakage gate is empty") {
    val split = SparkEntry.queries("x110_group_split")(spark, sfDir)
      .as[(Long, String)].collect().toMap
    // the verbatim copies (id<50 -> id+10000) MUST share their split —
    // the contract the id split provably violates (x100 finds leaks)
    (0L until 50L).filter(split.contains).foreach { id =>
      assert(split(id) === split(id + 10000),
        s"copy pair ($id, ${id + 10000}) split apart: ${split(id)} vs ${split(id + 10000)}")
    }
    // all three splits populated (the content hash spreads like any md5)
    assert(split.values.toSet === Set("train", "val", "test"))
    assert(SparkEntry.queries("x110g_group_leakage_gate")(spark, sfDir).count() === 0,
      "content-group splitting makes exact-dup leakage impossible")
    // the contrast that motivates the operator: the id split DOES leak
    assert(SparkEntry.queries("x100_split_leakage")(spark, sfDir).count() > 0)
  }

  test("x100s rates agree with the pair relation") {
    val pairs = SparkEntry.queries("x100_split_leakage")(spark, sfDir)
    val fromPairs = pairs.groupBy("split")
      .agg(countDistinct(col("eval_id")).as("leaked"))
      .as[(String, Long)].collect().toMap
    val rate = SparkEntry.queries("x100s_leakage_rate")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(rate === fromPairs)
  }

  test("x104 priorities match an independent JVM re-derivation of the A-ES key") {
    val got = SparkEntry.queries("x104_weighted_sample")(spark, sfDir)
      .as[(Long, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, w, pri) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex12 = md.take(6).map(b => f"$b%02x").mkString
      val u = (java.lang.Long.parseLong(hex12, 16) + 0.5) / 281474976710656.0
      val want = BigDecimal(math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pri === want, s"doc $id: got $pri want $want")
    }
    // and the emitted set IS the top-k of the full corpus by that key
    assert(got.sortBy { case (id, _, p) => (-p, id) }.toSeq === got.toSeq)
  }

  test("weightedSample favors heavy rows and is partitioning-invariant") {
    // ids 1..400: weight 1 below 200, weight 9 above — expected heavy
    // share of an 80-draw A-ES sample is ~90%; the fixture is fixed so
    // the assertion is deterministic, the bound leaves hash-luck room
    val rows = (1L to 400L).map(i => (i, if (i <= 200) 1.0 else 9.0))
    val df = rows.toDF("id", "w")
    val s1 = SamplingQueries.weightedSample(df, "id", col("w"), 80)
      .as[(Long, Double, Double)].collect()
    val heavy = s1.count(_._2 == 9.0)
    assert(heavy > 60, s"heavy rows in sample: $heavy of 80")
    // identical selection and order under a different partitioning
    val s2 = SamplingQueries.weightedSample(df.repartition(7), "id", col("w"), 80)
      .as[(Long, Double, Double)].collect()
    assert(s1.toSeq === s2.toSeq)
  }
}
