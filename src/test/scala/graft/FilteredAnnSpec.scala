package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Predicate-filtered ANN serving (x114): the predicate must live
  * INSIDE the cell scan. The naive alternative — search first, filter
  * the ranked output — computes top-k before the predicate, so at high
  * selectivity the k slots go to unfiltered rows and the TRUE filtered
  * neighbors vanish; this spec constructs that failure and proves the
  * operator immune, pins the measured-selectivity probe widening, and
  * pins the production pushdown claim (on a persisted index the
  * predicate reaches the parquet scan as a pushed filter).
  */
class FilteredAnnSpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic 8-dim fixture: the query points along e1; 30 "xx"
  // distractors hug the query (cos ~ 0.999); 6 "en" targets sit farther
  // out (cos ~ 0.9) — any unfiltered top-k is all distractors, so a
  // post-search filter keeps nothing
  private def vec(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(8)(0.0)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private lazy val corpus = {
    val distractors = (0 until 30).map { i =>
      (100L + i, vec(0 -> 1.0, 1 -> 0.01 * (i % 5 + 1), 2 -> 0.002 * i), "xx")
    }
    val targets = (0 until 6).map { j =>
      (200L + j, vec(0 -> 0.9, 3 -> (0.40 + 0.01 * j)), "en")
    }
    (distractors ++ targets).toDF("id", "v", "lang")
  }

  private lazy val query = Seq((1L, vec(0 -> 1.0))).toDF("id", "v")

  private def buildIndex() = {
    val idx = Similarity.ivfBuild(corpus, "id", "v", nlist = 4)
    // carry the metadata column on the assignment relation — the
    // stored-index layout a filtered deployment ships
    val withLang = idx.assignments
      .join(corpus.select(col("id").as("nid"), col("lang")), Seq("nid"))
    Similarity.IvfIndex(idx.centroids, withLang)
  }

  test("filter-after-top-k loses every true filtered neighbor; the operator keeps them") {
    val index = buildIndex()
    // naive: unfiltered search, predicate applied to the RANKED output
    val naive = Similarity.ivfSearch(index, query, "id", "v", k = 3, nprobe = 2)
      .join(corpus.select(col("id").as("nid"), col("lang")), Seq("nid"))
      .filter(col("lang") === "en")
    assert(naive.count() === 0,
      "the fixture must make the naive form lose ALL filtered neighbors")

    val filtered = Similarity.ivfSearchFiltered(index, query, "id", "v",
      k = 3, nprobe = 2, pred = col("lang") === "en")
      .orderBy(col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(query,
        corpus.filter(col("lang") === "en"), "id", "v", k = 3)
      .orderBy(col("rank"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(filtered === exact,
      s"operator must equal brute force on the filtered subset:\n" +
        s"  got      $filtered\n  expected $exact")
  }

  test("probe width widens from measured selectivity and caps at nlist") {
    val index = buildIndex()
    // 6 kept rows over 4 cells = 1.5 expected candidates per cell;
    // covering oversample*k = 12 needs 8 cells -> capped at nlist = 4,
    // i.e. every cell scanned even though the caller asked nprobe = 1 —
    // which is exactly why the result equals filtered brute force
    val got = Similarity.ivfSearchFiltered(index, query, "id", "v",
        k = 3, nprobe = 1, pred = col("lang") === "en")
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(query,
        corpus.filter(col("lang") === "en"), "id", "v", k = 3)
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect().toSeq
    assert(got === exact)
  }

  test("a low-selectivity predicate keeps the caller's nprobe (no needless widening)") {
    val index = buildIndex()
    // lang is non-null on every row: selecting everything keeps
    // perCell = N/nlist = 9, which already covers oversample*k at
    // nprobe from the caller — output must match the UNfiltered search
    val all = Similarity.ivfSearchFiltered(index, query, "id", "v",
        k = 3, nprobe = 2, pred = col("lang").isNotNull)
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect().toSeq
    val unfiltered = Similarity.ivfSearch(index, query, "id", "v",
        k = 3, nprobe = 2)
      .orderBy(col("rank")).as[(Long, Int, Long, Double)].collect().toSeq
    assert(all === unfiltered)
  }

  test("on a persisted index the predicate reaches the parquet scan (PushedFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val index = buildIndex()
    index.centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    index.assignments.write.mode("overwrite").parquet(s"$dir/assignments")
    val stored = Similarity.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
    val plan = Similarity.ivfSearchFiltered(stored, query, "id", "v",
        k = 3, nprobe = 2, pred = col("lang") === "en")
      .queryExecution.sparkPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(_.metadata.get("PushedFilters")
        .exists(_.contains("EqualTo(lang,en)"))),
      s"the predicate must be pushed into the assignments scan:\n$plan")
  }
}
