package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnGraph, Similarity}

/** x120: NN-Descent kNN-graph construction. */
class KnnGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("graph structure: degree <= k, no self loops, no duplicate edges, ranks contiguous") {
    val g = KnnGraph.build(emb, "id", "vec", k = 5, rounds = 2)
    assert(g.filter(col("id") === col("nid")).count() === 0)
    assert(g.groupBy("id", "nid").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count() === 0)
    val deg = g.groupBy("id").agg(count(lit(1)).as("c"), max("rank").as("mr"))
    assert(deg.filter(col("c") > 5).count() === 0)
    assert(deg.filter(col("c") =!= col("mr")).count() === 0,
      "ranks must be 1..degree")
  }

  private def clustered = graft.operators.KnnGraph
    .graphCorpus(spark, sfDir)

  test("introduction rounds recover exact neighbors the seed misses; objective monotone") {
    // the low-intrinsic-dimension fixture: embedding corpora live on
    // manifolds, which is the premise NN-Descent diffuses along
    val (g, obj) = KnnGraph.buildWithObjective(clustered, "id", "vec",
      k = 5, rounds = 3)
    assert(obj.size === 4)
    assert(obj.sliding(2).forall { case Seq(a, b) => b >= a },
      s"objective fell: $obj")
    assert(obj.last > obj.head, "rounds must improve on the random seed")
    val exact = Similarity.bruteForceTopK(clustered, clustered, "id", "vec", 5)
      .select(col("qid").as("id"), col("nid"))
    val truthN = exact.count()
    val hit = exact.join(g.select("id", "nid"), Seq("id", "nid"), "left_semi")
      .count()
    val recall = hit.toDouble / truthN
    assert(recall >= 0.9, f"recall@5 $recall%.3f below 0.9 ($hit/$truthN)")
    // and the seed ALONE is measurably worse — the rounds earn their keep
    val (g0, _) = KnnGraph.buildWithObjective(clustered, "id", "vec",
      k = 5, rounds = 0)
    val hit0 = exact.join(g0.select("id", "nid"), Seq("id", "nid"), "left_semi")
      .count()
    assert(hit0 < hit, s"seed $hit0 !< refined $hit — rounds did nothing")
  }

  test("x120g gate: empty on the real build, fires on a tampered trajectory and a seed graph") {
    assert(SparkEntry.queries("x120g_knn_graph_gate")(spark, sfDir).count() === 0)
    val (g, obj) = KnnGraph.buildWithObjective(clustered, "id", "vec",
      k = 5, rounds = 0)
    // rounds=0: the hash seed almost surely misses exact neighbors ->
    // the recall clause must fire
    val seedViol = KnnGraph.gateRows(spark, sfDir, g, obj, minRecall = 0.9)
      .collect().map(_.getString(0))
    assert(seedViol.contains("recall"),
      s"seed graph passed the recall clause: ${seedViol.toSeq}")
    // a falling trajectory trips monotonicity
    val tampered = KnnGraph.gateRows(spark, sfDir, g,
      Seq(10L, 5L), minRecall = 0.0).collect().map(_.getString(0))
    assert(tampered.exists(_.startsWith("monotone")))
  }

  test("x122 beam search serves exact neighbors from cold entry points") {
    assert(SparkEntry.queries("x122g_knn_search_gate")(spark, sfDir).count() === 0)
    val res = SparkEntry.queries("x122_knn_graph_search")(spark, sfDir)
    assert(res.select("qid").distinct().count() === 10)
    assert(res.filter(col("qid") === col("nid")).count() === 0)
  }

  test("x122g clauses fire on a hops=0 beam and a tampered trajectory") {
    val corpus = clustered
    val graph = KnnGraph.build(corpus, "id", "vec", k = 5, rounds = 3)
    val (res0, obj0) = KnnGraph.searchWithObjective(graph, corpus,
      "id", "vec", corpus.filter(col("id") < 10), k = 5, beam = 16, hops = 0)
    val viol = KnnGraph.searchGateRows(spark, sfDir, res0, obj0,
      minRecall = 0.9).collect().map(_.getString(0))
    assert(viol.contains("recall"),
      s"an entry-set-only beam passed recall: ${viol.toSeq}")
    val tampered = KnnGraph.searchGateRows(spark, sfDir, res0,
      Seq(10L, 4L), minRecall = 0.0).collect().map(_.getString(0))
    assert(tampered.exists(_.startsWith("monotone")))
  }

  test("x124 beam operating curve: one row per beam, recall and cost monotone, gate empty") {
    val curve = SparkEntry.queries("x124_knn_beam_curve")(spark, sfDir)
      .collect()
    assert(curve.map(_.getInt(0)).toSeq === Seq(5, 8, 16))
    val recalls = curve.map(_.getLong(3)).toSeq
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a },
      s"recall not monotone in beam: $recalls")
    val costs = curve.map(_.getLong(4)).toSeq
    assert(costs.sliding(2).forall { case Seq(a, b) => b >= a },
      s"cand_pairs not monotone in beam: $costs")
    assert(recalls.last >= 900L, s"widest beam recall $recalls below floor")
    // a NARROW beam must actually be cheaper — the dial prices something
    assert(costs.head < costs.last, s"cost flat across beams: $costs")
    assert(SparkEntry.queries("x124g_knn_beam_gate")(spark, sfDir)
      .count() === 0)
  }

  test("x124g tolerance form: a fixture-drift dip passes, endpoint inversion fires") {
    import spark.implicits._
    // a mid-curve dip inside tolerance (30 pm recall, 4% cost) with a
    // sound endpoint — the drifted-fixture shape a correct
    // implementation may legitimately produce — must NOT block
    val dip = Seq(
      (5, 9L, 10L, 900L, 100L), (8, 9L, 10L, 870L, 96L),
      (16, 10L, 10L, 920L, 150L))
      .toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs")
    assert(KnnGraph.curveGateRows(spark, dip, minRecallPm = 0L)
      .count() === 0)
    // but an INVERTED dial (widest beam recalls/costs less than the
    // narrowest, each step inside tolerance) fires the endpoint clauses
    val inverted = Seq(
      (5, 9L, 10L, 900L, 100L), (8, 9L, 10L, 860L, 97L),
      (16, 9L, 10L, 820L, 95L))
      .toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs")
    val ie = KnnGraph.curveGateRows(spark, inverted, minRecallPm = 0L)
      .collect().map(_.getString(0))
    assert(ie.contains("recall_endpoint") && ie.contains("cost_endpoint"),
      ie.toSeq)
  }

  test("x124g clauses fire on a tampered curve and a floored one") {
    import spark.implicits._
    val falling = Seq(
      (5, 10L, 10L, 900L, 100L), (8, 8L, 10L, 800L, 90L))
      .toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs")
    val viol = KnnGraph.curveGateRows(spark, falling, minRecallPm = 0L)
      .collect().map(_.getString(0))
    assert(viol.exists(_.startsWith("recall_beam")), viol.toSeq)
    assert(viol.exists(_.startsWith("cost_beam")), viol.toSeq)
    val weak = Seq((5, 5L, 10L, 500L, 100L))
      .toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs")
    val fl = KnnGraph.curveGateRows(spark, weak, minRecallPm = 900L)
      .collect().map(_.getString(0))
    assert(fl.contains("floor"), fl.toSeq)
    val over = Seq((5, 12L, 10L, 1000L, 100L))
      .toDF("beam", "hits", "truth_n", "recall_pm", "cand_pairs")
    val ov = KnnGraph.curveGateRows(spark, over, minRecallPm = 0L)
      .collect().map(_.getString(0))
    assert(ov.exists(_.startsWith("hits_beam")), ov.toSeq)
  }

  test("x125 append: every batch node lands with K edges, gate empty") {
    assert(SparkEntry.queries("x125g_knn_append_gate")(spark, sfDir)
      .count() === 0)
    val merged = SparkEntry.queries("x125_knn_graph_append")(spark, sfDir)
    val (base, batch) = KnnGraph.appendSplit(spark, sfDir)
    val batchN = batch.count()
    assert(batchN > 0)
    val deg = merged.join(batch.select("id"), Seq("id"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("c"))
    assert(deg.filter(col("c") === 5).count() === batchN)
    // base nodes that gained a batch neighbor exist — the reverse-edge
    // step actually fired
    val reverseHits = merged
      .join(base.select("id"), Seq("id"), "left_semi")
      .join(batch.select(col("id").as("nid")), Seq("nid"), "left_semi")
      .count()
    assert(reverseHits > 0, "no base node gained a batch neighbor")
  }

  test("x125g clauses fire on a hops=0 append and a degraded merge") {
    val (base, batch) = KnnGraph.appendSplit(spark, sfDir)
    val g0 = KnnGraph.build(base, "id", "vec", k = 5, rounds = 3)
    // entry-set-only search (hops=0): candidates never walk to the
    // true neighborhood -> the recall clause must fire
    val merged0 = KnnGraph.appendToGraph(g0, base, batch, "id", "vec",
      k = 5, beam = 10, hops = 0)
    val viol = KnnGraph.appendGateRows(spark, sfDir, merged0, g0,
      minRecall = 0.9).collect().map(_.getString(0))
    assert(viol.contains("recall"),
      s"a hops=0 append passed recall: ${viol.toSeq}")
    // a merge that LOST similarity mass on base nodes trips no_degrade
    val tampered = g0.withColumn("sim", col("sim") - lit(0.1))
    val deg = KnnGraph.appendGateRows(spark, sfDir, tampered, g0,
      minRecall = 0.0).collect().map(_.getString(0))
    assert(deg.contains("no_degrade"), deg.toSeq)
  }

  test("x128 filtered search: every row matches, K rows per query, gate empty") {
    assert(SparkEntry.queries("x128g_knn_filtered_gate")(spark, sfDir)
      .count() === 0)
    val res = SparkEntry.queries("x128_knn_search_filtered")(spark, sfDir)
    assert(res.select("qid").distinct().count() === 10)
    val kept = clustered.filter(col("label") < 3).select(col("id").as("nid"))
    assert(res.join(kept, Seq("nid"), "left_anti").count() === 0)
  }

  test("x128: naive post-filtering the unfiltered top-k loses filtered neighbors") {
    val corpus = clustered
    val graph = KnnGraph.build(corpus, "id", "vec", k = 5, rounds = 3)
    val queries = corpus.filter(col("id") < 10)
    // the naive form: unfiltered walk, filter AFTER the top-k cut
    val naive = KnnGraph.search(graph, corpus, "id", "vec", queries,
        k = 5, beam = 16, hops = 8)
      .join(corpus.filter(col("label") < 3).select(col("id").as("nid")),
        Seq("nid"), "left_semi")
    val (walked, tookWalk) = KnnGraph.searchFiltered(graph, corpus,
      "id", "vec", queries, k = 5, beam = 16, hops = 8,
      pred = col("label") < 3)
    assert(tookWalk, "the 30% predicate must take the walk path")
    val exact = Similarity.bruteForceTopK(queries,
        corpus.filter(col("label") < 3), "id", "vec", 5)
      .select(col("qid"), col("nid"))
    val naiveHit = exact.join(naive.select("qid", "nid"),
      Seq("qid", "nid"), "left_semi").count()
    val walkHit = exact.join(walked.select("qid", "nid"),
      Seq("qid", "nid"), "left_semi").count()
    assert(naiveHit < walkHit,
      s"post-filter served $naiveHit true neighbors, the walk $walkHit")
    // and the naive form cannot even fill k rows per query
    assert(naive.count() < 50, s"naive kept ${naive.count()} of 50 slots")
  }

  test("x128 dispatch: a tiny filtered subset takes the exact path with full recall") {
    val corpus = clustered
    val graph = KnnGraph.build(corpus, "id", "vec", k = 5, rounds = 1)
    val tiny = col("label") === 7 && pmod(col("id"), lit(8)) === 1
    val queries = corpus.filter(col("id") < 10)
    val (res, tookWalk) = KnnGraph.searchFiltered(graph, corpus,
      "id", "vec", queries, k = 5, beam = 16, hops = 8, pred = tiny)
    assert(!tookWalk, "a candidate-pool-sized subset must be scanned exactly")
    val exact = Similarity.bruteForceTopK(queries, corpus.filter(tiny),
      "id", "vec", 5).select(col("qid"), col("nid"))
    assert(exact.exceptAll(res.select(col("qid"), col("nid"))).count() === 0,
      "the exact path must return exactly the filtered brute-force relation")
  }

  test("backfill-sized batches dispatch internal edges to a bounded build, recall holds") {
    val (base, batch) = KnnGraph.appendSplit(spark, sfDir)
    val g0 = KnnGraph.build(base, "id", "vec", k = 5, rounds = 3)
    // force the dispatch with a tiny cutoff: the same batch must still
    // append with full coverage and the recall floor intact
    val delta = KnnGraph.appendDelta(g0, base, batch, "id", "vec",
      k = 5, beam = 16, hops = 8, exactInternalCutoff = 1L)
    try {
      val batchIds = batch.select(col("id"))
      val newEdges = delta.join(batchIds, Seq("id"), "left_semi")
      val deg = newEdges.groupBy("id").agg(count(lit(1)).as("c"))
      assert(deg.filter(col("c") > 5).count() === 0)
      assert(deg.count() === batch.count(), "every batch node has edges")
      // recall of the dispatched delta vs exhaustive over the full corpus
      val full = KnnGraph.graphCorpus(spark, sfDir)
      val exact = Similarity.bruteForceTopK(batch, full, "id", "vec", 5)
        .select(col("qid").as("id"), col("nid"))
      val truthN = exact.count()
      val merged = KnnGraph.appendToGraph(g0, base, batch, "id", "vec",
        k = 5, beam = 16, hops = 8, exactInternalCutoff = 1L)
      val hit = exact.join(merged.select("id", "nid"), Seq("id", "nid"),
        "left_semi").count()
      assert(hit * 10L >= truthN * 9L,
        s"dispatched append recall $hit/$truthN below 0.9")
    } finally graft.CheckpointBlocks.release(delta)
  }

  test("determinism: two builds produce identical graphs") {
    val a = KnnGraph.build(emb, "id", "vec", k = 4, rounds = 2)
    val b = KnnGraph.build(emb, "id", "vec", k = 4, rounds = 2)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }
}
