package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Optimization-round plan evidence: dumps `explain("formatted")` for
  * the inner-loop plan shapes the round-18 optimization changed, in
  * BOTH formulations — the pre-change chain (reconstructed inline
  * here; see git history for the operator bodies that used it) and the
  * current operator output — so the claimed exchange eliminations are
  * checkable from committed text files without running Spark.
  *
  *   runMain graft.PlanProbe <outDir> [sfDir]
  *
  * The "before" plans are built from the same session and inputs as
  * the "after" plans, differing only in the formulation under audit:
  * distinct().window() merges vs one explicitly-sized keyed exchange,
  * an unclaimed checkpoint vs a claimed one on the store side of a
  * key-equi join, and the PQ encode join+aggregate vs the codegen
  * argmin projection.
  */
object PlanProbe {
  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "plans/r18")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    def write(name: String, text: String): Unit =
      java.nio.file.Files.writeString(outDir.resolve(name), text)

    // ---- serving-hop merge (x120/x122/x124/x125/x128 inner loop) ----
    // One beam hop over a built graph: candidate expansion, dedup,
    // exact scoring against the corpus, merge + beam cap. The claimed
    // hash layouts on v/adjacency plus the explicit keyed merges are
    // what the kNN-family optimization changed.
    val corpus = graft.operators.KnnGraph.graphCorpus(spark, sfDir)
    val graph = graft.operators.KnnGraph.build(corpus, "id", "vec", 5, 1)
    val (v, adjacency) = graft.operators.KnnGraph.servingIndex(
      graph, corpus, "id", "vec", 5)
    val q = CheckpointBlocks.cleanCheckpoint(
      graft.operators.Similarity.normedVecs(
          corpus.filter(col("id") < 10), "id", "vec")
        .select(col("id").as("qid"), col("vec").as("qvec"),
          col("nrm").as("qnrm")))
    def scoreQ(pairs: DataFrame): DataFrame = pairs
      .filter(col("qid") =!= col("nid"))
      .join(v.select(col("id").as("nid"), col("vec").as("nvec"),
        col("nrm").as("nnrm")), "nid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("nid"),
        round(graft.functions.GraftExtensions.vecDot(
          col("qvec"), col("nvec")) / (col("qnrm") * col("nnrm")), 6)
          .as("sim"))
    // a representative materialized frontier (claimed hash(qid))
    val frontier = CheckpointBlocks.sizedCheckpoint(
      scoreQ(q.select(col("qid")).crossJoin(
          broadcast(v.select(col("id").as("nid")).limit(4)))),
      Seq("qid"), 40L)
    val beam = 16
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))

    // BEFORE: cand.distinct() then frontier.union(scored).distinct()
    // then the cap window — the planner inserts a full-row exchange for
    // each distinct plus a qid exchange for the window, and the v join
    // re-exchanges the corpus side every hop.
    val candBefore = frontier.select(col("qid"), col("nid"))
      .join(adjacency, Seq("nid"))
      .select(col("qid"), col("next").as("nid"))
      .distinct()
    val hopBefore = frontier.unionByName(scoreQ(candBefore)).distinct()
      .withColumn("r", row_number().over(w)).filter(col("r") <= beam)
      .select(col("qid"), col("nid"), col("sim"))
    write("knn_hop_before.txt", fmt(hopBefore))

    // AFTER: the current runBeam shape — candidate dedup keyed+sized
    // to colocate with the claimed v layout, then ONE explicit qid
    // exchange carrying both the merge dedup and the cap window.
    val vParts = v.rdd.getNumPartitions
    val candAfter = frontier.select(col("qid"), col("nid"))
      .join(adjacency, Seq("nid"))
      .select(col("qid"), col("next").as("nid"))
      .repartition(vParts, col("nid"))
      .dropDuplicates("qid", "nid")
    val hopAfter = frontier.unionByName(scoreQ(candAfter))
      .repartition(CheckpointBlocks.partitionsFor(spark, 160L), col("qid"))
      .dropDuplicates("qid", "nid")
      .withColumn("r", row_number().over(w)).filter(col("r") <= beam)
      .select(col("qid"), col("nid"), col("sim"))
    write("knn_hop_after.txt", fmt(hopAfter))

    // ---- claimed checkpoint: store side of a key-equi join ----------
    // BEFORE: an unclaimed checkpoint (what localCheckpoint yields
    // under AQE) — the corpus side exchanges to meet the probe. Auto-
    // broadcast off so the sort-merge shape shows which sides exchange
    // (with it on, a small probe broadcasts in both plans and the
    // store-side difference is invisible).
    val unclaimed = CheckpointBlocks.cleanCheckpoint(
      graft.operators.Similarity.normedVecs(corpus, "id", "vec"))
    val probe = spark.range(50).select((col("id") * 3).as("nid"))
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      write("claimed_store_join_before.txt", fmt(
        probe.join(unclaimed.select(col("id").as("nid"), col("nrm")), "nid")))
      write("claimed_store_join_after.txt", fmt(
        probe.join(v.select(col("id").as("nid"), col("nrm")), "nid")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    CheckpointBlocks.release(unclaimed)

    // ---- PQ encode: join+aggregate vs codegen argmin ----------------
    val pqCorpus = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val dim = pqCorpus.select(size(col("embedding"))).head().getInt(0)
    val cb = graft.operators.Pq.train(pqCorpus, "id", "embedding", 4, 8, 0)
    // BEFORE: the replaced formulation — broadcast join against the
    // centroid relation, then a min(struct) aggregate per (id, m).
    val sv = graft.operators.Pq.subVectors(
        pqCorpus, "id", "embedding", 4, dim / 4)
      .withColumn("sn2", graft.functions.GraftExtensions.vecDot(
        col("sv"), col("sv")))
    val scoredBefore = sv.join(broadcast(cb.centroids), Seq("m"))
      .select(col("id"), col("m"), col("code"),
        (col("sn2") + col("cn2") - lit(2.0) *
          graft.functions.GraftExtensions.vecDot(col("sv"), col("cvec")))
          .as("d2"))
      .groupBy(col("id"), col("m"))
      .agg(min(struct(col("d2"), col("code"))).as("b"))
      .select(col("id"), col("m"), col("b.code").as("code"))
    write("pq_encode_before.txt", fmt(scoredBefore))
    write("pq_encode_after.txt", fmt(
      graft.operators.Pq.encode(pqCorpus, "id", "embedding", cb, 4, dim / 4)))

    CheckpointBlocks.release(q)
    CheckpointBlocks.release(frontier)
    println(s"[planprobe] wrote ${outDir.toAbsolutePath}")
    spark.stop()
  }
}
