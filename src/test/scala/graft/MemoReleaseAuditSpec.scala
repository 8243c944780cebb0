package graft

/** The Bench-path storage audit (round-16 verdict item): after a
  * representative query from EVERY memoizing family runs, the between-
  * pass cleanup Bench performs (clearMemo per family + clearCache)
  * must leave ZERO of the newly-created checkpoint blocks behind in
  * the block manager. A family whose memo (or per-query transient
  * state) leaks storage shows up here as a named RDD residue — the
  * mechanism by which one family's blocks GC-pressure a later family
  * in the shared bench session.
  */
class MemoReleaseAuditSpec extends SparkSpecBase {

  test("the between-pass cleanup releases every block the declared queries created") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    // GRAFT_AUDIT_ONLY=x03,x120 narrows the sweep when bisecting a leak
    val only = sys.env.get("GRAFT_AUDIT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
      .foreach { name =>
        SparkEntry.queries(name)(spark, sfDir).count()
      }
    // the exact between-pass sequence Bench runs
    graft.operators.ExtensionQueries.clearMemo()
    graft.operators.Contamination.clearMemo()
    graft.operators.SketchQueries.clearMemo()
    graft.operators.BpeQueries.clearMemo()
    graft.operators.Pq.clearMemo()
    graft.operators.IvfPq.clearMemo()
    graft.operators.Opq.clearMemo()
    graft.operators.Pca.clearMemo()
    graft.operators.UnigramLm.clearMemo()
    graft.operators.RetrievalQueries.clearMemo()
    graft.operators.QualityClassifier.clearMemo()
    graft.operators.KnnGraph.clearMemo()
    graft.operators.DomainMixture.clearMemo()
    spark.catalog.clearCache()
    // release messages are async (unpersist(blocking=false)); give the
    // block manager a bounded moment to drain before judging
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    var leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    }
    val residue = leaked.map { id =>
      val rdd = spark.sparkContext.getPersistentRDDs(id)
      // RDD.toString carries the creation site — names the leaker
      s"$rdd (${rdd.getStorageLevel})"
    }
    assert(residue.isEmpty,
      s"storage leaked past the between-pass cleanup:\n${residue.mkString("\n")}")
  }
}
