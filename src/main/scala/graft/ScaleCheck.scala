package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scaling probe (manual tool, not part of the driver contract): runs
  * the dedup family over the documents corpus replicated 1x/4x/16x and
  * prints one JSON line per (op, scale) with wall seconds and output
  * rows.
  *
  * Replicas get DISJOINT token spaces (every token prefixed with the
  * copy tag), so each copy preserves the original's internal near-dup
  * structure while never matching across copies: output pair counts —
  * and honest work — grow linearly in the scale factor, which is
  * exactly what the probe is checking (a quadratic candidate blowup
  * shows up immediately as super-linear seconds).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleCheck"
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** k id-offset copies of `base` (offset stride 1M — well above any
      * test corpus), each transformed by `perCopy`, rebalanced and
      * pinned. Shared by the dedup and ANN sections.
      */
    def replicate(base: DataFrame, k: Int)
                 (perCopy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map { i =>
        perCopy(base.withColumn("id", col("id") + i * 1000000L), i)
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)

    def corpus(k: Int): DataFrame =
      replicate(Tables(spark, sfDir, "documents")
          .select(col("doc_id").as("id"), col("text")), k) { (df, i) =>
        // disjoint token spaces: copies never match each other
        df.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c$i$$1"))
      }

    // median of 3 passes: single-pass numbers at the 16x scale swing
    // >2x run-to-run (GC + lingering checkpoint blocks) — the same
    // measurement policy Bench adopted. Rows come from the last pass.
    def time(f: => Long): (Double, Long) = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      (samples.map(_._1).sorted.apply(1), samples.last._2)
    }

    // localCheckpoint blocks are NOT dropped by clearCache; stale
    // scale-k corpora would pressure the 16x pass into GC churn
    def dropCheckpoints(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    for (k <- Seq(1, 4, 16)) {
      dropCheckpoints()
      val docs = corpus(k)
      val ops: Seq[(String, () => Long)] = Seq(
        "exact" -> (() => Dedup.exactKeepFirst(docs, "id", "text").count()),
        "ppjoin" -> (() =>
          Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.5).count()),
        "minhash_lsh" -> (() =>
          Dedup.minhashLshPairs(docs, "id", "text", n = 3, numPerm = 32,
            bands = 16, threshold = 0.5).count()),
        "simhash" -> (() => Dedup.simhashPairs(docs, "id", "text", maxDist = 3).count()))
      ops.foreach { case (name, f) =>
        val (sec, rows) = time(f())
        println(f"""{"op":"$name","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
        spark.catalog.clearCache()
      }
    }

    // ANN corpus scaling: FIXED 10 queries against a replicated corpus
    // (ids offset; vectors identical — the replicas are real neighbors,
    // which is fine for top-k, whose output stays k per query). Brute
    // force must grow linearly in the corpus; LSH's scoring stays
    // confined to bucket collisions, so its seconds should grow slower
    // than brute's — a quadratic candidate blowup in either shows up
    // immediately as super-linear seconds.
    import graft.operators.Similarity
    def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def embCorpus(k: Int): DataFrame = replicate(embBase, k)((df, _) => df)
    // query set straight off the base table — no full-corpus checkpoint
    // just to take 10 rows
    val annQueries = embBase.orderBy("id").limit(10).localCheckpoint(true)
    for (k <- Seq(1, 4, 16)) {
      val corpus = embCorpus(k)
      val anns: Seq[(String, () => Long)] = Seq(
        "ann_brute" -> (() =>
          Similarity.bruteForceTopK(annQueries, corpus, "id", "vec", k = 5).count()),
        "ann_lsh" -> (() =>
          Similarity.lshTopK(annQueries, corpus, "id", "vec", k = 5,
            nbits = 8, tables = 4).count()))
      anns.foreach { case (name, f) =>
        val (sec, rows) = time(f())
        println(f"""{"op":"$name","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
