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
  * MEASUREMENT ISOLATION (the round-10 lesson): each scale runs in a
  * FRESH SparkSession with a forced GC before it. A shared session
  * accumulates block-manager and codegen-cache state across scales, and
  * the 16x pass then measures the prior scales' GC debt along with its
  * own work — the headline 16x ratio swung 1.9x..9.0x between rounds on
  * identical code. With per-scale sessions the ratio is a property of
  * the ALGORITHM again. (JVM JIT warmup is shared across sessions —
  * that part is deliberate: every scale sees equally-warm code, and the
  * per-session warmup query re-primes codegen.)
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleCheck"
  *   SPARK_GRAFT_SCALE_KS=1,16    # optional: scales to run
  *   SPARK_GRAFT_SCALE_OPS=simhash,ppjoin   # optional: op filter
  */
object ScaleCheck {

  private def freshSession(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: prime codegen + parquet reader so scale-1 of a
    // fresh JVM doesn't carry startup cost the later scales skip
    spark.range(100000).selectExpr("sum(id)").collect()
    spark
  }

  /** Copy-id offset stride — well above any test corpus' id range. */
  private val CopyStride = 1000000L

  /** k copies of `base`, each produced by `perCopy` (which applies its
    * own id offsets), unioned, rebalanced and pinned — the ONE
    * replication policy every probe shares.
    */
  private def replicateWith(spark: SparkSession, base: DataFrame, k: Int)
                           (perCopy: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(i => perCopy(base, i))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)

  /** [[replicateWith]] for single-`id`-column relations: the offset is
    * applied for you, `perCopy` only transforms the payload.
    */
  private def replicate(spark: SparkSession, base: DataFrame, k: Int)
                       (perCopy: (DataFrame, Int) => DataFrame): DataFrame =
    replicateWith(spark, base, k) { (df, i) =>
      perCopy(df.withColumn("id", col("id") + i * CopyStride), i)
    }

  /** Median of 3 passes: single-pass numbers at the 16x scale swing
    * >2x run-to-run — the same measurement policy Bench adopted. Rows
    * come from the last pass.
    */
  private def time(f: => Long): (Double, Long) = {
    val samples = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    (samples.map(_._1).sorted.apply(1), samples.last._2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.get("SPARK_GRAFT_SCALE_KS")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 4, 16))
    val opFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def keep(name: String): Boolean = opFilter.forall(_.contains(name))

    for (k <- scales) {
      // dedup section: one isolated session per scale
      val spark = freshSession()
      val docs = replicate(spark,
        Tables(spark, sfDir, "documents")
          .select(col("doc_id").as("id"), col("text")), k) { (df, i) =>
        // disjoint token spaces: copies never match each other
        df.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c$i$$1"))
      }
      val ops: Seq[(String, () => Long)] = Seq(
        "exact" -> (() => Dedup.exactKeepFirst(docs, "id", "text").count()),
        "ppjoin" -> (() =>
          Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.5).count()),
        "minhash_lsh" -> (() =>
          Dedup.minhashLshPairs(docs, "id", "text", n = 3, numPerm = 32,
            bands = 16, threshold = 0.5).count()),
        "simhash" -> (() => Dedup.simhashPairs(docs, "id", "text", maxDist = 3).count()),
        // duplicated-passage spans: windows only collide within a copy
        // (disjoint token spaces), so span rows — and the occurrence
        // join's work — must grow linearly in k
        "passage" -> (() =>
          graft.operators.PassageDedup
            .duplicatePassageSpans(docs, "id", "text", k = 5).count()))
      ops.filter(o => keep(o._1)).foreach { case (name, f) =>
        val (sec, rows) = time(f())
        println(f"""{"op":"$name","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
        spark.catalog.clearCache()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Incremental semantic-index scaling: a FIXED batch flagged against
    // a stored index replicated 1x/4x/16x. Copies get per-copy
    // deterministic sign-flip patterns (norm-preserving, direction
    // destroyed), so the batch's true matches stay CONSTANT across
    // scales — growth in seconds can only come from index-side bucket
    // collisions (linear in index size at fixed bucket granularity),
    // never from re-scanning or re-bucketing the stored vectors.
    import graft.operators.Similarity
    if (keep("sem_incr")) for (k <- scales) {
      val spark = freshSession()
      import org.apache.spark.sql.functions.{transform => atransform}
      def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val index = replicate(spark, embBase, k) { (df, i) =>
        if (i == 0) df
        else df.withColumn("vec", atransform(col("vec"), (x, pos) =>
          x * when(xxhash64(lit(i), pos) % 2 === 0, 1.0f).otherwise(-1.0f)))
      }
      val idxBuckets = Similarity.lshBucketTable(index, "id", "vec",
        nbits = 8, tables = 8).localCheckpoint(true)
      val idxVecs = Similarity.normedVecs(index, "id", "vec").localCheckpoint(true)
      // fixed batch: 500 fresh ids over copy-0 vectors (matches only them)
      val batch = embBase.orderBy("id").limit(500)
        .select((col("id") + 100000000L).as("id"), col("vec"))
        .localCheckpoint(true)
      val (sec, rows) = time(
        Similarity.incrementalCosinePairsFromIndex(idxBuckets, idxVecs,
          batch, "id", "vec", threshold = 0.95, nbits = 8, tables = 8).count())
      println(f"""{"op":"sem_incr","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Incremental PASSAGE-dedup scaling (the CorpusStream passage-leg
    // cost model): a FIXED 500-doc batch flagged against a stored
    // window-hash index replicated 1x/4x/16x. Copy 0 is the real index;
    // other copies remap every window hash (xxhash64(w, copy)) into
    // disjoint hash-space regions, so the batch's true span matches stay
    // CONSTANT across scales — growth in seconds can only come from the
    // semi-join's scan of the larger stored side, never from
    // re-aggregating or re-windowing corpus history.
    import graft.operators.PassageDedup
    if (keep("pass_incr")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val baseIdx = PassageDedup.windowIndex(docBase, "id", "text", k = 5)
      val index = (0 until k).map { i =>
        if (i == 0) baseIdx
        else baseIdx.select(xxhash64(col("w"), lit(i)).as("w"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      // fixed batch: 500 fresh ids over the base texts (their windows
      // match only copy-0 index rows)
      val batch = docBase.orderBy("id").limit(500)
        .select((col("id") + 100000000L).as("id"), col("text"))
        .localCheckpoint(true)
      val (sec, rows) = time(
        PassageDedup.incrementalPassageSpans(batch, index, "id", "text", 5)
          .count())
      println(f"""{"op":"pass_incr","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Streaming-decontamination scaling (the CorpusStream decontam-leg
    // cost model): a FIXED 500-doc batch screened against an eval
    // window index replicated 1x/4x/16x. The Bloom builds OUTSIDE the
    // timer (registration-time work, once per eval-set change); the
    // timed path is the per-batch probe — batch windows against
    // broadcast sketch bytes — which must be FLAT in eval index size
    // (mightContain hashes a constant number of bits regardless of
    // sketch length; only the one-time build and the shipped bytes
    // grow).
    import graft.operators.Contamination
    if (keep("decontam_incr")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val baseW = Contamination.tokenWindows(docBase, "id", "text", k = 5)
        .select(col("w")).distinct()
      val evalIdx = (0 until k).map { i =>
        if (i == 0) baseW
        else baseW.select(xxhash64(col("w"), lit(i)).as("w"))
      }.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(true)
      val bloom = Contamination.bloomOfWindows(evalIdx)
      val batch = docBase.orderBy("id").limit(500)
        .select((col("id") + 100000000L).as("id"), col("text"))
        .localCheckpoint(true)
      val (sec, rows) = time(
        Contamination.bloomFracAgainst(
            Contamination.tokenWindows(batch, "id", "text", k = 5), bloom)
          .filter(col("bloom_frac") > 0.2).count())
      println(f"""{"op":"decontam_incr","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Trained-classifier GD scaling (x118): one full 16-iteration
    // training at 1x/4x/16x labeled rows (replicated docs with disjoint
    // ids — fresh hash splits, same feature distribution). Each
    // iteration is ONE map-side-combinable aggregate of (d+1)-sized
    // partials against a checkpointed micro-int frame, so seconds must
    // grow (sub-)linearly in rows — superlinear growth means the
    // parameter-server shape broke (e.g. per-iteration text re-scans).
    if (keep("qlr")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val docs = replicate(spark, docBase, k)((df, _) => df)
      val labeled = graft.operators.QualityClassifier
        .labeledFrame(docs, "id", "text").localCheckpoint(true)
      val (sec, rows) = time {
        val tr = graft.operators.QualityClassifier.fit(labeled)
        tr.trajectory.size.toLong
      }
      println(f"""{"op":"qlr","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Quality-leg drift detection (the streaming x118 deployment's
    // alarm): score + covariate-shift aggregate on a FIXED batch while
    // the accumulated curated store grows 16x. The detector reads the
    // BATCH and the (literal-sized) model only — never the store — so
    // the probe's PASS shape is FLAT; growth means a store scan leaked
    // into the per-batch path. (The drift RESPONSE — retrain on the
    // store — is deliberately state-sized, the pq_rotate analog.)
    if (keep("qdrift")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      // the grown store exists on disk-shaped state (checkpointed) so
      // a leaked dependency would actually cost; the detector must not
      // touch it
      val store = replicate(spark, docBase, k)((df, _) => df)
        .localCheckpoint(true)
      store.count()
      val labeled = graft.operators.QualityClassifier
        .labeledFrame(docBase, "id", "text")
      val tr = graft.operators.QualityClassifier.fit(labeled, iters = 2)
      val batch = docBase.orderBy("id").limit(500).localCheckpoint(true)
      val (sec, rows) = time {
        val scored = graft.operators.QualityClassifier
          .scoreDocs(batch, "id", "text", tr.scaler, tr.finalW)
        val n = scored.count()
        graft.operators.QualityClassifier
          .featureDriftMicro(batch, "id", "text", tr.scaler)
        n
      }
      println(f"""{"op":"qdrift","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Tokenizer-leg drift detection (the streaming byte-BPE
    // deployment's alarm): token accounting of a FIXED 500-doc batch
    // under a trained merge table while the accumulated curated store
    // grows 16x. The detector reads the BATCH and the driver-literal
    // merge list only — never the store — so the probe's PASS shape is
    // FLAT; growth means a store scan leaked into the per-batch path.
    // (The drift RESPONSE — relearn on the store — is deliberately
    // state-sized, the pq_rotate analog.)
    if (keep("tokdrift")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val store = replicate(spark, docBase, k)((df, _) => df)
        .localCheckpoint(true)
      store.count()
      import graft.operators.BpeQueries
      val merges = BpeQueries.learnMergesOn(
        BpeQueries.pretokenVocab(docBase, "text")
          .withColumn("syms", BpeQueries.byteSyms(col("w"))), 12)
      val batch = docBase.orderBy("id").limit(500).localCheckpoint(true)
      val (sec, rows) = time {
        val (_, tok, _, _) = BpeQueries.byteTokenStats(batch, "text", merges)
        tok
      }
      println(f"""{"op":"tokdrift","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Tokenizer-leg drift RESPONSE (the knng_reb analog for the byte-
    // BPE rotation): the retrain a drifted verdict triggers re-learns
    // merges on the ACCUMULATED curated store and re-accounts the
    // train bpt — this times exactly that body (pretokenVocab scan +
    // learnMergesOn on the distinct-word vocab + byteTokenStats over
    // the store; the two ≤merges-row parquet commits are priced at
    // ~zero). Cost model: the vocab scan and the token accounting are
    // one pass each over the store (linear in bytes); the merge loop
    // runs on the DISTINCT-word vocab, which verbatim replication
    // keeps flat — so the probe's PASS shape is AT MOST linear in
    // store size, tracking the offline x81 learn slope. Super-linear
    // growth means the merge loop stopped working per-vocab-word and
    // the rotation would stall the stream on exactly the long corpora
    // it exists for.
    if (keep("bpe_reb")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val store = replicate(spark, docBase, k)((df, _) => df)
        .localCheckpoint(true)
      store.count()
      import graft.operators.BpeQueries
      val (sec, rows) = time {
        val merges = BpeQueries.learnMergesOn(
          BpeQueries.pretokenVocab(store, "text")
            .withColumn("syms", BpeQueries.byteSyms(col("w"))), 12)
        val (_, tTok, _, _) =
          BpeQueries.byteTokenStats(store, "text", merges)
        tTok
      }
      println(f"""{"op":"bpe_reb","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Quality-leg drift RESPONSE (the bpe_reb analog for the learned
    // quality rotation, closing the retrain-probe family): the body a
    // drifted verdict triggers — rawLabeledFrame over the ACCUMULATED
    // curated store (feature scan + Gopher weak labels) and the
    // gradient-descent fit on the standardized frame. Cost model: the
    // label/feature pass is one scan (linear in store bytes); fit's
    // iterations are bounded aggregates over the feature frame (linear
    // scans, constant count) — PASS shape is at most linear, and
    // overhead-bound flat at these sizes. Super-linear growth means an
    // iteration stopped being a scan-shaped aggregate.
    if (keep("q_reb")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"))
      val store = replicate(spark, docBase, k)((df, _) => df)
        .localCheckpoint(true)
      store.count()
      import graft.operators.QualityClassifier
      val (sec, rows) = time {
        val lf = QualityClassifier.rawLabeledFrame(store, "id", "text")
          .localCheckpoint(true)
        try {
          val tr = QualityClassifier.fit(lf)
          tr.scaler.n
        } finally graft.CheckpointBlocks.release(lf)
      }
      println(f"""{"op":"q_reb","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // COMPOSED all-legs streaming probe: every per-leg per-batch cost
    // is individually pinned flat above, but the platform runs the
    // legs COMPOSED — shared checkpoint blocks, shared ledgers, eight
    // stores per drain — and composition cost was previously asserted
    // only at fixture scale by the e2e spec. One CorpusStream with
    // EVERY leg enabled (lexical + semantic + passage + decontam +
    // quality + PQ + export + graph + tokenizer) ingests a store of
    // 400·k prose docs in one untimed setup drain, then a FIXED
    // 100-doc batch drains against it, timed end to end (stream
    // startup included — a constant across scales). PASS shape is
    // FLAT: growth means some leg's per-batch path leaked a
    // store-sized scan/shuffle that its isolated probe can't see.
    // Single pass, not median-of-3: a drain MUTATES the store (batch
    // ids advance), so three passes would time three different batch
    // positions; the cross-scale comparison is the signal.
    if (keep("stream_all")) for (k <- scales) {
      val spark = freshSession()
      import spark.implicits._
      import java.nio.file.{Files => JFiles, Paths => JPaths}
      def recBytes(uri: String, text: String): Array[Byte] = {
        val payload = text.getBytes("ISO-8859-1")
        (s"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: $uri\r\n" +
          s"WARC-Date: 2026-01-01T00:00:00Z\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("ISO-8859-1") ++ payload ++
          "\r\n\r\n".getBytes("ISO-8859-1")
      }
      def writeWarc(dir: String, name: String,
                    docs: Seq[(String, String)]): Unit =
        JFiles.write(JPaths.get(dir, name),
          docs.map { case (u, t) => recBytes(u, t) }.reduce(_ ++ _))
      // distinct per-index prose (the PqRotationSpec fixture template):
      // survives language-id/quality gates, never near-dups in-batch
      def prose(i: Int): String =
        s"the alpha$i and the beta$i is near the gamma$i of the delta$i " +
          s"while the epsilon$i walks past the zeta$i"
      val warcDir = JFiles.createTempDirectory(s"streamall_w$k").toString
      val workDir = JFiles.createTempDirectory(s"streamall_s$k").toString
      def stream() = new graft.streaming.CorpusStream(spark, workDir,
        semanticThreshold = Some(0.95), passageK = Some(5), pqM = Some(8),
        exportShards = Some(2), knnK = Some(3), bpeMerges = Some(12))
      stream().indexEvalSet(
        Seq(("e1", "the capital of the ancient kingdom is found beside " +
          "the river and the old bridge")).toDF("id", "text"), "id", "text")
      stream().indexQualityModel(
        Array(5000000L, 0L, 0L, -200000000L, 0L),
        graft.operators.QualityClassifier.Scaler(1L,
          Array(0L, 0L, 0L, 0L),
          Array(1000000L, 1000000L, 1000000L, 1000000L)),
        thresholdMicro = 500000L)
      // untimed setup drain: the accumulated store, one batch of 400·k
      writeWarc(warcDir, "store.warc",
        (0 until 400 * k).map(i => s"http://s/$i" -> prose(i)))
      stream().ingest(warcDir).awaitTermination()
      // timed drain: the SAME fixed 100-doc batch at every scale
      writeWarc(warcDir, "batch.warc",
        (0 until 100).map(i => s"http://b/$i" -> prose(10000000 + i)))
      val t0 = System.nanoTime()
      stream().ingest(warcDir).awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = stream().curated.count()
      println(f"""{"op":"stream_all","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Held-out mixture-loss evaluation (x126a/x126h): two weight
    // vectors against one train/eval count-table pair, corpus grown
    // 16x. The work is two bounded hash-keyed count aggregations plus
    // one joined scan — seconds must grow (sub-)linearly in corpus
    // size; super-linear growth means the per-gram relation stopped
    // being the unit of work.
    if (keep("hetloss")) for (k <- scales) {
      val spark = freshSession()
      def docBase: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"),
          when(col("doc_id") % 2 === 0, "a").otherwise("b").as("dom"))
      val docs = replicate(spark, docBase, k)((df, _) => df)
        .localCheckpoint(true)
      docs.count()
      val train = docs.filter(col("id") % 5 =!= 0)
      val eval = docs.filter(col("id") % 5 === 0)
      val doms = Seq("a", "b")
      val ws = Seq(Seq(500000L, 500000L), Seq(700000L, 300000L))
      val (sec, rows) = time {
        val r = graft.operators.DomainMixture
          .heldOutLossMulti(train, eval, "text", "dom", doms, ws)
        r.flatten.map(_._2).sum
      }
      println(f"""{"op":"hetloss","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // NN-Descent kNN-graph construction scaling (x120): the manifold
    // corpus at 1x/4x/16x (replicated ids draw fresh latents from the
    // same 4-D manifold — denser sampling of one geometry, the honest
    // scale-up). Per-round work is bounded by the capped local join
    // (<= 4k²·N candidate rows), so build seconds must grow (sub-)
    // linearly in N — quadratic growth means an all-pairs relation
    // leaked into the candidate generation.
    if (keep("knng")) for (k <- scales) {
      val spark = freshSession()
      def base: DataFrame = graft.operators.KnnGraph
        .graphCorpus(spark, sfDir)
      val corpus = replicate(spark, base, k) { (df, i) =>
        if (i == 0) df
        else df.select((col("id") + i * 100000000L).as("id"), col("vec"),
          col("label"))
      }.localCheckpoint(true)
      val (sec, rows) = time(
        graft.operators.KnnGraph.build(corpus, "id", "vec",
          k = 5, rounds = 2).count())
      println(f"""{"op":"knng","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Incremental kNN-graph append scaling (x125): a FIXED batch (the
    // sf corpus' every-eighth split) appended to graphs built over
    // 1x/4x/16x corpora. Cost model: the beam walk probes the stored
    // adjacency by id-keyed joins (scan-bounded per hop, never
    // shuffled) and the re-prune touches only the <= |B|·k affected
    // nodes — so append seconds may grow with the adjacency SCAN but
    // never super-linearly (a rebuild or an all-pairs leak would).
    // The base build is excluded from the timing.
    if (keep("knng_app")) for (k <- scales) {
      val spark = freshSession()
      val (base0, batch) = graft.operators.KnnGraph.appendSplit(spark, sfDir)
      val corpus = replicate(spark, base0, k) { (df, i) =>
        if (i == 0) df
        else df.select((col("id") + i * 100000000L).as("id"), col("vec"),
          col("label"))
      }
      val graph = graft.operators.KnnGraph.build(corpus, "id", "vec",
        k = 5, rounds = 2)
      val (sec, rows) = time {
        val merged = graft.operators.KnnGraph.appendToGraph(
          graph, corpus, batch, "id", "vec", k = 5, beam = 16, hops = 6)
        val c = merged.count()
        graft.CheckpointBlocks.release(merged)
        c
      }
      println(f"""{"op":"knng_app","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Filtered graph serving scaling (x128): a FIXED 10-query batch
    // against graphs over 1x/4x/16x corpora with the ~30% label<3
    // predicate. The walk probes stored adjacency by id-keyed joins
    // and the kept-id relation by semi-joins — per-query cost is
    // hop-bounded, so seconds may track the adjacency scan but never
    // super-linearly (the base build is excluded from the timing).
    if (keep("knng_filt")) for (k <- scales) {
      val spark = freshSession()
      def base: DataFrame = graft.operators.KnnGraph
        .graphCorpus(spark, sfDir)
      val corpus = replicate(spark, base, k) { (df, i) =>
        if (i == 0) df
        else df.select((col("id") + i * 100000000L).as("id"), col("vec"),
          col("label"))
      }
      val graph = graft.operators.KnnGraph.build(corpus, "id", "vec",
        k = 5, rounds = 2)
      val queries = corpus.filter(col("id") < 10)
      val (sec, rows) = time {
        val (res, _) = graft.operators.KnnGraph.searchFiltered(
          graph, corpus, "id", "vec", queries, k = 5, beam = 16, hops = 8,
          pred = col("label") < 3)
        val c = res.count()
        graft.CheckpointBlocks.release(res)
        c
      }
      println(f"""{"op":"knng_filt","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Staleness-REBUILD response scaling (the streaming graph leg's
    // knngmeta rotation, CorpusStream): a store at 1x/4x/16x whose
    // edge LOG carries a real append history (base-built edges + a
    // beam-appended batch delta, written exactly as the stream's x125
    // leg lands them) is folded into a fresh NN-Descent base. The
    // timed leg is what fires in the stream on a stale verdict: derive
    // the serving graph from the log (one top-k cut pass), then the
    // bounded rebuild over the full vector store. Contract: seconds
    // must track the knng BUILD slope (sub-linear in N) — the
    // log-derive/ledger machinery adds nothing super-linear, and the
    // fold never re-reads per-batch history beyond the one derive
    // pass. (The append itself is priced by knng_app; setup builds are
    // untimed.)
    if (keep("knng_reb")) for (k <- scales) {
      val spark = freshSession()
      def base: DataFrame = graft.operators.KnnGraph
        .graphCorpus(spark, sfDir)
      val corpus = replicate(spark, base, k) { (df, i) =>
        if (i == 0) df
        else df.select((col("id") + i * 100000000L).as("id"), col("vec"),
          col("label"))
      }.localCheckpoint(true)
      // 7/8 base-built + 1/8 append-born: the log shape the rebuild
      // actually folds (staleness itself is a footer-count verdict,
      // priced at zero — the response is what this probe pins)
      val baseVecs = corpus.filter(col("id") % 8 =!= 0)
      val batchVecs = corpus.filter(col("id") % 8 === 0)
      val g0 = graft.operators.KnnGraph.build(baseVecs, "id", "vec",
        k = 5, rounds = 2)
      val delta = graft.operators.KnnGraph.appendDelta(g0, baseVecs,
        batchVecs, "id", "vec", k = 5, beam = 16, hops = 6)
      val edgeLog = g0.select(col("id"), col("nid"), col("sim"))
        .unionByName(delta.select(col("id"), col("nid"), col("sim")))
        .localCheckpoint(true)
      edgeLog.count()
      graft.CheckpointBlocks.release(g0)
      graft.CheckpointBlocks.release(delta)
      val (sec, rows) = time {
        val derived = graft.operators.KnnGraph.graphFromEdgeLog(edgeLog, 5)
        derived.count()
        val rebuilt = graft.operators.KnnGraph.build(
          corpus.select(col("id"), col("vec")), "id", "vec",
          k = 5, rounds = 2)
        val c = rebuilt.count()
        graft.CheckpointBlocks.release(rebuilt)
        c
      }
      println(f"""{"op":"knng_reb","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Learned domain-mixture scaling (x126): the documents corpus
    // replicated VERBATIM (ids duplicated too — egMixture never reads
    // ids, only (text, lang)) — corpus size
    // grows 16x while the DISTINCT-bigram relation stays flat, so the
    // one count-building pass scales with the scan and the six EG
    // rounds stay constant: total seconds must grow well UNDER
    // linearly. (Disjoint-token replication would instead grow the
    // count table itself — a different, also-linear regime; the
    // verbatim form isolates the per-round claim.)
    if (keep("doremi")) for (k <- scales) {
      val spark = freshSession()
      def base: DataFrame = Tables(spark, sfDir, "documents")
        .select(col("doc_id").as("id"), col("text"), col("lang"))
      val docs = replicate(spark, base, k)((df, _) => df)
      val (sec, rows) = time(
        graft.operators.DomainMixture.egMixture(docs, "text", "lang",
          graft.operators.DomainMixture.Doms, iters = 5,
          eta = graft.operators.DomainMixture.Eta).count())
      println(f"""{"op":"doremi","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Incremental PQ-code maintenance scaling (the x96 cost model): a
    // FIXED 500-vector batch encoded + drift-checked against a stored
    // codebook while the stored CODES relation sits at 1x/4x/16x. The
    // maintenance step writes only the batch's own codes and reads only
    // the batch + the M·Ks-row codebook — the stored codes are present
    // (checkpointed) but untouched, so per-batch seconds must be FLAT
    // in stored-code count; any growth means the append path started
    // scanning history.
    if (keep("pq_incr")) for (k <- scales) {
      val spark = freshSession()
      import graft.operators.Pq
      def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val dim = embBase.select(size(col("vec"))).head().getInt(0)
      val cb = Pq.train(embBase, "id", "vec", m = 8, ks = 16, iters = 1)
      val storedCorpus = replicate(spark, embBase, k)((df, _) => df)
      // eager localCheckpoint materializes the stored index here,
      // outside the timer — no extra count needed
      val storedCodes = Pq.encode(storedCorpus, "id", "vec", cb,
        m = 8, ds = dim / 8).localCheckpoint(true)
      val batch = embBase.orderBy("id").limit(500)
        .select((col("id") + 100000000L).as("id"), col("vec"))
        .localCheckpoint(true)
      val (sec, rows) = time {
        val newCodes = Pq.encode(batch, "id", "vec", cb, m = 8, ds = dim / 8)
        val n = newCodes.count()
        Pq.batchQuantizationError(batch, "id", "vec", cb, m = 8, ds = dim / 8)
        n
      }
      println(f"""{"op":"pq_incr","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // PQ codebook ROTATION (the x96d response path): retrain + full
    // re-encode over the accumulated store. This is the one
    // deliberately state-sized operation in the streaming PQ leg, so
    // the probe's PASS shape is LINEAR in store size (the flat-cost
    // probes above pin the per-batch append path; this pins that the
    // rotation's cost is one honest pass, not super-linear).
    if (keep("pq_rotate")) for (k <- scales) {
      val spark = freshSession()
      import graft.operators.Pq
      def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val dim = embBase.select(size(col("vec"))).head().getInt(0)
      val storedVecs = replicate(spark, embBase, k)((df, _) => df)
        .localCheckpoint(true)
      val (sec, rows) = time {
        val cb2 = Pq.train(storedVecs, "id", "vec", m = 8, ks = 16, iters = 1)
        Pq.encode(storedVecs, "id", "vec", cb2, m = 8, ds = dim / 8).count()
      }
      println(f"""{"op":"pq_rotate","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Filtered IVF search (x114): fixed 10 queries, fixed-selectivity
    // predicate, corpus replicated — candidate work is selectivity ×
    // probed cells, so seconds must grow (sub-)linearly in the corpus;
    // a predicate-defeating rank blowup shows up as super-linear.
    if (keep("ivf_filt")) for (k <- scales) {
      val spark = freshSession()
      import graft.operators.Similarity
      def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val corpus = replicate(spark, embBase, k)((df, _) => df)
      val idx = Similarity.ivfBuild(corpus, "id", "vec", nlist = 16)
      val stored = Similarity.IvfIndex(
        idx.centroids.localCheckpoint(true),
        idx.assignments.localCheckpoint(true))
      val queries = embBase.filter(col("id") < 10).localCheckpoint(true)
      val (sec, rows) = time {
        Similarity.ivfSearchFiltered(stored, queries, "id", "vec",
          k = 5, nprobe = 4, pred = col("nid") % 3 === 0).count()
      }
      println(f"""{"op":"ivf_filt","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // ANN corpus scaling: FIXED 10 queries against a replicated corpus
    // (ids offset; vectors identical — the replicas are real neighbors,
    // which is fine for top-k, whose output stays k per query). Brute
    // force must grow linearly in the corpus; LSH's scoring stays
    // confined to bucket collisions, so its seconds should grow slower
    // than brute's — a quadratic candidate blowup in either shows up
    // immediately as super-linear seconds. Same per-scale isolation.
    import graft.operators.Similarity
    if (keep("ann_brute") || keep("ann_lsh") || keep("pq_adc") || keep("pq_rerank")) for (k <- scales) {
      val spark = freshSession()
      def embBase: DataFrame = Tables(spark, sfDir, "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val corpus = replicate(spark, embBase, k)((df, _) => df)
      val annQueries = embBase.orderBy("id").limit(10).localCheckpoint(true)
      // PQ search scaling: codebook trained ONCE on the base corpus
      // (the production shape — codebooks come from a sample), codes
      // materialized as setup BEFORE the timed region (an earlier cut
      // forced this lazily inside the timer and measured train+encode
      // instead); the timed path is pure ADC — a broadcast distance
      // table over the codes scan, linear in corpus size.
      val pqSetup = if (!keep("pq_adc") && !keep("pq_rerank")) None else Some {
        import graft.operators.Pq
        val dim = embBase.select(size(col("vec"))).head().getInt(0)
        val cb = Pq.train(embBase, "id", "vec", m = 8, ks = 16, iters = 1)
        val codes = Pq.encode(corpus, "id", "vec", cb, m = 8, ds = dim / 8)
          .localCheckpoint(true)
        codes.count() // force the checkpoint before any timing
        (cb, codes, dim)
      }
      val anns: Seq[(String, () => Long)] = Seq(
        "ann_brute" -> (() =>
          Similarity.bruteForceTopK(annQueries, corpus, "id", "vec", k = 5).count()),
        "ann_lsh" -> (() =>
          Similarity.lshTopK(annQueries, corpus, "id", "vec", k = 5,
            nbits = 8, tables = 4).count()),
        "pq_adc" -> (() => {
          val (cb, codes, dim) = pqSetup.get
          graft.operators.Pq.adcTopK(annQueries, codes, cb,
            "id", "vec", m = 8, ds = dim / 8, k = 5).count()
        }),
        // two-stage retrieval (the x95 shape): ADC shortlist over the
        // codes scan, then exact re-rank joining the corpus against the
        // broadcast Q·k' shortlist — output stays k per query at every
        // scale; time may grow with the two corpus scans (codes + true
        // vectors) but never faster, and never with shortlist size
        "pq_rerank" -> (() => {
          val (cb, codes, dim) = pqSetup.get
          val shortlist = graft.operators.Pq.adcTopK(annQueries, codes, cb,
            "id", "vec", m = 8, ds = dim / 8, k = 50)
          graft.operators.IvfPq.rerank(shortlist, annQueries, corpus,
            "id", "vec", k = 5).count()
        }))
      anns.filter(o => keep(o._1)).foreach { case (name, f) =>
        val (sec, rows) = time(f())
        println(f"""{"op":"$name","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
        spark.catalog.clearCache()
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // PCA fit scaling: ONE treeAggregate over the replicated corpus —
    // partials are (d + d²) doubles per partition regardless of rows
    // and the driver eigendecomposition is constant, so seconds must
    // grow at most linearly in corpus size.
    import graft.operators.Pca
    if (keep("pca_fit")) for (k <- scales) {
      val spark = freshSession()
      val corpus = replicate(spark,
        Tables(spark, sfDir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec")), k)((df, _) => df)
      val (sec, rows) = time {
        Pca.fit(corpus, "vec", 8).k.toLong
      }
      println(f"""{"op":"pca_fit","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // k-means‖ seeding scaling: each oversampling round is one scan of
    // the replicated corpus with the candidate set riding as literals
    // (no join, no shuffle) plus a bounded collect — seconds must grow
    // at most linearly; candidate/driver state stays capped.
    if (keep("kpp_seed")) for (k <- scales) {
      val spark = freshSession()
      val corpus = replicate(spark,
        Tables(spark, sfDir, "embeddings")
          .select(col("vec_id").as("id"), col("embedding").as("vec")), k)((df, _) => df)
      val (sec, rows) = time {
        Similarity.kmeansParallelSeed(corpus, "id", "vec",
          nlist = 16, rounds = 3, oversample = 8).centroids.count()
      }
      println(f"""{"op":"kpp_seed","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Triangle-count scaling: k disjoint id-offset copies of the part
    // co-purchase graph — copies never connect, so edges, wedges and
    // triangles all grow linearly in k and seconds must too. The
    // degree-ordered orientation additionally caps the wedge relation
    // at m^1.5 WITHIN a copy (the skew defense the spec pins on a hub
    // graph); a super-linear trend here means the orientation stopped
    // doing its job.
    import graft.operators.Components
    if (keep("tri")) for (k <- scales) {
      val spark = freshSession()
      val li = Tables(spark, sfDir, "lineitem")
      val base = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p1"))
        .join(li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p2")), "ok")
        .filter(col("p1") < col("p2"))
        .select(col("p1").as("a"), col("p2").as("b"))
      val edges = replicateWith(spark, base, k) { (df, i) =>
        df.select((col("a") + i * CopyStride).as("a"),
          (col("b") + i * CopyStride).as("b"))
      }
      val (sec, rows) = time(Components.triangleCounts(edges).count())
      println(f"""{"op":"tri","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }

    // Unigram-LM EM scaling: disjoint token spaces make the distinct-
    // word relation grow linearly in k while the piece table stays
    // capped (seedSize + chars) — each EM round is one scan of the word
    // relation, so seconds must grow at most linearly and driver state
    // stays bounded.
    import graft.operators.{BpeQueries, UnigramLm}
    if (keep("unigram_em")) for (k <- scales) {
      val spark = freshSession()
      val docs = replicate(spark,
        Tables(spark, sfDir, "documents")
          .select(col("doc_id").as("id"), col("text")), k) { (df, i) =>
        df.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c$i$$1"))
      }
      val vocab = BpeQueries.wordVocab(docs, "text").localCheckpoint(true)
      vocab.count() // materialize: the probe times EM, not the word count
      val (sec, rows) = time {
        UnigramLm.fit(vocab, maxLen = 4, seedSize = 120, target = 60,
          rounds = 1).probs.size.toLong
      }
      println(f"""{"op":"unigram_em","scale":$k,"sec":$sec%.2f,"rows":$rows}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      System.gc()
      Thread.sleep(500)
    }
  }
}
