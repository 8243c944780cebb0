package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}

import graft.CorpusPipeline
import graft.operators.{Components, Dedup}
import graft.sources.WarcCodec

/** Incremental corpus ingestion — the growing-corpus form of
  * [[graft.CorpusPipeline]]: WARC blobs LAND in a watched directory and
  * each micro-batch flows through the same curation chain, then dedups
  * against the PERSISTED corpus state instead of against itself:
  *
  *   new blobs (file-source checkpoint = each blob exactly once)
  *   -> records -> htmlToText -> language/quality gates -> PII redact
  *   -> exact dedup vs the curated store's content hashes
  *   -> near-dup dedup vs the persisted band + array index (the x34
  *      incremental-LSH contract: new-vs-index and in-batch pairs only,
  *      never old-vs-old — per-batch cost involves NO recomputation
  *      over corpus history, just scans of the stored index)
  *   -> append survivors + their index rows, batch-atomically
  *
  * State layout under `workDir`: `curated/batch=N` (accepted documents
  * + content_hash), `bands/batch=N` + `docarrs/batch=N` (the two stored
  * halves of the near-dup index — LSH band rows for candidate
  * generation, one sorted shingle-hash array per doc for exact
  * verification), `ledger/batch=N` (per-batch counts),
  * `quarantine/batch=N` (failed-blob dead letters), `chk/` (the
  * file-source checkpoint). Every batch directory is
  * written with mode=overwrite keyed by the foreachBatch batchId, so a
  * crash-replayed batch REWRITES its own output instead of doubling it
  * — idempotent without a MERGE, the Delta-style exactly-once recipe on
  * plain parquet.
  *
  * Scale posture: per batch, the only state-sized work is one
  * band-bucket join against the index (8-byte keys) and one id
  * anti-join against the curated hashes; the WARC scan, curation, and
  * shingling touch only the batch. At 100 TB of accumulated corpus the
  * band index is what it is on disk — no rebuild, no full-corpus
  * shuffle, no driver materialization.
  */
class CorpusStream(spark: SparkSession, workDir: String,
                   cfg: CorpusPipeline.Config = CorpusPipeline.Config()) {
  import spark.implicits._

  private val curatedPath = s"$workDir/curated"
  private val bandPath = s"$workDir/bands"
  private val docArrPath = s"$workDir/docarrs"
  private val ledgerPath = s"$workDir/ledger"
  private val dlqPath = s"$workDir/quarantine"

  // binaryFile's fixed schema — file streams require it explicitly
  private val binSchema = new StructType()
    .add("path", StringType).add("modificationTime", TimestampType)
    .add("length", LongType).add("content",
      org.apache.spark.sql.types.BinaryType)

  private def readOr(path: String, empty: => DataFrame): DataFrame = {
    val dir = new java.io.File(path)
    // list the batch dirs EXPLICITLY (no glob): a glob re-resolves at
    // every downstream job and logs spurious FileNotFoundExceptions
    // when it races a concurrent batch write
    val parts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getAbsolutePath)
    if (parts.isEmpty) empty
    // drop the discovered partition column: state consumers see the
    // logical schema, not the storage layout
    else spark.read.option("basePath", path).parquet(parts.toIndexedSeq: _*).drop("batch")
  }

  /** The accumulated curated corpus (doc_id, url, date, text,
    * content_hash) — empty frame before the first batch lands.
    */
  def curated: DataFrame = readOr(curatedPath,
    Seq.empty[(String, String, String, String, String)]
      .toDF("doc_id", "url", "date", "text", "content_hash"))

  // the two persisted halves of the near-dup index (the x34 FromIndex
  // contract): LSH bands for candidate generation, per-doc sorted
  // shingle arrays for exact verification — one row per doc each, no
  // recomputation over corpus history at batch time
  private def bandIndex: DataFrame = readOr(bandPath,
    Seq.empty[(String, Int, Int)].toDF("id", "band", "bucket"))

  private def docArrIndex: DataFrame = readOr(docArrPath,
    Seq.empty[(String, Int, Array[Long])].toDF("id", "sz", "arr"))

  /** Per-batch ledger (batch_id, ingested, curatedIn, exactDropped,
    * nearDropped, accepted).
    */
  def ledger: DataFrame = readOr(ledgerPath,
    Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("batch_id", "ingested", "curated_in", "exact_dropped",
        "near_dropped", "accepted"))

  /** The dead-letter relation (path, blob_error): a poisoned blob costs
    * its own remaining records and lands here — the QueuePipeline DLQ
    * convention applied to the corpus path.
    */
  def quarantined: DataFrame = readOr(dlqPath,
    Seq.empty[(String, String)].toDF("path", "blob_error"))

  /** Drain every unseen WARC blob (Trigger.AvailableNow), processing
    * each through [[processBatch]]. Call repeatedly as new blobs land —
    * the checkpoint hands each blob to exactly one batch across runs.
    */
  def ingest(warcDir: String): StreamingQuery = {
    // register BEFORE start: the streaming runner clones the session at
    // query start, and a clone forked earlier would lack the native
    // functions the dedup verify kernel resolves by name
    graft.functions.GraftExtensions.register(spark)
    spark.readStream.format("binaryFile").schema(binSchema).load(warcDir)
      .select(col("path"))
      .writeStream
      .option("checkpointLocation", s"$workDir/chk")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId)
      }
      .start()
  }

  private def overwriteBatch(df: DataFrame, path: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$path/batch=$batchId")

  private[streaming] def processBatch(paths: DataFrame, batchId: Long): Unit = {
    // the micro-batch frame lives in the runner's cloned session —
    // make sure that registry has the native functions too
    graft.functions.GraftExtensions.register(paths.sparkSession)
    val raw = WarcCodec.rawDocumentsForPaths(spark,
      paths.select("path").as[String]).toDF().localCheckpoint(true)
    val docs = WarcCodec.documentsFromRaw(raw)

    // curation: the SAME stage transforms the batch pipeline runs
    val cur = CorpusPipeline.redactPii(
      CorpusPipeline.qualityFilter(
        CorpusPipeline.languageFilter(docs, cfg), cfg))
      .localCheckpoint(true)

    // exact dedup: in-batch keep-first, then anti-join the store's
    // hashes (id-level state probe; the store never re-shuffles itself).
    // content_hash is (re)derived AFTER exactKeepFirst — it drops its
    // internal column of the same name — with the same normalization.
    // no distinct() on the store side: every batch admits only hashes
    // unseen at its time, so stored content_hash values are globally
    // unique by construction — deduplicating them again would add a
    // full aggregation pass over corpus history per batch
    val exactKept = Dedup.exactKeepFirst(cur, "doc_id", "text")
      .withColumn("content_hash", md5(lower(trim(col("text")))))
      .join(curated.select(col("content_hash")), Seq("content_hash"), "left_anti")
      .localCheckpoint(true)

    // near-dup vs the persisted index (the x34 FromIndex shape: stored
    // bands + stored verification arrays, zero recompute over corpus
    // history). A new doc paired with ANY indexed doc loses (the index
    // is canonical history); surviving in-batch pairs canonicalize by
    // connected component.
    val newSh = Dedup.shingleTable(exactKept, "doc_id", "text", cfg.shingleN)
    val pairs = Dedup.incrementalMinhashLshPairsFromIndex(
      bandIndex, docArrIndex, newSh,
      cfg.numPerm, cfg.bands, cfg.nearDupThreshold)
      .localCheckpoint(true)
    val newIds = exactKept.select(col("doc_id"))
    val vsIndex = pairs
      .join(newIds.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .join(newIds.select(col("doc_id").as("b")), Seq("b"), "left_anti")
      .select(col("a").as("doc_id"))
      .unionByName(pairs
        .join(newIds.select(col("doc_id").as("b")), Seq("b"), "left_semi")
        .join(newIds.select(col("doc_id").as("a")), Seq("a"), "left_anti")
        .select(col("b").as("doc_id")))
      .distinct()
    val afterIndex = exactKept.join(vsIndex, Seq("doc_id"), "left_anti")
    val inBatchPairs = pairs
      .join(afterIndex.select(col("doc_id").as("a")), Seq("a"), "left_semi")
      .join(afterIndex.select(col("doc_id").as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
    val accepted = Components.keepCanonical(afterIndex, "doc_id", inBatchPairs)
      .localCheckpoint(true)

    // batch-atomic state append: overwrite-by-batchId = replay-idempotent
    overwriteBatch(raw.filter(col("blob_error").isNotNull)
      .select(col("path"), col("blob_error")), dlqPath, batchId)
    overwriteBatch(accepted, curatedPath, batchId)
    val acceptedSh = newSh
      .join(accepted.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .localCheckpoint(true)
    overwriteBatch(Dedup.lshBandTable(acceptedSh, cfg.numPerm, cfg.bands),
      bandPath, batchId)
    overwriteBatch(Dedup.docShingleArrays(acceptedSh), docArrPath, batchId)

    val nDocs = docs.count()
    val nCur = cur.count()
    val nExact = exactKept.count()
    val nAccepted = accepted.count()
    overwriteBatch(
      Seq((batchId, nDocs, nCur, nCur - nExact, nExact - nAccepted, nAccepted))
        .toDF("batch_id", "ingested", "curated_in", "exact_dropped",
          "near_dropped", "accepted"),
      ledgerPath, batchId)
  }
}
