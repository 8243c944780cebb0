package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata structs, decoded via a per-partition map (the Scala analog of
  * a batched Pandas UDF / mapInPandas).
  *
  * The actual byte-level decode is STUBBED with a deterministic fake —
  * image/audio codec libraries are not available in this environment.
  * Everything around the stub is real and tested: schema, binary column
  * plumbing, partition-wise batching, and the typed output Encoder. To
  * productionize, replace [[stubDecode]]'s body with a real codec call;
  * no plan-level change is needed.
  */
object Multimodal {

  /** Typed decode output (what a real image decoder would yield). */
  final case class MediaMeta(
      doc_id: Long, byte_len: Int, format: String,
      width: Int, height: Int, n_frames: Int)

  /** Attach an opaque blob column + metadata struct to a document table —
    * the canonical multimodal column shape: (id, content: binary,
    * media_meta: struct<mime, n_bytes>).
    */
  def attachBlobs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("content"),
      struct(lit("application/octet-stream").as("mime"),
        // BYTE length of the content, not the character count: they
        // diverge on any non-ASCII text (length(string) counts chars),
        // and n_bytes must agree with the decoder's bytes.length
        length(col(textCol).cast("binary")).as("n_bytes")).as("media_meta"))

  /** DETERMINISTIC FAKE decoder — stands in for e.g. an image header
    * parse. Pure function of the bytes, so re-runs and retries agree.
    */
  private def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length
    val checksum = bytes.foldLeft(0)((a, b) => (a * 31 + b) & 0x7fffffff)
    MediaMeta(
      doc_id = id,
      byte_len = len,
      format = if (checksum % 2 == 0) "png" else "jpeg",
      width = 16 + checksum % 640,
      height = 16 + (checksum / 7) % 480,
      n_frames = 1 + checksum % 16)
  }

  /** Decode blob metadata with a partition-wise map over the binary
    * column — executors stream batches through the decoder; nothing is
    * collected to the driver. This is the extension point where a real
    * codec (or an Arrow-batched Python worker) plugs in.
    */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
      .toDF()
  }

  /** The decoder's expectation recomputed through a SECOND, independent
    * code path — pure Catalyst expressions instead of the JVM closure —
    * for the x12g verification gate. Bytes are read via
    * hex(substr(content, i, 1)) and re-signed, so the recompute sees
    * exactly the signed bytes [[stubDecode]]'s fold sees, for arbitrary
    * (non-ASCII) UTF-8. The JVM fold's 32-bit Int wrap + positive mask
    * is reproduced in Long arithmetic: acc stays < 2^31 after each
    * mask, so acc*31+b never exceeds Long range and
    * (acc*31+b) & 0x7fffffff equals the Int-wrapped-then-masked value.
    */
  def expectedMeta(blobs: DataFrame): DataFrame = {
    val len = length(col("content"))
    val signedBytes = when(len > 0,
        transform(sequence(lit(1), len), i => {
          val u = conv(hex(col("content").substr(i, lit(1))), 16, 10).cast("long")
          when(u > 127, u - 256).otherwise(u)
        }))
      .otherwise(array().cast("array<long>"))
    val ck = aggregate(signedBytes, lit(0L),
      (acc, b) => (acc * 31 + b).bitwiseAND(lit(0x7fffffffL)))
    blobs.select(col("doc_id"),
      len.as("exp_byte_len"),
      when(ck % 2 === 0, "png").otherwise("jpeg").as("exp_format"),
      (ck % 640 + 16).cast("int").as("exp_width"),
      (floor(ck / lit(7)) % 480 + 16).cast("int").as("exp_height"),
      (ck % 16 + 1).cast("int").as("exp_n_frames"))
  }

  /** Rows where the decoded metadata diverges from the independent
    * recomputation — the x12g gate body; empty iff the two code paths
    * agree on every field of every document.
    */
  def metaMismatches(decoded: DataFrame, expected: DataFrame): DataFrame =
    decoded.join(expected, "doc_id")
      .filter(col("byte_len") =!= col("exp_byte_len") ||
        col("format") =!= col("exp_format") ||
        col("width") =!= col("exp_width") ||
        col("height") =!= col("exp_height") ||
        col("n_frames") =!= col("exp_n_frames"))
      .select(col("doc_id"), col("byte_len"), col("exp_byte_len"),
        col("format"), col("exp_format"), col("width"), col("exp_width"),
        col("height"), col("exp_height"), col("n_frames"), col("exp_n_frames"))

  /** Resize plumbing: re-encode each blob to a target (width, height),
    * updating the metadata struct in the same pass. The byte transform
    * is the stub (a deterministic re-slice standing in for a pixel
    * resampler); the shape — binary in, binary + revised meta out, one
    * partition-wise pass, no driver involvement — is the real contract.
    */
  def resize(spark: SparkSession, blobs: DataFrame, width: Int, height: Int): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val m = stubDecode(id, bytes)
        // fake resample: scale the byte budget by target/source area —
        // all in Long (an Int width*height overflows at 64k x 64k) and
        // clamped before the narrowing
        val budget = math.max(1L, math.min(Int.MaxValue.toLong,
          bytes.length.toLong * (width.toLong * height) /
            math.max(m.width.toLong * m.height, 1L))).toInt
        val out = if (budget <= bytes.length) bytes.take(budget)
          else bytes ++ Array.fill(budget - bytes.length)(0: Byte)
        (id, out, m.format, width, height)
      })
      .toDF("doc_id", "content", "format", "width", "height")
  }

  /** Feature extraction: blob -> dense embedding (array<float>), the
    * step that bridges multimodal data into the similarity operators
    * (Similarity.bruteForceTopK / lshTopK / ivfTopK run on this output
    * unchanged). The stub derives a deterministic unit-norm vector from
    * rolling byte hashes — a real model server would replace only the
    * per-batch body.
    */
  def featureExtract(spark: SparkSession, blobs: DataFrame, dim: Int = 16): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val raw = Array.tabulate(dim) { d =>
          var h = 1125899906842597L + d
          bytes.foreach(b => h = h * 31 + b)
          ((h % 1000).toFloat / 1000.0f)
        }
        val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
        (id, raw.map(x => if (n == 0) 0.0f else x / n).toSeq)
      })
      .toDF("doc_id", "embedding")
  }

  /** Frame sampling over a (fake) video blob: emit every `stride`-th
    * frame index with a per-frame byte slice — exercises the explode
    * shape a real frame sampler would produce.
    */
  def sampleFrames(spark: SparkSession, blobs: DataFrame, stride: Int): DataFrame = {
    // fail at the call site: stride=0 would throw "step cannot be 0"
    // per-row inside executor tasks; negative strides silently emit
    // nothing for every document
    require(stride > 0, s"stride must be > 0, got $stride")
    import spark.implicits._
    blobs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val meta = stubDecode(id, bytes)
        (0 until meta.n_frames by stride).map { f =>
          val sliceLen = math.max(1, bytes.length / meta.n_frames)
          val start = math.min(f * sliceLen, math.max(bytes.length - 1, 0))
          (id, f, bytes.slice(start, math.min(start + sliceLen, bytes.length)))
        }
      }
      .toDF("doc_id", "frame", "frame_bytes")
  }
}
