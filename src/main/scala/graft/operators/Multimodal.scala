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
        length(col(textCol)).as("n_bytes")).as("media_meta"))

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

  /** Frame sampling over a (fake) video blob: emit every `stride`-th
    * frame index with a per-frame byte slice — exercises the explode
    * shape a real frame sampler would produce.
    */
  def sampleFrames(spark: SparkSession, blobs: DataFrame, stride: Int): DataFrame = {
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
