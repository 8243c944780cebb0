package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500 web-archive, the CommonCrawl container) record
  * reader — the canonical ingestion path of a web-scale training-data
  * pipeline: WARC bytes -> (url, date, type, http content-type,
  * payload body) records, executor side, one pass per blob.
  *
  * Format: each record is a "WARC/1.x\r\n" version line, CRLF-separated
  * `Name: value` headers, CRLF CRLF, exactly Content-Length payload
  * bytes. Robustness posture (a poisoned record must cost ITSELF, not
  * its blob, and never a task):
  *  - gzip blobs (.warc.gz, the actual CommonCrawl distribution)
  *    transparently decompress — JDK GZIPInputStream consumes the
  *    member-per-record concatenation CommonCrawl uses;
  *  - header blocks parse within a bounded window (64 KiB), so a
  *    payload with no terminator cannot make parsing quadratic;
  *  - Content-Length is validated against the remaining bytes
  *    (negative/overflowing/truncating lengths skip the record);
  *  - a malformed record RESYNCS to the next "WARC/" boundary instead
  *    of discarding the rest of the blob; only a truncated TRAILING
  *    record is dropped outright;
  *  - response records carry the full HTTP message: the envelope
  *    (status line + headers) is split off, exposing the declared
  *    Content-Type and the bare body.
  */
object WarcCodec {

  final case class WarcRecord(url: String, date: String, warcType: String,
                              contentType: String, body: Array[Byte])

  private val HeaderWindow = 64 * 1024

  private def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  /** Header-block terminator inside a bounded window: (endIndex,
    * separatorLength) for the first CRLFCRLF or LFLF, whichever comes
    * first.
    */
  private def headerEnd(s: String, start: Int): Option[(Int, Int)] = {
    val window = math.min(s.length, start + HeaderWindow)
    var i = start
    while (i < window - 1) {
      if (s.charAt(i) == '\n') {
        if (s.charAt(i + 1) == '\n') return Some((i, 2))
        if (i + 2 < window && s.charAt(i + 1) == '\r' && s.charAt(i + 2) == '\n')
          return Some((i, 3))
      }
      i += 1
    }
    None
  }

  /** Split an HTTP message into (declared content-type, body). A
    * payload that does not start with an HTTP status line passes
    * through whole (conversion records, raw captures).
    */
  private def stripHttpEnvelope(payload: String): (String, String) =
    if (!payload.startsWith("HTTP/")) ("", payload)
    else headerEnd(payload, 0) match {
      case Some((he, sep)) =>
        val ct = """(?im)^content-type:\s*([^;\r\n]+)""".r
          .findFirstMatchIn(payload.substring(0, he))
          .map(_.group(1).trim.toLowerCase).getOrElse("")
        (ct, payload.substring(he + sep))
      case None => ("", payload) // headers never terminate: keep bytes
    }

  /** Parse every well-formed record in one WARC blob (gzip-transparent). */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    // latin-1: byte-transparent, so indexes are byte offsets and payload
    // slices recover exact bytes (the PdfTextCodec convention)
    val s = new String(gunzipIfNeeded(bytes), "ISO-8859-1")
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    var scanning = true
    while (scanning) {
      val start = s.indexOf("WARC/", i)
      if (start < 0) scanning = false
      else {
        def resync(): Unit = i = start + 5 // skip this marker, find the next
        headerEnd(s, start) match {
          case None => resync() // unterminated header block within the window
          case Some((he, sep)) =>
            val headers = s.substring(start, he).split("\r?\n").toSeq.drop(1)
              .flatMap { line =>
                val c = line.indexOf(':')
                if (c <= 0) None
                else Some(line.substring(0, c).trim.toLowerCase ->
                  line.substring(c + 1).trim)
              }.toMap
            headers.get("content-length").flatMap(_.toLongOption) match {
              // the subtraction form cannot overflow; negative and
              // beyond-the-blob lengths both fail it
              case Some(len) if len >= 0 && len <= (s.length - he - sep).toLong =>
                val payloadStart = he + sep
                val payloadEnd = payloadStart + len.toInt
                val (ct, body) =
                  stripHttpEnvelope(s.substring(payloadStart, payloadEnd))
                out += WarcRecord(
                  url = headers.getOrElse("warc-target-uri", ""),
                  date = headers.getOrElse("warc-date", ""),
                  warcType = headers.getOrElse("warc-type", ""),
                  contentType = ct,
                  body = body.getBytes("ISO-8859-1"))
                i = payloadEnd
              // a NEGATIVE length is nonsense — skip this record only; a
              // plausible length with the bytes missing is a truncated
              // trailing payload and ends the blob
              case Some(len) if len < 0 => resync()
              case Some(_) => scanning = false
              case None => resync() // unparsable Content-Length: this record only
            }
        }
      }
    }
    out.result()
  }

  /** (doc_id, url, date, text) over a directory of WARC blobs:
    * response records with a textual (or undeclared) content type, plus
    * conversion records, HTML reduced to text via
    * [[graft.operators.TextAnalysis.htmlToText]]. Binary resources
    * (images, PDFs) never enter the corpus as mojibake. doc_id is a
    * 128-bit md5 content hash — collision-safe at web scale where a
    * 64-bit hash meets the birthday bound — and (url, date) ride along
    * as the natural key. Fully distributed: binaryFile scan,
    * per-partition record parse, scan-project text extraction; shard
    * blobs the way the archive does (one task per .warc.gz member
    * file).
    */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(dir)
      .select(col("content")).as[Array[Byte]]
      .mapPartitions(_.flatMap(b => records(b)))
      .filter(r => r.warcType.equalsIgnoreCase("conversion") ||
        (r.warcType.equalsIgnoreCase("response") &&
          (r.contentType.isEmpty || r.contentType.startsWith("text/") ||
            r.contentType.contains("html") || r.contentType.contains("xml"))))
      .map(r => (r.url, r.date, new String(r.body,
        java.nio.charset.StandardCharsets.UTF_8)))
      .toDF("url", "date", "html")
      .select(
        md5(concat_ws("", col("url"), col("date"), col("html")))
          .as("doc_id"),
        col("url"), col("date"),
        graft.operators.TextAnalysis.htmlToText(col("html")).as("text"))
  }
}
