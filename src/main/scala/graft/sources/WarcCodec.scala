package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500 web-archive, the CommonCrawl container) record
  * reader — the canonical ingestion path of a web-scale training-data
  * pipeline: WARC bytes -> (url, date, type, payload) records, executor
  * side, one pass per blob.
  *
  * Format: each record is a "WARC/1.x\r\n" version line, CRLF-separated
  * `Name: value` headers, CRLF CRLF, exactly Content-Length payload
  * bytes, CRLF CRLF. Parsing is strict about Content-Length (payload
  * slicing never guesses) but lenient about unknown headers and LF-only
  * line endings (seen in the wild). A truncated trailing record is
  * dropped rather than guessed at — partial payloads must not enter the
  * corpus as if complete.
  */
object WarcCodec {

  final case class WarcRecord(url: String, date: String, warcType: String,
                              payload: Array[Byte])

  /** Parse every complete record in one WARC blob. */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    // latin-1: byte-transparent, so indexes are byte offsets and payload
    // slices recover exact bytes (the PdfTextCodec convention)
    val s = new String(bytes, "ISO-8859-1")
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    while (i < s.length) {
      val start = s.indexOf("WARC/", i)
      if (start < 0) return out.result()
      val headEnd = {
        val crlf = s.indexOf("\r\n\r\n", start)
        val lf = s.indexOf("\n\n", start)
        if (crlf >= 0 && (lf < 0 || crlf <= lf)) (crlf, 4)
        else if (lf >= 0) (lf, 2)
        else (-1, 0)
      }
      headEnd match {
        case (-1, _) => return out.result() // truncated header block
        case (he, sepLen) =>
          val headers = s.substring(start, he).split("\r?\n").toSeq.drop(1)
            .flatMap { line =>
              val c = line.indexOf(':')
              if (c <= 0) None
              else Some(line.substring(0, c).trim.toLowerCase ->
                line.substring(c + 1).trim)
            }.toMap
          headers.get("content-length").flatMap(_.toLongOption) match {
            case Some(len) if he + sepLen + len <= s.length =>
              val payloadStart = he + sepLen
              val payloadEnd = (payloadStart + len).toInt
              out += WarcRecord(
                url = headers.getOrElse("warc-target-uri", ""),
                date = headers.getOrElse("warc-date", ""),
                warcType = headers.getOrElse("warc-type", ""),
                payload = s.substring(payloadStart, payloadEnd)
                  .getBytes("ISO-8859-1"))
              i = payloadEnd
            case _ => return out.result() // missing length or truncated payload
          }
      }
    }
    out.result()
  }

  /** (doc_id, url, date, text) over a directory of WARC blobs: response
    * records only, HTML payloads reduced to text via
    * [[graft.operators.TextAnalysis.htmlToText]]. doc_id is a content
    * hash — deterministic across runs, partitionings, and cluster
    * sizes. Fully distributed: binaryFile scan, per-partition record
    * parse, scan-project text extraction.
    */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(dir)
      .select(col("content")).as[Array[Byte]]
      .mapPartitions(_.flatMap(b => records(b)))
      .filter(r => r.warcType.equalsIgnoreCase("response") ||
        r.warcType.equalsIgnoreCase("conversion"))
      .map(r => (r.url, r.date, new String(r.payload,
        java.nio.charset.StandardCharsets.UTF_8)))
      .toDF("url", "date", "html")
      .select(xxhash64(col("url"), col("date"), col("html")).as("doc_id"),
        col("url"), col("date"),
        graft.operators.TextAnalysis.htmlToText(col("html")).as("text"))
  }
}
