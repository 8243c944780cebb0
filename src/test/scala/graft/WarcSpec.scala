package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.WarcCodec

/** WARC container parsing and the HTML-to-text reduction — the
  * CommonCrawl-style ingestion path: envelope stripping, content-type
  * filtering, gzip transparency, and per-record fault isolation.
  */
class WarcSpec extends SparkSpecBase {
  import spark.implicits._

  private def rec(typ: String, uri: String, payload: String,
                  lfOnly: Boolean = false): String = {
    val nl = if (lfOnly) "\n" else "\r\n"
    s"WARC/1.0${nl}WARC-Type: $typ${nl}WARC-Target-URI: $uri$nl" +
      s"WARC-Date: 2026-01-01T00:00:00Z${nl}Content-Length: ${payload.length}$nl$nl" +
      payload + s"$nl$nl"
  }

  private def http(contentType: String, body: String): String =
    s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Set-Cookie: secret=1\r\n\r\n" + body

  test("records: CRLF and LF variants, exact slicing, HTTP envelope split") {
    val bytes = (rec("response", "http://a", http("text/html", "<p>alpha</p>")) +
      rec("request", "http://a", "GET / HTTP/1.1") +
      rec("response", "http://b", "beta WARC/9.9 inside payload", lfOnly = true))
      .getBytes("ISO-8859-1")
    val rs = WarcCodec.records(bytes)
    assert(rs.map(_.warcType) === Seq("response", "request", "response"))
    // the HTTP status line, headers, and cookies are NOT part of the body
    assert(new String(rs(0).body, "ISO-8859-1") === "<p>alpha</p>")
    assert(rs(0).contentType === "text/html")
    // payload slicing is Content-Length-exact — a "WARC/" inside a
    // payload must not start a phantom record; no envelope -> whole body
    assert(new String(rs(2).body, "ISO-8859-1") ===
      "beta WARC/9.9 inside payload")
  }

  test("gzip blobs decompress transparently (.warc.gz distribution format)") {
    val plain = rec("response", "http://a", http("text/html", "zipped")).getBytes("ISO-8859-1")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    val rs = WarcCodec.records(bos.toByteArray)
    assert(rs.length === 1 && new String(rs.head.body, "ISO-8859-1") === "zipped")
  }

  test("malformed records cost themselves, not the blob") {
    val good1 = rec("response", "http://ok1", "first")
    // negative length, absurd length, unparsable length — each must be
    // skipped (or end the blob for the truncating one) without a throw
    val negative = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -7\r\n\r\nx\r\n\r\n"
    val unparsable = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: abc\r\n\r\nx\r\n\r\n"
    val good2 = rec("response", "http://ok2", "second")
    val rs = WarcCodec.records((good1 + negative + unparsable + good2)
      .getBytes("ISO-8859-1"))
    assert(rs.map(_.url).filter(_.startsWith("http://ok")) ===
      Seq("http://ok1", "http://ok2"),
      "records after a malformed one must survive via resync")
    // truncated TRAILING record: dropped, never guessed
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 500\r\n\r\nfew bytes"
    val rs2 = WarcCodec.records((good1 + bad).getBytes("ISO-8859-1"))
    assert(rs2.map(_.url) === Seq("http://ok1"))
  }

  test("documents: envelope stripped, binary content-types excluded, md5 ids") {
    val dir = Files.createTempDirectory("warc").toString
    val warc = rec("response", "http://x/page", http("text/html",
      "<html><script>no()</script><body><h1>Title</h1>" +
        "<p>Hello &amp; welcome</p></body></html>")) +
      rec("response", "http://x/logo", http("image/png", "PNG binary junk")) +
      rec("request", "http://x/page", "GET /") +
      rec("conversion", "http://y", "Already plain text")
    Files.write(Paths.get(dir, "part.warc"), warc.getBytes("ISO-8859-1"))
    val docs = WarcCodec.documents(spark, dir)
      .orderBy("url").select("url", "text").as[(String, String)].collect().toSeq
    assert(docs === Seq(
      ("http://x/page", "Title Hello & welcome"),
      ("http://y", "Already plain text")),
      "image responses and requests must not become documents")
    // doc_id: md5 content hash (no 64-bit birthday exposure), stable
    val ids1 = WarcCodec.documents(spark, dir).select("doc_id").as[String].collect().sorted
    val ids2 = WarcCodec.documents(spark, dir).select("doc_id").as[String].collect().sorted
    assert(ids1.toSeq === ids2.toSeq && ids1.distinct.length === 2)
  }

  test("htmlToText: scripts/styles keep nothing, entities decode, ws collapses") {
    val html = """<html><style>p { x: y }</style><script src="a">if (1<2) alert()</script>
      |<body>A &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; B &amp;amp; C</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("t")).as[String].head()
    assert(out === "A <tag> \"q\" 's' B &amp; C")
  }

  test("htmlToText: free-standing comparisons survive; truncated scripts leak nothing") {
    val cases = Seq(
      // a bare '<'/'>' pair is prose, not a tag
      "<p>if x < y then y > x</p>" -> "if x < y then y > x",
      // truncated fetch: the unclosed script body must NOT leak as text
      "<body>keep<script>var secret = 1;" -> "keep",
      // whitespace before the closer is valid HTML
      "<script>x()</script ><b>ok</b>" -> "ok")
    cases.foreach { case (in, want) =>
      val out = Seq(in).toDF("h")
        .select(TextAnalysis.htmlToText(col("h")).as("t")).as[String].head()
      assert(out === want, s"input: $in")
    }
  }
}
