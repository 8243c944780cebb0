package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.WarcCodec

/** WARC container parsing and the HTML-to-text reduction — the
  * CommonCrawl-style ingestion path.
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

  test("records: CRLF and LF header variants, exact payload slicing") {
    val bytes = (rec("response", "http://a", "<p>alpha</p>") +
      rec("request", "http://a", "GET / HTTP/1.1") +
      rec("response", "http://b", "beta WARC/9.9 inside payload", lfOnly = true))
      .getBytes("ISO-8859-1")
    val rs = WarcCodec.records(bytes)
    assert(rs.map(_.warcType) === Seq("response", "request", "response"))
    assert(rs.map(_.url) === Seq("http://a", "http://a", "http://b"))
    // payload slicing is Content-Length-exact — a "WARC/" inside a
    // payload must not start a phantom record
    assert(new String(rs(2).payload, "ISO-8859-1") ===
      "beta WARC/9.9 inside payload")
  }

  test("a truncated trailing record is dropped, never guessed at") {
    val good = rec("response", "http://a", "complete")
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 500\r\n\r\nonly a few bytes"
    val rs = WarcCodec.records((good + bad).getBytes("ISO-8859-1"))
    assert(rs.map(r => new String(r.payload, "ISO-8859-1")) === Seq("complete"))
  }

  test("documents: WARC directory -> deterministic (doc_id, url, text)") {
    val dir = Files.createTempDirectory("warc").toString
    val warc = rec("response", "http://x/page",
      "<html><script>no()</script><body><h1>Title</h1>" +
        "<p>Hello &amp; welcome</p></body></html>") +
      rec("request", "http://x/page", "GET /") + // non-response: skipped
      rec("response", "http://y", "<b>Second</b> doc")
    Files.write(Paths.get(dir, "part.warc"), warc.getBytes("ISO-8859-1"))
    val docs = WarcCodec.documents(spark, dir)
      .orderBy("url").select("url", "text").as[(String, String)].collect().toSeq
    assert(docs === Seq(
      ("http://x/page", "Title Hello & welcome"),
      ("http://y", "Second doc")))
    // doc_id is a content hash: re-reads agree byte-for-byte
    val ids1 = WarcCodec.documents(spark, dir).select("doc_id").as[Long].collect().sorted
    val ids2 = WarcCodec.documents(spark, dir).select("doc_id").as[Long].collect().sorted
    assert(ids1.toSeq === ids2.toSeq && ids1.distinct.length === 2)
  }

  test("htmlToText: scripts/styles keep nothing, entities decode, ws collapses") {
    val html = """<html><style>p { x: y }</style><script src="a">if (1<2) alert()</script>
      |<body>A &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; B &amp;amp; C</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("t")).as[String].head()
    assert(out === "A <tag> \"q\" 's' B &amp; C")
  }
}
