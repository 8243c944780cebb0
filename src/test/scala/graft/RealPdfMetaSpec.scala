package graft

import graft.sources.{RealPdfCodec, RealPdfMeta}
import graft.sources.PdfTableSource.StubPdfFormat

/** OP-04/05 against GENUINE PDF bytes: a handcrafted minimal-but-valid
  * classic-layout PDF (catalog, page tree, two leaf pages, Info dict).
  */
class RealPdfMetaSpec extends SparkSpecBase {

  private val realPdf: Array[Byte] =
    """%PDF-1.4
      |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
      |2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >> endobj
      |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj
      |4 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj
      |5 0 obj << /Producer (graft-spec) /CreationDate (D:20240131120000+00'00')
      |  /ModDate (D:20240215083000Z) >> endobj
      |trailer << /Root 1 0 R /Info 5 0 R >>
      |%%EOF""".stripMargin.getBytes("ISO-8859-1")

  test("scans creation/mod dates and page count from real PDF bytes") {
    val m = RealPdfMeta.metadata("a.pdf", realPdf).get
    assert(m.created_at === "2024-01-31T12:00:00")
    assert(m.modified_at === "2024-02-15T08:30:00")
    assert(m.page_count === 2)
    assert(RealPdfMeta.pageCount(realPdf) === Some(2))
  }

  test("date parsing tolerates short forms; ModDate falls back to CreationDate") {
    val short = new String(realPdf, "ISO-8859-1")
      .replace("(D:20240131120000+00'00')", "(D:20240101)")
      .replace("/ModDate (D:20240215083000Z) ", "").getBytes("ISO-8859-1")
    val m = RealPdfMeta.metadata("a.pdf", short).get
    assert(m.created_at === "2024-01-01T00:00:00") // date-only form
    assert(m.modified_at === m.created_at)         // absent ModDate
  }

  test("non-PDF bytes are rejected and the composite falls back to the stub") {
    val stubBytes = StubPdfFormat.encode(Seq(Seq(Seq("h1", "h2"), Seq("a", "b"))))
    assert(RealPdfMeta.metadata("s", stubBytes) === None)
    assert(RealPdfMeta.pageCount(stubBytes) === None)

    val ext = RealPdfCodec(StubPdfFormat)
    // stub bytes -> stub codec answers
    assert(ext.metadata("s", stubBytes) === StubPdfFormat.metadata("s", stubBytes))
    assert(ext.pageCount(stubBytes) === 1)
    // real bytes -> scanner answers, same extractor instance
    assert(ext.metadata("a.pdf", realPdf).created_at === "2024-01-31T12:00:00")
    assert(ext.pageCount(realPdf) === 2)
    // extraction always delegates (content streams need a codec)
    assert(ext.extract("s", stubBytes, 1, 1).toSeq.head.cells === Seq("h1", "h2"))
  }

  test("incremental update: the LAST generation's dates and pages win") {
    // simulate an Acrobat-style incremental save: a rewritten page 3
    // (same object number) and a new Info dict appended after %%EOF —
    // the old generations remain in the byte stream
    val updated = (new String(realPdf, "ISO-8859-1") +
      """
        |3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Rotate 90 >> endobj
        |5 0 obj << /Producer (graft-spec) /CreationDate (D:20240131120000+00'00')
        |  /ModDate (D:20250601090000Z) >> endobj
        |trailer << /Root 1 0 R /Info 5 0 R >>
        |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    // page 3 was REWRITTEN, not added: still 2 pages
    assert(RealPdfMeta.pageCount(updated) === Some(2))
    // the appended Info dict's ModDate is the current one
    assert(RealPdfMeta.metadata("a.pdf", updated).get.modified_at
      === "2025-06-01T09:00:00")
  }

  test("a mixed blob corpus yields uniform CDC metadata through one extractor") {
    import spark.implicits._
    val ext = RealPdfCodec(StubPdfFormat)
    val blobs = Seq(("real.pdf", realPdf),
      ("stub.pdf", StubPdfFormat.encode(Seq(Seq(Seq("x")))))).toDF("doc", "content")
    val metas = blobs.as[(String, Array[Byte])]
      .map { case (d, b) => ext.metadata(d, b) }
      .collect().map(m => m.doc -> m.page_count).toMap
    assert(metas === Map("real.pdf" -> 2, "stub.pdf" -> 1))
  }
}
