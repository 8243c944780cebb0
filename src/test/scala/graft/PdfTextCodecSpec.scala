package graft

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AdaptiveTable, PdfTextCodec, RealPdfCodec}
import graft.sources.PdfTableSource.StubPdfFormat

/** The genuine-PDF codec, bottom-up: inflate, tokenizer, CMap, text
  * interpreter, synthetic whole-document parses (rotate 0 and 90), and
  * the reference's real artifact UPDATED_NCA.PDF as a fixture
  * (reference: the document the dbm-nca-ph-etl pipeline actually
  * ingests; pdf_parser.py:52-96 runs pdfplumber over it).
  */
class PdfTextCodecSpec extends AnyFunSuite with org.scalactic.Tolerance {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("inflate round-trips deflated bytes") {
    val payload = ("BT (round trip) Tj ET " * 100).getBytes("ISO-8859-1")
    assert(PdfTextCodec.inflate(deflate(payload)).sameElements(payload))
  }

  test("tokenizer: strings with escapes, hex strings, arrays, names, numbers") {
    import PdfTextCodec._
    val toks = tokenize("""/F1 10.5 Tf (a\(b\)c\\d\101) Tj <414 2> Tj [(x) -120 (y)] TJ""")
    assert(toks(0) === TName("F1"))
    assert(toks(1) === TNum(10.5))
    assert(toks(2) === TOp("Tf"))
    assert(toks(3).asInstanceOf[TStr].codes.toSeq ===
      "a(b)c\\dA".map(_.toInt).toSeq) // \101 octal = 'A'
    // hex string: whitespace ignored, odd length padded with 0
    assert(toks(5).asInstanceOf[TStr].codes.toSeq === Seq(0x41, 0x42))
    val arr = toks(7).asInstanceOf[TArr].items
    assert(arr(0).asInstanceOf[TStr].codes.toSeq === Seq('x'.toInt))
    assert(arr(1) === TNum(-120))
    assert(toks(8) === TOp("TJ"))
  }

  test("tokenizer: balanced nested parens and inline dicts are handled") {
    import PdfTextCodec._
    val toks = tokenize("""(outer (inner) tail) Tj /MC <</P (skip me)>> BDC""")
    assert(new String(toks(0).asInstanceOf[TStr].codes.map(_.toChar)) ===
      "outer (inner) tail")
    assert(toks.collect { case TOp(o) => o } === Seq("Tj", "BDC"))
  }

  test("CMap: bfchar, contiguous bfrange, and array-form bfrange") {
    val cmap =
      """2 beginbfchar
        |<0001> <004e>
        |<0002> <0043>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0041>
        |<0020> <0021> [<0058> <0059>]
        |endbfrange""".stripMargin
    val m = PdfTextCodec.parseCMap(cmap)
    assert(m(1) === "N" && m(2) === "C")
    assert(m(0x10) === "A" && m(0x11) === "B" && m(0x12) === "C")
    assert(m(0x20) === "X" && m(0x21) === "Y")
  }

  test("CMap: array-form bfrange items never re-read as a contiguous range") {
    // the three consecutive array items would match the triple-hex
    // bfrange regex as a bogus <0058> <0059> <005A> range, overriding
    // the legitimate bfchar mapping for 0x58
    val cmap =
      """1 beginbfchar
        |<0058> <0041>
        |endbfchar
        |1 beginbfrange
        |<0001> <0003> [<0058> <0059> <005A>]
        |endbfrange""".stripMargin
    val m = PdfTextCodec.parseCMap(cmap)
    assert(m(1) === "X" && m(2) === "Y" && m(3) === "Z")
    assert(m(0x58) === "A", "bfchar mapping must survive the array body")
    assert(!m.contains(0x59))
  }

  test("object headers inside stream payloads do not shadow real objects") {
    val payload = "junk 5 0 obj << /Type /Garbage >> endobj junk"
    val pdf = ("%PDF-1.4\n" +
      "5 0 obj << /Real true >> endobj\n" +
      s"6 0 obj << /Length ${payload.length} >> stream\n" +
      payload + "\nendstream endobj\n%%EOF").getBytes("ISO-8859-1")
    val objs = PdfTextCodec.objects(pdf)
    assert(objs(5).dict.contains("/Real"),
      "a phantom header inside object 6's stream must not replace object 5")
    assert(new String(objs(6).streamRaw.get, "ISO-8859-1") === payload)
  }

  /** Minimal classic-layout PDF: one page, Flate content stream, one
    * font with no ToUnicode (printable-ASCII identity, default widths).
    */
  private def miniPdf(content: String, rotate: Int = 0): Array[Byte] = {
    val c = deflate(content.getBytes("ISO-8859-1"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w(s"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Rotate $rotate /Resources << /Font << /F1 5 0 R >> >> " +
      s"/Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${c.length} /Filter /FlateDecode >> stream\n")
    out.write(c)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("6 0 obj << /Producer (spec) /CreationDate (D:20250601093000Z) >> endobj\n")
    w("trailer << /Root 1 0 R /Info 6 0 R >>\n%%EOF")
    out.toByteArray
  }

  test("synthetic PDF: words with positions, space/gap/kern splits") {
    // default width 500/1000 em * 10pt = 5pt per glyph
    val content =
      "BT /F1 10 Tf 72 700 Td (Hello world) Tj ET " +
        "BT /F1 10 Tf 200 700 Td [(AB) -1000 (CD)] TJ ET"
    val doc = PdfTextCodec.parse(miniPdf(content)).get
    assert(doc.pages.length === 1)
    val words = doc.pages.head.words
    // y=700 from the bottom of a 792-high page -> top = 92
    assert(words.map(_.text) === Seq("Hello", "world", "AB", "CD"))
    val hello = words.head
    assert(hello.x0 === 72.0 +- 0.01)
    assert(hello.top === 92.0 +- 0.01)
    // "world" starts after "Hello " = 6 glyphs * 5pt
    assert(words(1).x0 === 102.0 +- 0.01)
    // TJ adjustment -1000 = +10pt gap after "AB" (2 glyphs from x=200)
    assert(words(3).x0 === 220.0 +- 0.01)
  }

  test("synthetic PDF rotated 90: coordinates and page width normalize") {
    // device (100, 50): under /Rotate 90 display -> x0 = 50, top = 100;
    // displayed width = mediabox HEIGHT = 792
    val doc = PdfTextCodec.parse(
      miniPdf("BT /F1 10 Tf 100 50 Td (R) Tj ET", rotate = 90)).get
    assert(doc.pageWidth === 792.0)
    val word = doc.pages.head.words.head
    assert(math.abs(word.x0 - 50.0) < 0.01, s"x0=${word.x0}")
    assert(math.abs(word.top - 100.0) < 0.01, s"top=${word.top}")
  }

  /** Classic-layout PDF with an UNCOMPRESSED content stream and an
    * indirect /Widths array — the two emitter layouts miniPdf doesn't
    * exercise.
    */
  private def rawPdf(content: String, fontExtra: String = "",
                     widthsObj: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica $fontExtra >> endobj\n")
    if (widthsObj.nonEmpty) w(s"7 0 obj $widthsObj endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    out.toByteArray
  }

  test("indirect /Widths object keeps every width in position") {
    // A (code 65) advances 1000/1000em * 10pt = 10pt; a shifted-by-one
    // parse would use B's 2000 and land the second char at 92, not 82
    val pdf = rawPdf("BT /F1 10 Tf 72 700 Td (AB) Tj ET",
      fontExtra = "/FirstChar 65 /Widths 7 0 R",
      widthsObj = "[1000 2000]")
    val chars = PdfTextCodec.parse(pdf).get.pages.head.chars.sortBy(_.x0)
    assert(chars.map(_.uni) === Seq("A", "B"))
    assert(chars(1).x0 === 82.0 +- 0.01)
  }

  test("Q restores text state set inside q..Q (font size does not leak)") {
    val content =
      "BT /F1 10 Tf 72 700 Td (A) Tj ET " +
        "q BT /F1 30 Tf 72 650 Td (X) Tj ET Q " +
        "BT 72 600 Td (CD) Tj ET"
    val chars = PdfTextCodec.parse(rawPdf(content)).get.pages.head.chars
    val cd = chars.filter(c => c.uni == "C" || c.uni == "D").sortBy(_.x0)
    // default width 500/1000em: 5pt at the restored fs=10 (15pt if the
    // q-scoped Tf 30 leaked through Q)
    assert(cd(1).x0 - cd(0).x0 === 5.0 +- 0.01)
  }

  test("parseable PDF without /CreationDate yields metadata, not an error") {
    // rawPdf writes no Info dict: the document is valid, so metadata
    // must return absent dates + the real page count (PyPDF2 meta.get
    // semantics) — only an UNPARSEABLE self-declared PDF may throw
    val pdf = rawPdf("BT /F1 10 Tf 72 700 Td (ok) Tj ET")
    val codec = RealPdfCodec(StubPdfFormat)
    val m = codec.metadata("nodates.pdf", pdf)
    assert(m.created_at === "" && m.modified_at === "")
    assert(m.page_count === 1)
  }

  test("stream data containing the bytes 'endstream' is not truncated") {
    val pdf = rawPdf("BT /F1 10 Tf 72 700 Td (endstream inside) Tj ET")
    val words = PdfTextCodec.parse(pdf).get.pages.head.words.map(_.text)
    assert(words === Seq("endstream", "inside"))
  }

  // ---- the reference's genuine artifact --------------------------------

  private lazy val ncaBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/UPDATED_NCA.PDF")
    try in.readAllBytes() finally in.close()
  }

  test("UPDATED_NCA.PDF: metadata and page count from real bytes") {
    val codec = RealPdfCodec(StubPdfFormat)
    val m = codec.metadata("UPDATED_NCA.PDF", ncaBytes)
    assert(m.created_at === "2026-02-21T09:05:00")
    assert(m.modified_at === "2026-02-21T09:05:00")
    assert(m.page_count === 1)
    assert(codec.pageCount(ncaBytes) === 1)
  }

  test("UPDATED_NCA.PDF: FlateDecode text extraction yields the header words") {
    val doc = PdfTextCodec.parse(ncaBytes).get
    assert(doc.pages.length === 1)
    // /Rotate 90 on a 792x1224 MediaBox -> displayed width 1224
    assert(doc.pageWidth === 1224.0)
    val texts = doc.pages.head.words.map(_.text)
    Seq("NCA", "NUMBER", "TYPE", "RELEASED", "DATE", "DEPARTMENT",
      "AGENCY", "OPERATING", "UNIT", "AMOUNT", "PURPOSE").foreach { t =>
      assert(texts.contains(t), s"missing word $t in $texts")
    }
  }

  test("UPDATED_NCA.PDF: adaptive table extraction discovers the columns") {
    val rows = RealPdfCodec(StubPdfFormat)
      .extract("UPDATED_NCA.PDF", ncaBytes, 1, 1).toSeq
    assert(rows.nonEmpty)
    val header = rows.head.cells
    assert(header === Seq("NCA NUMBER", "NCA TYPE", "RELEASED DATE",
      "DEPARTMENT", "AGENCY", "OPERATING UNIT", "AMOUNT", "PURPOSE"),
      s"header was $header")
    // the known first data row of the reference artifact
    val flat = rows.map(_.cells.map(c => Option(c).getOrElse("")).mkString("|"))
    assert(flat.exists(_.contains("TR")), s"no TR row in $flat")
    assert(flat.exists(_.contains("01/15/2026")), s"no date in $flat")
    assert(flat.exists(_.contains("1,626,450.00")), s"no amount in $flat")
  }

  /** Multi-page classic-layout PDF: one Flate content stream per page,
    * shared font, 850pt-wide MediaBox (the NCA layout is wide).
    */
  private def multiPdf(pages: Seq[Seq[(String, Int, Int)]]): Array[Byte] = {
    val n = pages.length
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (1 to n).map(i => s"${2 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    pages.zipWithIndex.foreach { case (_, i) =>
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 850 792] /Resources << /Font << /F1 ${3 + 2 * n} 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (words, i) =>
      val content = words.map { case (t, x, y) =>
        s"BT /F1 10 Tf $x $y Td ($t) Tj ET"
      }.mkString(" ")
      val c = deflate(content.getBytes("ISO-8859-1"))
      w(s"${3 + n + i} 0 obj << /Length ${c.length} /Filter /FlateDecode >> stream\n")
      out.write(c)
      w("\nendstream endobj\n")
    }
    w(s"${3 + 2 * n} 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    out.toByteArray
  }

  test("multi-page Flate PDF: page ranges slice through RealPdfCodec (OP-06)") {
    // page 1 carries the header phrases (boundary discovery reads page 1
    // only); pages 2 and 3 carry one data row each at the same x layout
    val header = Seq("nca", "number", "nca", "type", "released", "date",
      "department", "agency", "operating", "unit", "amount", "purpose")
    val phrases = Seq("nca_number", "nca_type", "released_date", "department",
      "agency", "operating_unit", "amount", "purpose")
    val headerWords = phrases.zipWithIndex.flatMap { case (p, i) =>
      p.split("_").zipWithIndex.map { case (t, j) => (t, 20 + i * 100 + j * 45, 700) }
    }
    val row2 = Seq("NCA-9", "Regular", "1/1/2024", "DOH", "AgX", "OU1",
      "10.00", "Meds").zipWithIndex.map { case (t, i) => (t, 20 + i * 100, 660) }
    val row3 = Seq("NCA-10", "Special", "2/1/2024", "DOTr", "AgY", "OU2",
      "20.00", "Rails").zipWithIndex.map { case (t, i) => (t, 20 + i * 100, 660) }
    val pdf = multiPdf(Seq(headerWords, row2, row3))

    val codec = RealPdfCodec(StubPdfFormat)
    assert(codec.pageCount(pdf) === 3)

    // mid-range extraction touches ONLY page 2
    val mid = codec.extract("d", pdf, 2, 2).toSeq
    assert(mid.map(_.page).distinct === Seq(2))
    assert(mid.map(_.cells) === Seq(Seq("NCA-9", "Regular", "1/1/2024",
      "DOH", "AgX", "OU1", "10.00", "Meds")))

    // full range: header row then both data rows, ord strictly increasing
    val all = codec.extract("d", pdf, 1, 3).toSeq
    assert(all.map(_.page) === Seq(1, 2, 3))
    assert(all.head.cells === Seq("nca number", "nca type", "released date",
      "department", "agency", "operating unit", "amount", "purpose"))
    assert(all.last.cells.head === "NCA-10")
    assert(all.map(_.ord) === all.map(_.ord).sorted)

    // out-of-range start/end clamp rather than throw
    assert(codec.extract("d", pdf, 3, 99).toSeq.map(_.page) === Seq(3))
  }

  test("corrupted real-PDF bytes never throw: parse yields None or a valid doc") {
    // executors must survive arbitrary document corruption — a poison
    // blob quarantines its message, it must not kill the task with an
    // uncaught parse exception (OP-61/62). Seeded corruption battery
    // over the genuine artifact: byte flips, truncations, splices.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 60) {
      val b = ncaBytes.clone()
      trial % 3 match {
        case 0 => // flip a handful of bytes anywhere
          (1 to 8).foreach { _ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
          assert(PdfTextCodec.parse(b).fold(true)(_.pages.nonEmpty), s"trial $trial")
        case 1 => // truncate at a random point
          val cut = 1 + rnd.nextInt(b.length - 1)
          assert(PdfTextCodec.parse(b.take(cut)).fold(true)(_.pages.nonEmpty),
            s"trial $trial")
        case 2 => // splice a random window with garbage
          val at = rnd.nextInt(b.length - 64)
          (at until at + 64).foreach(i => b(i) = rnd.nextInt(256).toByte)
          assert(PdfTextCodec.parse(b).fold(true)(_.pages.nonEmpty), s"trial $trial")
      }
    }
  }

  test("non-PDF bytes fall back to the stub codec") {
    val stub = StubPdfFormat.encode(Seq(Seq(Seq("a", "b"))))
    val rows = RealPdfCodec(StubPdfFormat).extract("d", stub, 1, 1).toSeq
    assert(rows.map(_.cells) === Seq(Seq("a", "b")))
    assert(PdfTextCodec.parse(stub).isEmpty)
  }
}
