package graft

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfStreamFilters, PdfTextCodec, RealPdfCodec}
import graft.sources.PdfTableSource.StubPdfFormat

/** PDF 1.5+ layouts and the stream-filter matrix: predictors
  * (TIFF 2, PNG Sub/Up/Average/Paeth), LZW (independent encoder
  * round-trip), ASCII85/Hex, RunLength; /Type /ObjStm object streams
  * with /Type /XRef directive precedence; and empty-password standard
  * security (RC4-128 R3 and AES-128 V4R4), including the
  * wrong-password dead-letter path. Every fixture is authored
  * byte-by-byte in this spec — no codec jars on either side.
  */
class PdfAdvancedSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  // ------------------------------------------------------------- predictors

  /** Forward PNG row filter (what an emitter writes) — the decoder must
    * invert it exactly.
    */
  private def pngPredict(data: Array[Byte], tag: Int, columns: Int,
                         bpp: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val prev = new Array[Byte](columns)
    data.grouped(columns).foreach { row0 =>
      val row = row0.padTo(columns, 0.toByte)
      out.write(tag)
      for (i <- 0 until columns) {
        val a = if (i >= bpp) row(i - bpp) & 0xFF else 0
        val b = prev(i) & 0xFF
        val c = if (i >= bpp) prev(i - bpp) & 0xFF else 0
        val x = row(i) & 0xFF
        val v = tag match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out.write(v & 0xFF)
      }
      System.arraycopy(row, 0, prev, 0, columns)
    }
    out.toByteArray
  }

  test("PNG predictors Sub/Up/Average/Paeth invert exactly") {
    val data = Array.tabulate(64)(i => ((i * 37 + 11) % 251).toByte)
    for (tag <- 1 to 4) {
      val parms = "<< /Predictor 12 /Columns 8 >>" // tag byte rules, not 12
      val got = PdfStreamFilters.unpredict(pngPredict(data, tag, 8), parms)
      assert(got.toSeq === data.toSeq, s"PNG filter $tag")
    }
  }

  test("TIFF predictor 2 inverts horizontal differencing") {
    val data = Array.tabulate(40)(i => ((i * 29 + 3) % 253).toByte)
    val columns = 10
    // forward: left-to-right deltas per row
    val enc = data.grouped(columns).flatMap { row =>
      row.zipWithIndex.map { case (b, i) =>
        if (i == 0) b else ((b - row(i - 1)) & 0xFF).toByte
      }
    }.toArray
    val got = PdfStreamFilters.unpredict(enc, "<< /Predictor 2 /Columns 10 >>")
    assert(got.toSeq === data.toSeq)
  }

  // -------------------------------------------------------------------- LZW

  /** Independent LZW encoder (9-12 bit MSB-first, earlyChange=1) — a
    * shared bug with the decoder cannot produce a passing round-trip of
    * varied data across the 9->10 bit boundary.
    */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0; var codeLen = 9
    def emit(code: Int): Unit = {
      acc = (acc << codeLen) | code; accBits += codeLen
      while (accBits >= 8) {
        out.write(((acc >> (accBits - 8)) & 0xFF).toInt); accBits -= 8
      }
    }
    val dict = collection.mutable.Map.empty[Seq[Byte], Int]
    for (i <- 0 until 256) dict(Seq(i.toByte)) = i
    var next = 258
    emit(256) // clear
    var cur = Vector.empty[Byte]
    data.foreach { b =>
      val ext = cur :+ b
      if (dict.contains(ext)) cur = ext
      else {
        emit(dict(cur))
        dict(ext) = next; next += 1
        // mirror of the decoder's width rule (earlyChange=1): the
        // decoder lags one table entry behind, so it widens when ITS
        // length+1 reaches 2^w — i.e. when the encoder's next reaches 2^w
        if (next >= (1 << codeLen) && codeLen < 12) codeLen += 1
        cur = Vector(b)
      }
    }
    if (cur.nonEmpty) emit(dict(cur))
    emit(257) // EOD
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xFF).toInt)
    out.toByteArray
  }

  test("LZW round-trips varied data across the 9->10 bit code boundary") {
    // enough distinct bigrams to push the table past 512 entries
    val data = latin1((0 until 3000).map(i => ((i * 7919) % 93 + 33).toChar).mkString)
    assert(PdfStreamFilters.lzw(lzwEncode(data), 1).toSeq === data.toSeq)
    // repetitive data exercises the KwKwK case
    val rep = latin1("ab" * 40 + "abcabcabc" * 30)
    assert(PdfStreamFilters.lzw(lzwEncode(rep), 1).toSeq === rep.toSeq)
  }

  test("LZW rejects out-of-range codes instead of fabricating output") {
    // 9-bit stream [256 clear, 65 'A', 400] — 400 is far beyond the
    // table (259 entries after one code): corruption must throw so the
    // document dead-letters rather than extract invented text
    def pack(codes: Seq[Int]): Array[Byte] = {
      var acc = 0L; var bits = 0
      val out = new java.io.ByteArrayOutputStream()
      codes.foreach { c =>
        acc = (acc << 9) | c; bits += 9
        while (bits >= 8) { out.write(((acc >> (bits - 8)) & 0xFF).toInt); bits -= 8 }
      }
      if (bits > 0) out.write(((acc << (8 - bits)) & 0xFF).toInt)
      out.toByteArray
    }
    intercept[java.io.IOException] {
      PdfStreamFilters.lzw(pack(Seq(256, 65, 400)), 1)
    }
    // the KwKwK boundary code (== table size) remains legal:
    // [256, 65, 258] decodes to "A" + "AA"
    assert(PdfStreamFilters.lzw(pack(Seq(256, 65, 258, 257)), 1).toSeq ===
      latin1("AAA").toSeq)
  }

  // -------------------------------------------------- ASCII85 / Hex / RL

  private def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      val full = g.padTo(4, 0.toByte)
      var v = 0L
      full.foreach(b => v = (v << 8) | (b & 0xFF))
      if (v == 0 && g.length == 4) sb += 'z'
      else {
        val cs = new Array[Char](5)
        for (i <- 4 to 0 by -1) { cs(i) = ((v % 85) + '!').toChar; v /= 85 }
        sb ++= new String(cs, 0, g.length + 1)
      }
    }
    latin1(sb.append("~>").toString)
  }

  test("ASCII85 round-trips, including z groups and a partial tail") {
    val data = Array.tabulate(23)(i => (i * 11).toByte) ++
      Array.fill(8)(0.toByte) ++ latin1("tail")
    assert(PdfStreamFilters.ascii85(a85Encode(data)).toSeq === data.toSeq)
  }

  test("ASCIIHex decodes with whitespace, terminator, odd padding") {
    assert(PdfStreamFilters.asciiHex(latin1("48 65\n6C6C 6F>junk")).toSeq ===
      latin1("Hello").toSeq)
    assert(PdfStreamFilters.asciiHex(latin1("414>")).toSeq ===
      Seq[Byte](0x41, 0x40))
  }

  test("RunLength decodes literal and repeat runs") {
    val enc = Array[Byte](2, 'a', 'b', 'c', (257 - 4).toByte, 'x', 0, 'z', 128.toByte)
    assert(PdfStreamFilters.runLength(enc).toSeq === latin1("abcxxxxz").toSeq)
  }

  test("filter chains apply in order (A85 then Flate)") {
    val content = latin1("BT (chained) Tj ET")
    val objs = Map.empty[Int, PdfTextCodec.PdfObj]
    val o = PdfTextCodec.PdfObj(1,
      "<< /Filter [/ASCII85Decode /FlateDecode] >>",
      Some(a85Encode(deflate(content))))
    assert(PdfTextCodec.streamData(objs, o).get.toSeq === content.toSeq)
  }

  // ------------------------------------------------------- simple-font /Encoding

  test("WinAnsi base + /Differences recover accented text without ToUnicode") {
    // WinAnsi byte 0xF1 is ñ via the base table; /Differences remaps
    // 0xC8 (È in WinAnsi) to /eacute — the override must beat the base
    val pdf = RealPdfFixtures.classicPdf(
      Seq(Seq(("Peñafrancia", 72, 700), ("cafÈ", 250, 700))),
      created = "D:20260101000000Z",
      fontExtra = "/Encoding << /BaseEncoding /WinAnsiEncoding " +
        "/Differences [200 /eacute] >>")
    val words = PdfTextCodec.parse(pdf).get.pages.head.words.map(_.text)
    assert(words === Seq("Peñafrancia", "café"))
  }

  test("bare /Encoding /MacRomanEncoding decodes the Mac high range") {
    // MacRoman byte 0x96 is ñ
    val pdf = RealPdfFixtures.classicPdf(
      Seq(Seq(("Pea", 72, 700))),
      created = "D:20260101000000Z",
      fontExtra = "/Encoding /MacRomanEncoding")
    val words = PdfTextCodec.parse(pdf).get.pages.head.words.map(_.text)
    assert(words === Seq("Peña"))
  }

  test("glyph-name resolution: AGL table, uniXXXX and uXXXX forms") {
    assert(PdfTextCodec.glyphToUni("ntilde") === "ñ")
    assert(PdfTextCodec.glyphToUni("Euro") === "€")
    assert(PdfTextCodec.glyphToUni("uni00F10041") === "ñA")
    assert(PdfTextCodec.glyphToUni("u00F1") === "ñ")
    assert(PdfTextCodec.glyphToUni("glyph999") === "")
  }

  // --------------------------------------------------------- object streams

  // shared builders (RealPdfFixtures) so the byte layouts the ETL e2e
  // runs over are the SAME bytes unit-tested here
  private def objStmPdf(withXref: Boolean, staleInfo: Boolean): Array[Byte] =
    RealPdfFixtures.objStmPdf(
      Seq(("MODERN", 72, 700), ("LAYOUT", 150, 700)),
      created = "D:20260301120000Z",
      withXref = withXref,
      staleInfoDate = if (staleInfo) Some("D:20200101000000Z") else None)

  test("object-stream PDF parses: words, page count, metadata from ObjStm") {
    val pdf = objStmPdf(withXref = true, staleInfo = false)
    val doc = PdfTextCodec.parse(pdf).get
    assert(doc.pages.length === 1)
    assert(doc.pages.head.words.map(_.text) === Seq("MODERN", "LAYOUT"))
    val codec = RealPdfCodec(StubPdfFormat)
    assert(codec.pageCount(pdf) === 1)
    val m = codec.metadata("modern.pdf", pdf)
    assert(m.created_at === "2026-03-01T12:00:00")
    assert(m.page_count === 1)
  }

  test("object-stream PDF without an xref stream still parses (scan fallback)") {
    val pdf = objStmPdf(withXref = false, staleInfo = false)
    val doc = PdfTextCodec.parse(pdf).get
    assert(doc.pages.head.words.map(_.text) === Seq("MODERN", "LAYOUT"))
  }

  test("a NEWER xref section's type-1 entry dethrones an older type-2 directive") {
    // incremental update of an ObjStm file: the original xref says
    // Info 6 lives in ObjStm 7 (type-2); the appended update writes a
    // new TOP-LEVEL object 6 and a newer xref stream whose type-1
    // entry for 6 must shadow the old directive — decided-across-types,
    // not just type-2 vs type-2
    val base = objStmPdf(withXref = true, staleInfo = false) // ObjStm date 2026-03-01
    val baseStr = new String(base, "ISO-8859-1")
    val sx = baseStr.lastIndexOf("startxref")
    val prevOff = """\d+""".r.findFirstIn(baseStr.substring(sx)).get.toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, sx)
    def w(s: String): Unit = out.write(latin1(s))
    val off6 = out.size()
    w("6 0 obj << /Producer (update) /CreationDate (D:20270101000000Z) >> endobj\n")
    val off10 = out.size()
    def row(t: Int, f2: Int, f3: Int) =
      Array[Byte](t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
    val pred = deflate(pngPredict(row(1, off6, 0) ++ row(1, off10, 0), 2, 4))
    w(s"10 0 obj << /Type /XRef /Size 11 /Root 1 0 R /Info 6 0 R " +
      s"/Prev $prevOff /W [1 2 1] /Index [6 1 10 1] /Length ${pred.length} " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> >> stream\n")
    out.write(pred)
    w("\nendstream endobj\n")
    w(s"startxref\n$off10\n%%EOF")
    val m = RealPdfCodec(StubPdfFormat).metadata("inc.pdf", out.toByteArray)
    assert(m.created_at === "2027-01-01T00:00:00",
      "the newest xref section's type-1 entry must win over the stale ObjStm directive")
  }

  test("xref-stream directive dethrones a stale top-level object") {
    // with the directive: ObjStm member 6 (new date) wins over the
    // stale top-level Info 6
    val withDirective = objStmPdf(withXref = true, staleInfo = true)
    val m = RealPdfCodec(StubPdfFormat).metadata("m.pdf", withDirective)
    assert(m.created_at === "2026-03-01T12:00:00",
      "xref type-2 directive must pick the ObjStm generation")
    // without it: the top-level scan wins (classic precedence)
    val without = objStmPdf(withXref = false, staleInfo = true)
    val m2 = RealPdfCodec(StubPdfFormat).metadata("m.pdf", without)
    assert(m2.created_at === "2020-01-01T00:00:00")
  }

  // -------------------------------------------------------------- encryption

  private def encryptedPdf(aes: Boolean, mangleU: Boolean = false): Array[Byte] =
    RealPdfFixtures.encryptedPdf(
      Seq(("CLASSIFIED", 72, 700), ("WORDS", 160, 700)),
      created = "D:20260401150000Z", aes = aes, mangleU = mangleU)

  test("RC4-128 empty-password PDF decrypts: words and metadata") {
    val pdf = encryptedPdf(aes = false)
    val doc = PdfTextCodec.parse(pdf).get
    assert(doc.pages.head.words.map(_.text) === Seq("CLASSIFIED", "WORDS"))
    val m = RealPdfCodec(StubPdfFormat).metadata("enc.pdf", pdf)
    assert(m.created_at === "2026-04-01T15:00:00")
    assert(m.page_count === 1)
  }

  test("AES-128 empty-password PDF decrypts: words and metadata") {
    val pdf = encryptedPdf(aes = true)
    val doc = PdfTextCodec.parse(pdf).get
    assert(doc.pages.head.words.map(_.text) === Seq("CLASSIFIED", "WORDS"))
    val m = RealPdfCodec(StubPdfFormat).metadata("enc.pdf", pdf)
    assert(m.created_at === "2026-04-01T15:00:00")
  }

  test("AES-256 V5 R6 empty-password PDF decrypts: words and metadata") {
    val pdf = RealPdfFixtures.encryptedPdfV5(
      Seq(("MODERN", 72, 700), ("CRYPTO", 160, 700)),
      created = "D:20260501120000Z")
    val doc = PdfTextCodec.parse(pdf).get
    assert(doc.pages.head.words.map(_.text) === Seq("MODERN", "CRYPTO"))
    val m = RealPdfCodec(StubPdfFormat).metadata("v5.pdf", pdf)
    assert(m.created_at === "2026-05-01T12:00:00")
  }

  test("AES-256 V5 R5 (simple hash) variant decrypts") {
    val pdf = RealPdfFixtures.encryptedPdfV5(
      Seq(("LEGACY", 72, 700), ("FIVE", 150, 700)),
      created = "D:20260502120000Z", r6 = false)
    assert(PdfTextCodec.parse(pdf).get.pages.head.words.map(_.text) ===
      Seq("LEGACY", "FIVE"))
  }

  test("wrong-password V5 PDF fails parse into the DLQ path") {
    val pdf = RealPdfFixtures.encryptedPdfV5(
      Seq(("X", 72, 700)), created = "D:20260501120000Z", mangleU = true)
    assert(PdfTextCodec.parse(pdf).isEmpty)
    intercept[java.io.IOException] {
      RealPdfCodec(StubPdfFormat).extract("locked.pdf", pdf, 1, 1).toSeq
    }
  }

  test("wrong-password PDF fails parse and takes the corrupt/DLQ path") {
    val pdf = encryptedPdf(aes = false, mangleU = true)
    assert(PdfTextCodec.parse(pdf).isEmpty)
    val e = intercept[java.io.IOException] {
      RealPdfCodec(StubPdfFormat).extract("locked.pdf", pdf, 1, 1).toSeq
    }
    assert(e.getMessage.contains("unparseable PDF"))
  }

  test("Identity crypt filters mean a PLAINTEXT body: no decryption applied") {
    // attachments-only encryption: /Encrypt present but StmF/StrF are
    // /Identity — decrypting the plaintext streams would corrupt them
    val content = deflate(latin1("BT /F1 10 Tf 72 700 Td (PLAIN BODY) Tj ET"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.6\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("9 0 obj << /Filter /Standard /V 4 /R 4 /Length 128 /P -44 " +
      "/CF << /StdCF << /CFM /AESV2 >> >> /StmF /Identity /StrF /Identity " +
      "/O <00> /U <00> >> endobj\n")
    w("trailer << /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF")
    val doc = PdfTextCodec.parse(out.toByteArray).get
    assert(doc.pages.head.words.map(_.text) === Seq("PLAIN", "BODY"))
  }

  test("password-protected PDF reports NO page count (doomed work is not scheduled)") {
    val locked = encryptedPdf(aes = false, mangleU = true)
    assert(graft.sources.RealPdfMeta.pageCount(locked).isEmpty)
    intercept[java.io.IOException] {
      RealPdfCodec(StubPdfFormat).pageCount(locked)
    }
  }

  test("an INDIRECT /Filter reference resolves instead of skipping decode") {
    val content = deflate(latin1("BT /F1 10 Tf 72 700 Td (INDIRECT) Tj ET"))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} /Filter 12 0 R >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w("12 0 obj /FlateDecode endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF")
    val doc = PdfTextCodec.parse(out.toByteArray).get
    assert(doc.pages.head.words.map(_.text) === Seq("INDIRECT"))
  }

  test("corrupting ObjStm/encrypted/V5 fixtures never throws from parse") {
    // the classic-layout corruption battery (PdfTextCodecSpec) extended
    // to the round's new layouts: byte flips, truncations, splices over
    // object-stream, RC4, AES-128 and AES-256 documents must yield None
    // or a valid doc — an uncaught exception would kill executor tasks
    // instead of dead-lettering the document (OP-61/62)
    val fixtures = Seq(
      objStmPdf(withXref = true, staleInfo = false),
      encryptedPdf(aes = false),
      encryptedPdf(aes = true),
      RealPdfFixtures.encryptedPdfV5(Seq(("F", 72, 700)), "D:20260101000000Z"))
    val rnd = new scala.util.Random(77)
    for (base <- fixtures; trial <- 1 to 24) {
      val b = base.clone()
      trial % 3 match {
        case 0 =>
          (1 to 8).foreach(_ => b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte)
          assert(PdfTextCodec.parse(b).fold(true)(_.pages.nonEmpty))
        case 1 =>
          val cut = 1 + rnd.nextInt(b.length - 1)
          assert(PdfTextCodec.parse(b.take(cut)).fold(true)(_.pages.nonEmpty))
        case 2 =>
          val at = rnd.nextInt(math.max(b.length - 64, 1))
          (at until math.min(at + 64, b.length)).foreach(i =>
            b(i) = rnd.nextInt(256).toByte)
          assert(PdfTextCodec.parse(b).fold(true)(_.pages.nonEmpty))
      }
    }
  }

  test("decrypted date strings survive re-escaping of delimiters") {
    // RC4 ciphertext may contain bytes that LOOK like ')' — the string
    // rewrite must parse the hex form and re-emit a balanced literal
    val pdf = encryptedPdf(aes = false)
    val meta = graft.sources.RealPdfMeta.metadata("enc.pdf", pdf)
    assert(meta.exists(_.created_at === "2026-04-01T15:00:00"))
  }
}
