package graft

import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PdfCrypto, PdfStreamFilters, PdfTextCodec, RealPdfCodec}
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
  private def hex(b: Array[Byte]): String = b.map("%02X".format(_)).mkString

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

  // --------------------------------------------------------- object streams

  /** PDF 1.5 fixture: catalog/pages/page/font/Info live inside a
    * compressed /Type /ObjStm; the content stream stays top-level; a
    * /Type /XRef stream (FlateDecode + PNG-Up predictor 12) carries the
    * type-2 directives. `staleInfo` additionally plants an OLD
    * top-level Info object that only the xref directive can dethrone.
    */
  private def objStmPdf(withXref: Boolean, staleInfo: Boolean): Array[Byte] = {
    val members = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      5 -> "<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
      6 -> "<< /Producer (spec) /CreationDate (D:20260301120000Z) >>")
    val bodies = members.map(_._2)
    val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = members.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = latin1(header + bodies.mkString("\n"))
    val objStm = deflate(payload)
    val content = deflate(latin1("BT /F1 10 Tf 72 700 Td (MODERN LAYOUT) Tj ET"))

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.5\n")
    if (staleInfo)
      w("6 0 obj << /Producer (old) /CreationDate (D:20200101000000Z) >> endobj\n")
    val off4 = out.size()
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    val off7 = out.size()
    w(s"7 0 obj << /Type /ObjStm /N ${members.length} /First ${header.length} " +
      s"/Length ${objStm.length} /Filter /FlateDecode >> stream\n")
    out.write(objStm)
    w("\nendstream endobj\n")
    val off8 = out.size()
    if (withXref) {
      // entries for objects 0..8: W = [1 2 1]
      def row(t: Int, f2: Int, f3: Int) =
        Array[Byte](t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
      val stmIdx = members.map(_._1).zipWithIndex.toMap
      val rows = (0 to 8).map {
        case 0 => row(0, 0, 255)
        case 4 => row(1, off4, 0)
        case 7 => row(1, off7, 0)
        case 8 => row(1, off8, 0)
        case n => row(2, 7, stmIdx(n)) // in ObjStm 7 at member index
      }
      // PNG-Up (tag 2) forward prediction, then Flate — the layout every
      // real writer emits for xref streams
      val cols = 4
      val pred = {
        val b = new java.io.ByteArrayOutputStream()
        var prev = new Array[Byte](cols)
        rows.foreach { r =>
          b.write(2)
          for (i <- 0 until cols) b.write((r(i) - prev(i)) & 0xFF)
          prev = r
        }
        deflate(b.toByteArray)
      }
      w(s"8 0 obj << /Type /XRef /Size 9 /Root 1 0 R /Info 6 0 R " +
        s"/W [1 2 1] /Index [0 9] /Length ${pred.length} /Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 12 /Colors 1 /BitsPerComponent 8 /Columns 4 >> " +
        s">> stream\n")
      out.write(pred)
      w("\nendstream endobj\n")
      w(s"startxref\n$off8\n%%EOF")
    } else {
      w("trailer << /Root 1 0 R /Info 6 0 R >>\n%%EOF")
    }
    out.toByteArray
  }

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

  /** Classic-layout fixture encrypted with the standard handler and an
    * empty user password: RC4-128 (V2 R3) or AES-128 (V4 R4 /AESV2).
    * Streams and dict strings are independently encrypted per object,
    * exactly as a conforming writer does. `mangleU` flips the /U entry
    * so the empty-password check must fail.
    */
  private def encryptedPdf(aes: Boolean, mangleU: Boolean = false): Array[Byte] = {
    val id0 = latin1("fixture-doc-id-1")
    val r = if (aes) 4 else 3
    val v = if (aes) 4 else 2
    val p = -44
    val o32 = PdfCrypto.ownerEntry(Array.emptyByteArray, Array.emptyByteArray, r, 128)
    val key = PdfCrypto.fileKey(o32, p, id0, r, 128, encryptMetadata = true)
    val u = PdfCrypto.expectedU(key, id0, r) ++ Array.fill(16)(0.toByte)
    if (mangleU) u(0) = (u(0) ^ 0x5A).toByte
    val dec = PdfCrypto.Decryptor(key, aes)

    val content = dec.encrypt(4, deflate(latin1(
      "BT /F1 10 Tf 72 700 Td (CLASSIFIED WORDS) Tj ET")))
    val date = dec.encrypt(6, latin1("D:20260401150000Z"))
    val cf =
      if (aes) "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
        "/StmF /StdCF /StrF /StdCF "
      else ""

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
    w(s"6 0 obj << /Producer <${hex(dec.encrypt(6, latin1("spec")))}> " +
      s"/CreationDate <${hex(date)}> >> endobj\n")
    w(s"9 0 obj << /Filter /Standard /V $v /R $r /Length 128 /P $p " +
      s"$cf/O <${hex(o32)}> /U <${hex(u)}> >> endobj\n")
    w(s"trailer << /Root 1 0 R /Info 6 0 R /Encrypt 9 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF")
    out.toByteArray
  }

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

  test("wrong-password PDF fails parse and takes the corrupt/DLQ path") {
    val pdf = encryptedPdf(aes = false, mangleU = true)
    assert(PdfTextCodec.parse(pdf).isEmpty)
    val e = intercept[java.io.IOException] {
      RealPdfCodec(StubPdfFormat).extract("locked.pdf", pdf, 1, 1).toSeq
    }
    assert(e.getMessage.contains("unparseable PDF"))
  }

  test("decrypted date strings survive re-escaping of delimiters") {
    // RC4 ciphertext may contain bytes that LOOK like ')' — the string
    // rewrite must parse the hex form and re-emit a balanced literal
    val pdf = encryptedPdf(aes = false)
    val meta = graft.sources.RealPdfMeta.metadata("enc.pdf", pdf)
    assert(meta.exists(_.created_at === "2026-04-01T15:00:00"))
  }
}
