package graft

import java.util.zip.Deflater

import graft.sources.PdfCrypto

/** Authoring factory for GENUINE table-bearing PDFs in the three layouts
  * the codec supports — classic multi-page Flate, PDF 1.5 object
  * streams (+ /Type /XRef), and standard-security empty-password
  * encryption — so e2e specs can run the real extraction path over a
  * corpus with zero stub members. Word layout mirrors the NCA artifact:
  * header phrases split into words on a 100pt column grid, data cells
  * left-aligned on the same grid.
  */
object RealPdfFixtures {

  val Phrases = Seq("nca_number", "nca_type", "released_date", "department",
    "agency", "operating_unit", "amount", "purpose")

  def headerWords(y: Int = 700): Seq[(String, Int, Int)] =
    Phrases.zipWithIndex.flatMap { case (p, i) =>
      p.split("_").zipWithIndex.map { case (t, j) => (t, 20 + i * 100 + j * 45, y) }
    }

  def rowWords(cells: Seq[String], y: Int): Seq[(String, Int, Int)] =
    cells.zipWithIndex.map { case (t, i) => (t, 20 + i * 100, y) }

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

  private def contentOf(words: Seq[(String, Int, Int)]): String =
    words.map { case (t, x, y) => s"BT /F1 10 Tf $x $y Td ($t) Tj ET" }
      .mkString(" ")

  /** Classic layout: one Flate content stream per page, shared font,
    * Info dict with the given creation date.
    */
  def classicPdf(pages: Seq[Seq[(String, Int, Int)]], created: String,
                 fontExtra: String = ""): Array[Byte] = {
    val n = pages.length
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kids = (1 to n).map(i => s"${2 + i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    pages.indices.foreach { i =>
      w(s"${3 + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 850 792] /Resources << /Font << /F1 ${3 + 2 * n} 0 R >> >> " +
        s"/Contents ${3 + n + i} 0 R >> endobj\n")
    }
    pages.zipWithIndex.foreach { case (words, i) =>
      val c = deflate(latin1(contentOf(words)))
      w(s"${3 + n + i} 0 obj << /Length ${c.length} /Filter /FlateDecode >> stream\n")
      out.write(c)
      w("\nendstream endobj\n")
    }
    w(s"${3 + 2 * n} 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica $fontExtra >> endobj\n")
    w(s"${4 + 2 * n} 0 obj << /Producer (fixtures) /CreationDate ($created) >> endobj\n")
    w(s"trailer << /Root 1 0 R /Info ${4 + 2 * n} 0 R >>\n%%EOF")
    out.toByteArray
  }

  /** PDF 1.5 layout: catalog/pages/page/font/Info compressed inside a
    * /Type /ObjStm, content stream top-level, /Type /XRef stream
    * (FlateDecode + PNG-Up predictor) carrying the type-2 directives.
    * Single page. `withXref=false` drops the xref stream (scan-fallback
    * layout); `staleInfoDate` additionally plants an OLD top-level Info
    * object 6 that only an xref directive can dethrone.
    */
  def objStmPdf(words: Seq[(String, Int, Int)], created: String,
                withXref: Boolean = true,
                staleInfoDate: Option[String] = None): Array[Byte] = {
    val members = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 850 792] " +
        "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
      5 -> "<< /Type /Font /Subtype /TrueType /BaseFont /Helvetica >>",
      6 -> s"<< /Producer (fixtures) /CreationDate ($created) >>")
    val bodies = members.map(_._2)
    val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init
    val header = members.map(_._1).zip(offs)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val objStm = deflate(latin1(header + bodies.mkString("\n")))
    val content = deflate(latin1(contentOf(words)))

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.5\n")
    staleInfoDate.foreach { old =>
      w(s"6 0 obj << /Producer (old) /CreationDate ($old) >> endobj\n")
    }
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
      def row(t: Int, f2: Int, f3: Int) =
        Array[Byte](t.toByte, ((f2 >> 8) & 0xFF).toByte, (f2 & 0xFF).toByte, f3.toByte)
      val stmIdx = members.map(_._1).zipWithIndex.toMap
      val rows = (0 to 8).map {
        case 0 => row(0, 0, 255)
        case 4 => row(1, off4, 0)
        case 7 => row(1, off7, 0)
        case 8 => row(1, off8, 0)
        case n => row(2, 7, stmIdx(n))
      }
      val pred = {
        val b = new java.io.ByteArrayOutputStream()
        var prev = new Array[Byte](4)
        rows.foreach { r =>
          b.write(2) // PNG Up
          for (i <- 0 until 4) b.write((r(i) - prev(i)) & 0xFF)
          prev = r
        }
        deflate(b.toByteArray)
      }
      w(s"8 0 obj << /Type /XRef /Size 9 /Root 1 0 R /Info 6 0 R " +
        s"/W [1 2 1] /Index [0 9] /Length ${pred.length} /Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 12 /Columns 4 >> >> stream\n")
      out.write(pred)
      w("\nendstream endobj\n")
      w(s"startxref\n$off8\n%%EOF")
    } else {
      w("trailer << /Root 1 0 R /Info 6 0 R >>\n%%EOF")
    }
    out.toByteArray
  }

  /** AES-256 (V5) variant: R6 = ISO 32000-2 hardened hash, R5 = the
    * deprecated simple-SHA-256 extension. /U carries hash + validation
    * salt + key salt; /UE wraps a random-but-fixed 32-byte file key.
    */
  def encryptedPdfV5(words: Seq[(String, Int, Int)], created: String,
                     r6: Boolean = true, mangleU: Boolean = false): Array[Byte] = {
    val pwd = Array.emptyByteArray
    val vSalt = latin1("vsalt-08")
    val kSalt = latin1("ksalt-08")
    def h(salt: Array[Byte]): Array[Byte] =
      if (r6) PdfCrypto.hash2B(pwd, salt, Array.emptyByteArray)
      else PdfCrypto.sha("SHA-256", pwd, salt)
    val fileKey = PdfCrypto.sha("SHA-256", latin1("fixture-v5-file-key"))
    val u0 = h(vSalt).take(32)
    if (mangleU) u0(0) = (u0(0) ^ 0x5A).toByte
    val u = u0 ++ vSalt ++ kSalt
    val ue = PdfCrypto.aesCbcRaw(h(kSalt), new Array[Byte](16), fileKey,
      encrypt = true)
    val dec = PdfCrypto.Decryptor(fileKey, aes = true, perObjectKey = false)
    val content = dec.encrypt(4, deflate(latin1(contentOf(words))))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.7\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 850 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w(s"6 0 obj << /CreationDate <${hex(dec.encrypt(6, latin1(created)))}> >> endobj\n")
    w(s"9 0 obj << /Filter /Standard /V 5 /R ${if (r6) 6 else 5} /Length 256 " +
      s"/P -44 /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> " +
      s"/StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(Array.fill[Byte](48)(0x11))}> /OE <${hex(Array.fill[Byte](32)(0x22))}> " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> >> endobj\n")
    w("trailer << /Root 1 0 R /Info 6 0 R /Encrypt 9 0 R >>\n%%EOF")
    out.toByteArray
  }

  /** Classic single-page layout encrypted by the standard handler with
    * an empty user password — RC4-128 (V2 R3) or AES-128 (V4 R4
    * /AESV2): content stream and Info strings independently encrypted
    * per object. `mangleU` flips a byte of /U so the empty-password
    * check must fail.
    */
  def encryptedPdf(words: Seq[(String, Int, Int)], created: String,
                   aes: Boolean = false, mangleU: Boolean = false): Array[Byte] = {
    val id0 = latin1("real-pdf-fixture")
    val r = if (aes) 4 else 3
    val v = if (aes) 4 else 2
    val o32 = PdfCrypto.ownerEntry(Array.emptyByteArray, Array.emptyByteArray, r, 128)
    val key = PdfCrypto.fileKey(o32, -44, id0, r, 128, encryptMetadata = true)
    val u = PdfCrypto.expectedU(key, id0, r) ++ Array.fill(16)(0.toByte)
    if (mangleU) u(0) = (u(0) ^ 0x5A).toByte
    val dec = PdfCrypto.Decryptor(key, aes)
    val content = dec.encrypt(4, deflate(latin1(contentOf(words))))
    val cf =
      if (aes) "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> " +
        "/StmF /StdCF /StrF /StdCF "
      else ""
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(latin1(s))
    w("%PDF-1.6\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 850 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${content.length} /Filter /FlateDecode >> stream\n")
    out.write(content)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Font /Subtype /TrueType /BaseFont /Helvetica >> endobj\n")
    w(s"6 0 obj << /Producer <${hex(dec.encrypt(6, latin1("spec")))}> " +
      s"/CreationDate <${hex(dec.encrypt(6, latin1(created)))}> >> endobj\n")
    w(s"9 0 obj << /Filter /Standard /V $v /R $r /Length 128 /P -44 " +
      s"$cf/O <${hex(o32)}> /U <${hex(u)}> >> endobj\n")
    w(s"trailer << /Root 1 0 R /Info 6 0 R /Encrypt 9 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF")
    out.toByteArray
  }
}
