package graft.sources

import graft.sources.PdfTableSource.PdfMeta

/** OP-04/05 over GENUINE PDF bytes, without a codec jar: a byte-level
  * scanner for the classic (uncompressed-object) PDF layout that reads
  * exactly what the reference reads — `/CreationDate`, `/ModDate` from
  * the Info dictionary and the page count
  * (reference: src/infrastructure/adapters/pdf_parser.py:23-36).
  *
  * Object streams (PDF 1.5+ compressed metadata) and empty-password
  * encrypted files are covered via [[PdfTextCodec.load]]: the scan runs
  * over the EXPANDED object map (ObjStm members unpacked, dict strings
  * decrypted), falling back to the raw byte scan when expansion fails.
  * Page COUNT comes from counting leaf `/Type /Page` objects, which is
  * dictionary-order-independent.
  */
object RealPdfMeta {

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && new String(bytes, 0, 5, "ISO-8859-1") == "%PDF-"

  // PDF date: D:YYYYMMDDHHmmSS with optional trailing fields/zone
  private val DateRe = """D:(\d{4})(\d{2})(\d{2})(\d{2})?(\d{2})?(\d{2})?""".r

  /** "D:20240131120000+00'00'" -> "2024-01-31T12:00:00" (the stub's ISO
    * shape, so CDC comparisons are uniform across codecs).
    */
  private[sources] def isoDate(raw: String): Option[String] =
    DateRe.findFirstMatchIn(raw).map { m =>
      def part(i: Int) = Option(m.group(i)).getOrElse("00")
      s"${m.group(1)}-${m.group(2)}-${m.group(3)}T${part(4)}:${part(5)}:${part(6)}"
    }

  // latin-1: a byte-transparent decoding — binary segments pass through
  // without corrupting the ASCII tokens we scan for
  private def text(bytes: Array[Byte]): String = new String(bytes, "ISO-8859-1")

  private def dictDate(s: String, key: String): Option[String] =
    // LAST occurrence: an incrementally-updated PDF appends a new Info
    // dict after the original — the stale first date would hide changes
    // from CDC
    (java.util.regex.Pattern.quote(key) + """\s*\(\s*(D:[^)]*)\)""").r
      .findAllMatchIn(s).toSeq.lastOption
      .flatMap(m => isoDate(m.group(1)))

  // leaf page objects only: the (?!s) lookahead excludes /Pages tree
  // nodes; order-independent unlike pairing /Type with /Count
  private val LeafPage = """/Type\s*/Page(?!s)""".r

  /** Expanded object map (ObjStm members + decrypted dict strings);
    * raw-scan fallback when expansion fails for STRUCTURAL reasons. A
    * password-protected document (SecurityException) yields None —
    * page-object names ARE visible in the raw bytes, but reporting a
    * count for a document whose extraction is guaranteed to dead-letter
    * would schedule doomed work (PyPDF2 likewise raises on page access).
    */
  private def scanObjects(bytes: Array[Byte]): Option[Map[Int, PdfTextCodec.PdfObj]] =
    try Some(PdfTextCodec.load(bytes)._1)
    catch {
      case _: SecurityException => None
      case scala.util.control.NonFatal(_) => Some(PdfTextCodec.objects(bytes))
    }

  def pageCount(bytes: Array[Byte]): Option[Int] =
    if (!isPdf(bytes)) None
    else scanObjects(bytes).flatMap { objs =>
      // count leaf pages among DISTINCT objects (last generation wins):
      // an incremental update leaves every generation of a rewritten
      // page object in the byte stream and a whole-file scan counts
      // each of them
      val n =
        if (objs.nonEmpty)
          objs.values.count(o => LeafPage.findFirstMatchIn(o.dict).isDefined)
        else LeafPage.findAllMatchIn(text(bytes)).length
      Some(n).filter(_ > 0)
    }

  /** Full OP-04 metadata when `bytes` is a scannable real PDF. One
    * load pass serves both the date scan and the page count. The date
    * preference order is recency-correct: (1) the object the LAST
    * trailer /Info reference names (the authoritative pointer — object
    * NUMBERS carry no recency, so sorting expanded dicts cannot), then
    * (2) the raw byte stream, whose append order IS recency for
    * classic incremental updates.
    */
  def metadata(doc: String, bytes: Array[Byte]): Option[PdfMeta] =
    if (!isPdf(bytes)) None
    else scanObjects(bytes).flatMap { objs =>
      val s = text(bytes)
      val infoDict = """/Info\s+(\d+)\s+0\s+R""".r.findAllMatchIn(s)
        .toSeq.lastOption.map(_.group(1).toInt).flatMap(objs.get).map(_.dict)
      def date(key: String): Option[String] =
        infoDict.flatMap(d => dictDate(d, key)).orElse(dictDate(s, key))
      val pages = Some(objs.values.count(o =>
        LeafPage.findFirstMatchIn(o.dict).isDefined)).filter(_ > 0)
      for {
        created <- date("/CreationDate")
        n <- pages
      } yield PdfMeta(doc,
        created_at = created,
        // reference tolerates absent ModDate (meta.get) — mirror that
        modified_at = date("/ModDate").getOrElse(created),
        page_count = n)
    }

}
