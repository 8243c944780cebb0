package graft.sources

import graft.sources.PdfTableSource.{GridRow, PageStride, PdfMeta, TableExtractor}

/** Adaptive table extraction (OP-07) — the reference's defining source
  * semantics: per document, column x-boundaries are DISCOVERED at runtime
  * by locating the known header phrases' x-coordinates on the first page,
  * then every page's words are sliced into cells between consecutive
  * boundaries, with rows formed by clustering word baselines ("explicit"
  * vertical strategy + "text" horizontal strategy; reference
  * pdf_parser.py:52-96, phrase list constants.py:23-34, extraction
  * settings pdf_parser.py:13-20).
  *
  * The algorithm is a pure function of positioned words, so it is shared
  * by any real PDF codec (which only needs to produce (text, x0, top)
  * word boxes) and by [[PositionedStubPdfFormat]], the offline test codec.
  */
object AdaptiveTable {

  /** A positioned word: text with its left x and top y, as a real PDF
    * text extractor emits (pdfplumber page.extract_words()).
    */
  final case class Word(text: String, x0: Double, top: Double)

  /** The header phrases whose x-positions define column boundaries
    * (reference constants.py:23-34 TABLE_COLUMNS). Multi-word phrases
    * are underscore-joined: "operating_unit" matches the consecutive
    * words "Operating Unit" (case-insensitive).
    */
  val TargetPhrases: Seq[String] = Seq(
    "nca_number", "nca_type", "approved_date", "released_date",
    "department", "agency", "operating_unit", "amount", "purpose",
    "remarks")

  /** pdfplumber snap_y_tolerance (pdf_parser.py:18): words whose tops
    * differ by no more than this cluster into one row.
    */
  val SnapYTolerance: Double = 3.0

  /** Discover column x-boundaries from the first page's words — the
    * reference's _update_table_settings_vert_lines (pdf_parser.py:79-96):
    * for each target phrase, scan the word sequence for `n` consecutive
    * words that underscore-join (lowercased) to the phrase; the FIRST
    * match's leading x0 becomes a vertical line. A phrase that never
    * matches contributes no line (its column merges into the neighbor —
    * exactly how the reference degrades on a PDF missing a header).
    * The page's right edge minus 1 closes the last column.
    */
  def detectBoundaries(page0Words: Seq[Word], pageWidth: Double,
                       targetPhrases: Seq[String] = TargetPhrases): Seq[Double] = {
    val texts = page0Words.map(_.text)
    val lines = targetPhrases.flatMap { phrase =>
      val n = phrase.split("_").length
      texts.sliding(n).zipWithIndex.collectFirst {
        case (win, i) if win.mkString("_").toLowerCase == phrase =>
          page0Words(i).x0
      }
    }
    lines :+ (pageWidth - 1)
  }

  /** Slice one page's words into a raw string grid given the boundary
    * lines (the reference's page.extract_table with explicit vertical
    * lines + text horizontal strategy). Rows: words sorted by top,
    * clustered greedily while the gap to the previous word's top is
    * within [[SnapYTolerance]]. Cells: sorted boundaries define
    * [line(j), line(j+1)) intervals; a word belongs to the interval
    * containing its x0; words outside every interval are dropped (as
    * pdfplumber drops text outside the table); in-cell words join with
    * a single space in x order; an empty cell is null (parser.py:20-27:
    * List[List[str | None]]).
    */
  def extractRows(words: Seq[Word], vertLines: Seq[Double]): Seq[Seq[String]] = {
    val lines = vertLines.distinct.sorted
    if (lines.length < 2 || words.isEmpty) return Nil
    val rows = collection.mutable.ListBuffer.empty[Seq[Word]]
    val cur = collection.mutable.ListBuffer.empty[Word]
    var prevTop = Double.NaN
    words.sortBy(w => (w.top, w.x0)).foreach { w =>
      if (!prevTop.isNaN && w.top - prevTop > SnapYTolerance) {
        rows += cur.toList; cur.clear()
      }
      cur += w
      prevTop = w.top
    }
    if (cur.nonEmpty) rows += cur.toList
    rows.toList.map { rowWords =>
      (0 until lines.length - 1).map { j =>
        val cell = rowWords
          .filter(w => w.x0 >= lines(j) && w.x0 < lines(j + 1))
          .sortBy(_.x0).map(_.text)
        if (cell.isEmpty) null else cell.mkString(" ")
      }
    }
  }

  /** Full adaptive extraction of a page range: boundaries always come
    * from page 1 (the reference re-detects on page index 0 of the
    * document for every extraction call, pdf_parser.py:58-60), each
    * requested page is sliced with them.
    */
  def extract(doc: String, pages: IndexedSeq[Seq[Word]], pageWidth: Double,
              startPage: Int, endPage: Int): Iterator[GridRow] = {
    if (pages.isEmpty) return Iterator.empty
    val boundaries = detectBoundaries(pages.head, pageWidth)
    (math.max(startPage, 1) to math.min(endPage, pages.length)).iterator.flatMap { p =>
      extractRows(pages(p - 1), boundaries).iterator.zipWithIndex.map {
        case (cells, r) => GridRow(doc, p, p * PageStride + r, cells)
      }
    }
  }
}

/** Positioned-text stub codec: a deterministic fake "PDF" whose pages
  * carry (text, x0, top) word boxes, so the ADAPTIVE extraction — header
  * phrase discovery, explicit vertical lines, text row clustering — runs
  * for real; only the byte-level PDF decode is faked (no PDF codec in
  * the offline jar set). Format: optional first line `#meta<TAB>created
  * <TAB>modified<TAB>width`, pages split by \f, one word per line as
  * `x0<TAB>top<TAB>text`.
  *
  * Unlike [[PdfTableSource.StubPdfFormat]] (which encodes pre-sliced
  * grids), documents encoded here have NO column structure in the bytes:
  * columns exist only as x-coordinates, and extraction must rediscover
  * them — shifted, merged, or extra columns land exactly where the
  * reference's pdfplumber program would put them (asserted in
  * AdaptiveTableSpec).
  */
object PositionedStubPdfFormat extends TableExtractor {
  import AdaptiveTable.Word

  val DefaultWidth: Double = 1101.0 // reference VERT_LINES right edge + 1

  def encode(pages: Seq[Seq[Word]], created: String = "",
             modified: String = "", width: Double = DefaultWidth): Array[Byte] = {
    val meta = s"#meta\t$created\t$modified\t$width\n"
    (meta + pages.map(_.map(w => s"${w.x0}\t${w.top}\t${w.text}")
      .mkString("\n")).mkString("\f")).getBytes("UTF-8")
  }

  private final case class Doc(pages: IndexedSeq[Seq[Word]], created: String,
                               modified: String, width: Double)

  /** Decode failures throw IOException with the offending line — a
    * corrupted blob must fail its task with a diagnosable error (the
    * caller's DLQ path), not a bare MatchError/NumberFormatException.
    */
  private def decode(bytes: Array[Byte]): Doc = {
    def bad(what: String): Nothing =
      throw new java.io.IOException(s"stub codec: $what")
    val s = new String(bytes, "UTF-8")
    val (meta, body) =
      if (s.startsWith("#meta\t")) {
        val nl = s.indexOf('\n')
        if (nl < 0) bad("truncated #meta header (no newline)")
        (s.substring(0, nl).split("\t", -1), s.substring(nl + 1))
      } else (Array("#meta", "", "", DefaultWidth.toString), s)
    if (meta.length < 4) bad(s"malformed #meta header (${meta.length} fields)")
    val pages = body.split("\f", -1).toIndexedSeq.map(_.split("\n", -1).toSeq
      .filter(_.nonEmpty).map { line =>
        line.split("\t", 3) match {
          case Array(x0, top, text) =>
            (for { x <- x0.toDoubleOption; t <- top.toDoubleOption }
              yield Word(text, x, t))
              .getOrElse(bad(s"non-numeric word position: $line"))
          case _ => bad(s"malformed word line: $line")
        }
      })
    Doc(pages, meta(1), meta(2),
      meta(3).toDoubleOption.getOrElse(bad(s"non-numeric width: ${meta(3)}")))
  }

  override def pageCount(bytes: Array[Byte]): Int = decode(bytes).pages.length

  /** OP-04: metadata comes from the DOCUMENT (the reference reads
    * /CreationDate and /ModDate from the PDF info dict,
    * pdf_parser.py:23-32) — not from test-injected strings.
    */
  override def metadata(doc: String, bytes: Array[Byte]): PdfMeta = {
    val d = decode(bytes)
    PdfMeta(doc, d.created, d.modified, d.pages.length)
  }

  override def extract(doc: String, bytes: Array[Byte],
                       startPage: Int, endPage: Int): Iterator[GridRow] = {
    val d = decode(bytes)
    AdaptiveTable.extract(doc, d.pages, d.width, startPage, endPage)
  }
}
