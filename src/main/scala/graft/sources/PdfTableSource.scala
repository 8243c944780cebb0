package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** PDF document source (OP-03..OP-07): binary blobs -> per-page raw table
  * grids in the cleaner's input contract (doc, ord, cells array<string>).
  *
  * The byte-level PDF decode is STUBBED (no PDF codec in the offline jar
  * set): [[StubPdfFormat]] defines a deterministic fake "PDF" — text
  * pages separated by \f, rows by \n, cells by | — so tests synthesize
  * documents as bytes and exercise the REAL plumbing: binaryFile scan,
  * executor-side per-partition extraction, page ranging, explicit
  * (page, row) ordering keys. To productionize, implement
  * [[TableExtractor]] with a real parser (reference contract:
  * src/core/interfaces/parser.py:20-27, adaptive column detection
  * pdf_parser.py:52-96); nothing else changes.
  */
object PdfTableSource {

  /** One extracted grid row: `ord` = page * PageStride + rowInPage keeps
    * every downstream window keyed on an explicit total order per doc
    * (OP-39 — Spark gives no implicit order after shuffle).
    */
  final case class GridRow(doc: String, page: Int, ord: Long, cells: Seq[String])

  final case class PdfMeta(doc: String, created_at: String,
                           modified_at: String, page_count: Int)

  val PageStride = 1000000L

  /** The extraction contract: (docName, bytes, pageRange) => grid rows.
    * Runs on executors; must be serializable and deterministic.
    */
  trait TableExtractor extends Serializable {
    def extract(doc: String, bytes: Array[Byte],
                startPage: Int, endPage: Int): Iterator[GridRow]
    def pageCount(bytes: Array[Byte]): Int
    def metadata(doc: String, bytes: Array[Byte]): PdfMeta
  }

  /** Deterministic fake PDF codec over a text format. Stands in for a
    * real PDF parser (OP-04..07); pure function of the bytes.
    */
  object StubPdfFormat extends TableExtractor {
    // null-cell sentinel as an escape (never a raw control byte in source)
    private val NullCell = "\u0000"

    def encode(pages: Seq[Seq[Seq[String]]]): Array[Byte] =
      pages.map(_.map(_.map(c => if (c == null) NullCell else c)
        .mkString("|")).mkString("\n")).mkString("\f")
        .getBytes("UTF-8")

    // split with limit -1 so trailing empty cells/rows survive: an
    // all-"" row like "|||||||" must decode to 8 empty cells, not 0 —
    // the cleaner's spacer semantics depend on it. A ZERO-byte blob is
    // zero pages (split of "" returns [""], which would phantom a
    // 1-page document with one empty row).
    private def decodePages(bytes: Array[Byte]): Array[Array[Array[String]]] =
      if (bytes.isEmpty) Array.empty
      else new String(bytes, "UTF-8").split("\f", -1).map(_.split("\n", -1)
        .map(_.split("\\|", -1).map(c => if (c == NullCell) null else c)))

    override def pageCount(bytes: Array[Byte]): Int = decodePages(bytes).length

    override def metadata(doc: String, bytes: Array[Byte]): PdfMeta = {
      val checksum = bytes.foldLeft(0L)((a, b) => (a * 31 + b) & 0x7fffffffL)
      PdfMeta(doc,
        created_at = f"2024-01-${1 + checksum % 28}%02dT00:00:00",
        modified_at = f"2024-02-${1 + (checksum / 31) % 28}%02dT00:00:00",
        page_count = pageCount(bytes))
    }

    override def extract(doc: String, bytes: Array[Byte],
                         startPage: Int, endPage: Int): Iterator[GridRow] = {
      val pages = decodePages(bytes)
      (math.max(startPage, 1) to math.min(endPage, pages.length)).iterator.flatMap { p =>
        pages(p - 1).iterator.zipWithIndex.map { case (cells, r) =>
          GridRow(doc, p, p * PageStride + r, cells.toIndexedSeq)
        }
      }
    }
  }

  /** OP-03: object-store scan of a directory of blobs. Columns:
    * path, modificationTime, length, content (BinaryType).
    */
  def readBlobs(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** OP-06/07: distributed extraction — every (blob, page range) row is
    * processed on executors via mapPartitions; the whole-document bytes
    * are read once per blob (the reference's memoized single-download,
    * OP-64, becomes "one binaryFile row feeds all its pages").
    * Output: (doc, page, ord, cells) — the cleaner's input contract.
    */
  def extractGrid(blobs: DataFrame, extractor: TableExtractor,
                  startPage: Int = 1, endPage: Int = Int.MaxValue): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val rows: Dataset[GridRow] = blobs
      .select(element_at(split(col("path"), "/"), -1).as("doc"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (doc, bytes) =>
        extractor.extract(doc, bytes, startPage, endPage)
      })
    rows.toDF()
  }

  /** OP-04/05: metadata + page count per blob (executor-side). */
  def metadata(blobs: DataFrame, extractor: TableExtractor): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(element_at(split(col("path"), "/"), -1).as("doc"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (doc, bytes) => extractor.metadata(doc, bytes) })
      .toDF()
  }
}
