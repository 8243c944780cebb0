package graft

import java.nio.file.{Files, Paths}
import graft.operators.NcaCleaner
import graft.sources.{AdaptiveTable, PdfTableSource, PositionedStubPdfFormat}
import graft.sources.AdaptiveTable.Word
import org.apache.spark.sql.functions.col

/** OP-07 adaptive table extraction: column x-boundaries discovered from
  * header phrase positions (reference pdf_parser.py:79-96), pages sliced
  * by the discovered lines, rows clustered by word tops. The fixtures
  * position words freely — no column structure exists in the bytes.
  */
class AdaptiveTableSpec extends SparkSpecBase {

  /** Standard header layout: phrase -> column start x. */
  private val colX = Seq(
    "nca_number" -> 20.0, "nca_type" -> 120.0, "approved_date" -> 200.0,
    "released_date" -> 300.0, "department" -> 400.0, "agency" -> 500.0,
    "operating_unit" -> 620.0, "amount" -> 740.0, "purpose" -> 840.0,
    "remarks" -> 950.0)

  /** Header words: each phrase split into words laid out from its x. */
  private def headerWords(shift: Double = 0, drop: Set[String] = Set.empty,
                          top: Double = 10): Seq[Word] =
    colX.filterNot(c => drop(c._1)).flatMap { case (phrase, x) =>
      phrase.split("_").zipWithIndex.map { case (w, i) =>
        Word(w.capitalize, x + shift + i * 45, top)
      }
    }

  private def dataRow(top: Double, shift: Double, cells: Map[String, String]): Seq[Word] =
    cells.toSeq.flatMap { case (colName, text) =>
      val x = colX.toMap.apply(colName) + shift
      text.split(" ").zipWithIndex.map { case (w, i) => Word(w, x + i * 55, top) }
    }

  private def fixturePages(shift: Double = 0): Seq[Seq[Word]] = Seq(
    headerWords(shift) ++
      dataRow(30, shift, Map(
        "nca_number" -> "NCA-2024-001", "nca_type" -> "Regular",
        "approved_date" -> "1/2/2024", "released_date" -> "1/5/2024",
        "department" -> "DepEd", "agency" -> "Central Office",
        "operating_unit" -> "OU", "amount" -> "1,000.00",
        "purpose" -> "Salaries")) ++
      dataRow(45, shift, Map(
        "nca_number" -> "NCA-2024-002", "nca_type" -> "Special",
        "released_date" -> "1/6/2024", "department" -> "DOH",
        "agency" -> "Regional Office", "operating_unit" -> "RO-1",
        "amount" -> "2,000.00", "purpose" -> "Medicine")) ++
      dataRow(60, shift, Map("agency" -> "(Cont.)")), // multi-line cell run
    headerWords(shift) ++ // real PDFs repeat the header per page (OP-18)
      dataRow(30, shift, Map(
        "nca_number" -> "NCA-2024-003", "nca_type" -> "Regular",
        "released_date" -> "2/1/2024", "department" -> "DPWH",
        "agency" -> "District", "operating_unit" -> "DO-7",
        "amount" -> "3,500.00", "purpose" -> "Roads")))

  test("detectBoundaries finds header phrase x0s (multi-word, first match, right edge)") {
    val b = AdaptiveTable.detectBoundaries(headerWords(), pageWidth = 1101)
    assert(b === colX.map(_._2) :+ 1100.0)
    // missing phrase contributes no line; others unaffected
    val merged = AdaptiveTable.detectBoundaries(
      headerWords(drop = Set("agency")), pageWidth = 1101)
    assert(merged === colX.filterNot(_._1 == "agency").map(_._2) :+ 1100.0)
  }

  test("extractRows clusters by top within snap tolerance and slices by x") {
    val lines = Seq(20.0, 120.0, 1100.0)
    val words = Seq(
      Word("a1", 25, 30), Word("a2", 60, 32.5), // jitter <= 3: one row
      Word("b", 130, 30),
      Word("c", 25, 50), // gap > 3: new row
      Word("left", 5, 50)) // outside every interval: dropped
    val rows = AdaptiveTable.extractRows(words, lines)
    assert(rows === Seq(Seq("a1 a2", "b"), Seq("c", null)))
  }

  test("adaptive extraction recovers cells; shifted layout extracts identically") {
    def grid(shift: Double) = {
      val bytes = PositionedStubPdfFormat.encode(fixturePages(shift))
      PositionedStubPdfFormat.extract("d", bytes, 1, 99).toSeq
        .map(r => (r.page, r.cells))
    }
    val base = grid(0)
    // page 1: header + 3 data rows; page 2: header + 1 data row
    assert(base.count(_._1 == 1) === 4 && base.count(_._1 == 2) === 2)
    val hdr = base.head._2
    assert(hdr === colX.map(_._1.split("_").map(_.capitalize).mkString(" ")))
    val r1 = base(1)._2
    assert(r1 === Seq("NCA-2024-001", "Regular", "1/2/2024", "1/5/2024",
      "DepEd", "Central Office", "OU", "1,000.00", "Salaries", null))
    val cont = base(3)._2
    assert(cont === Seq(null, null, null, null, null, "(Cont.)", null, null, null, null))
    // shifted columns: boundaries move with the phrases, cells identical
    assert(grid(137.5) === base)
  }

  test("missing header phrase degrades to merged cells, as the reference would") {
    val pages = Seq(
      headerWords(drop = Set("agency")) ++
        dataRow(30, 0, Map(
          "nca_number" -> "N-1", "department" -> "DepEd",
          "agency" -> "Central Office", "operating_unit" -> "OU")))
    val bytes = PositionedStubPdfFormat.encode(pages)
    val rows = PositionedStubPdfFormat.extract("d", bytes, 1, 1).toSeq
    // department interval now spans to operating_unit: agency text merges in
    val r = rows(1).cells
    assert(r(4) === "DepEd Central Office")
    assert(r(5) === "OU") // operating_unit now index 5 (one fewer column)
  }

  test("positioned blobs -> adaptive grid -> cleaner end-to-end") {
    val dir = Files.createTempDirectory("adaptive").toString
    val bytes = PositionedStubPdfFormat.encode(fixturePages(),
      created = "2024-03-01T00:00:00", modified = "2024-03-02T00:00:00")
    Files.write(Paths.get(dir, "nca.pdf"), bytes)

    val blobs = PdfTableSource.readBlobs(spark, dir, "*.pdf")
    val meta = PdfTableSource.metadata(blobs, PositionedStubPdfFormat).collect()(0)
    assert(meta.getAs[String]("created_at") === "2024-03-01T00:00:00")
    assert(meta.getAs[Int]("page_count") === 2)

    val grid = PdfTableSource.extractGrid(blobs, PositionedStubPdfFormat)
    val cleaned = NcaCleaner.clean(grid, org.apache.spark.sql.functions.lit("r1"))

    val recs = cleaned.records.orderBy("nca_number")
      .select("nca_number", "nca_type", "released_date", "department")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(recs.toSeq === Seq(
      ("NCA-2024-001", "Regular", "2024-01-05T00:00:00", "DepEd"),
      ("NCA-2024-002", "Special", "2024-01-06T00:00:00", "DOH"),
      ("NCA-2024-003", "Regular", "2024-02-01T00:00:00", "DPWH")))

    val allocs = cleaned.allocations.orderBy("nca_number")
      .select("nca_number", "agency", "operating_unit", "amount")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(allocs.toSeq === Seq(
      ("NCA-2024-001", "Central Office", "OU", 1000.0),
      // the continuation line merged into NCA-2024-002's run (OP-37)
      ("NCA-2024-002", "Regional Office (Cont.)", "RO-1", 2000.0),
      ("NCA-2024-003", "District", "DO-7", 3500.0)))

    val _ = dir
  }
}
