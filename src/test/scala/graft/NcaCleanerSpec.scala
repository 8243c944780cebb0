package graft

import org.apache.spark.sql.Row
import graft.operators.{NcaCleaner, NcaPipeline}

/** Golden tests for the cleaner program against outputs derived by hand
  * from the reference semantics (pd_data_cleaner.py:22-183) on the
  * FIXTURES.md grid — including the warts: merged multi-amount rows
  * parse to null and are dropped; take-while discards trailing
  * fragments; repeated-header spacers split merge runs.
  */
class NcaCleanerSpec extends SparkSpecBase {

  private lazy val cleaned = NcaPipeline.cleaned(spark)

  test("records match reference golden (3 records, sorted by nca_number)") {
    val rows = cleaned.records
      .orderBy("nca_number")
      .select("nca_number", "nca_type", "released_date", "department", "purpose", "release_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getString(5)))
    assert(rows.toSeq === Seq(
      ("NCA-2024-001", "Regular", "2024-01-15T00:00:00", "DepEd",
        "School ops and maintenance", "id_2024"),
      ("NCA-2024-002", "Special", null, "DOH", "Medical supplies", "id_2024"),
      ("NCA-2024-003", "Regular", "2024-02-10T00:00:00", "DepEd", "Textbooks", "id_2024")))
  }

  test("allocations match reference golden (merged-amount row dropped)") {
    val rows = cleaned.allocations
      .orderBy("nca_number")
      .select("nca_number", "agency", "operating_unit", "amount")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("NCA-2024-001", "Agency A", "OU Central", 1234567.89),
      // Agency B/C/(cont'd) rows merge (no blank separator between them);
      // merged amount "500.00 1,000, 500" fails to parse -> dropped (the
      // reference wart at pd_data_cleaner.py:163,169-172)
      ("NCA-2024-002", "Agency D", "OU East", 2000.0),
      ("NCA-2024-003", "Agency E", "OU West", 750.25)))
  }

  test("flagship aggregates per department") {
    val rows = NcaPipeline.flagship(spark).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100) / 100.0, r.getLong(2)))
    assert(rows.toSeq === Seq(("DOH", 2000.0, 1L), ("DepEd", 1235318.14, 2L)))
  }

  test("cleaner is order-insensitive to input partitioning/shuffled ingestion") {
    // Same grid, reversed input order and 4 partitions: explicit ord keys
    // must make the result identical (Spark gives no implicit row order).
    val grid = NcaPipeline.fixtureGrid(spark)
    val shuffled = grid.orderBy(org.apache.spark.sql.functions.col("ord").desc)
      .repartition(4)
    val a = NcaCleaner.clean(shuffled, org.apache.spark.sql.functions.lit("id_2024"))
    val exp = cleaned.records.collect().toSet
    assert(a.records.collect().toSet === exp)
    assert(a.allocations.collect().toSet === cleaned.allocations.collect().toSet)
  }

  test("a header missing a valid column raises (pandas KeyError parity), not silent drop") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc", StringType), StructField("ord", LongType),
      StructField("cells", ArrayType(StringType))))
    // header lacks AMOUNT: the reference's df[valid_columns] raises
    // KeyError and the batch dead-letters — silently nulling the column
    // would drop the document with no signal
    val grid = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("d", 0L, Seq("NCA NUMBER", "NCA TYPE", "RELEASED DATE",
          "DEPARTMENT", "AGENCY", "OPERATING UNIT", "PURPOSE")),
        Row("d", 1L, Seq("NCA-1", "Regular", "2024-01-01", "DBM", "AgA",
          "OU1", "Stuff")))),
      schema)
    val e = intercept[Exception] {
      NcaCleaner.clean(grid, org.apache.spark.sql.functions.lit("x"))
        .records.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("header missing required column(s) amount")),
      msgs(e).mkString("\n"))
  }

  test("keys collapsing after trim keep the FIRST group in document order") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc", StringType), StructField("ord", LongType),
      StructField("cells", ArrayType(StringType))))
    def row(ord: Long, cells: Seq[String]) = Row("d", ord, cells)
    val hdr = Seq("NCA NUMBER", "NCA TYPE", "RELEASED DATE", "DEPARTMENT",
      "AGENCY", "OPERATING UNIT", "AMOUNT", "PURPOSE")
    // "NCA-9 " (trailing space) appears FIRST, raw "NCA-9" second: after
    // the trim both collapse to "NCA-9" and pandas keep='first' retains
    // the document-order-first group — the window must order by group
    // position, not by the (constant) partition key
    val grid = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      row(0L, hdr),
      row(1L, Seq("NCA-9 ", "First", "2024-01-01", "DBM", "AgA", "OU1", "10.00", "P1")),
      row(2L, Seq("NCA-9", "Second", "2024-02-02", "DOH", "AgB", "OU2", "20.00", "P2")))),
      schema)
    val recs = NcaCleaner.clean(grid, org.apache.spark.sql.functions.lit("x"))
      .records.select("nca_number", "nca_type").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(recs === Seq(("NCA-9", "First")))
  }

  test("grid with only a header yields empty outputs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc", StringType), StructField("ord", LongType),
      StructField("cells", ArrayType(StringType))))
    val hdrOnly = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("d", 0L,
        Seq("NCA NUMBER", "NCA TYPE", "RELEASED DATE", "DEPARTMENT",
          "AGENCY", "OPERATING UNIT", "AMOUNT", "PURPOSE")))),
      schema)
    val c = NcaCleaner.clean(hdrOnly, org.apache.spark.sql.functions.lit("x"))
    assert(c.records.isEmpty && c.allocations.isEmpty)
  }
}
