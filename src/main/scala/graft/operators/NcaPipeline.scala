package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end slice of the reference pipeline (SURVEY.md §7.2 step 1):
  * synthetic raw PDF-grid fixture -> NcaCleaner -> records/allocations ->
  * flagship analytic query ("total allocation amount per department").
  */
object NcaPipeline {

  private val gridSchema = StructType(Seq(
    StructField("doc", StringType, nullable = false),
    StructField("ord", LongType, nullable = false),
    StructField("cells", ArrayType(StringType, containsNull = true), nullable = false)))

  /** Fixture grid per FIXTURES.md §1 — exercises every cleaner behavior:
    * continuation rows (ffill), purpose-wrap separators, repeated headers
    * mid-data (page boundary), wrapped amounts that fail to parse,
    * whitespace noise, unparseable dates, None/"" mixing.
    */
  def fixtureGrid(spark: SparkSession): DataFrame = {
    val H = Seq("NCA NUMBER", "NCA TYPE", "APPROVED DATE", "RELEASED DATE",
      "DEPARTMENT", "AGENCY", "OPERATING UNIT", "AMOUNT", "PURPOSE", "REMARKS")
    def r(cells: String*): Seq[String] = cells
    val rows: Seq[Seq[String]] = Seq(
      H,
      // happy path with comma amount + whitespace noise
      r(" NCA-2024-001 ", "Regular", "2024-01-05", "2024-01-15", " DepEd ",
        "Agency A", "OU Central", "1,234,567.89", "School ops", ""),
      // purpose-wrap continuation: blank alloc cells => run separator
      r("", "", "", "", "", "", "", "", "and maintenance", ""),
      // second allocation line for the same NCA
      r("", "", "", "", "", "Agency B", "OU North", "500.00", "", ""),
      // wrapped amount across two rows: merges then fails to parse (dropped)
      r("", "", "", "", "", "Agency C", "OU South", "1,000,", "", ""),
      r("", "", "", "", "", "(cont'd)", "", "500", "", ""),
      // repeated header row (page 2) — removed, but its spacer splits runs
      Seq("nca number", "NCA Type", "Approved  Date", "Released Date",
        "Department", "Agency", "Operating Unit", "Amount", "Purpose", "Remarks"),
      // second NCA with unparseable date; None cells mixed with ""
      Seq("NCA-2024-002", "Special", null, "TBD", "DOH",
        "Agency D", "OU East", "2,000.00", "Medical supplies", null),
      // third NCA, simple
      r("NCA-2024-003", "Regular", "2024-02-01", "2024-02-10", "DepEd",
        "Agency E", "OU West", "750.25", "Textbooks", ""))
    val data = rows.zipWithIndex.map { case (cells, i) =>
      Row("NCA_2024.pdf", i.toLong, cells)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), gridSchema)
  }

  def cleaned(spark: SparkSession): NcaCleaner.Cleaned =
    NcaCleaner.clean(fixtureGrid(spark), lit("id_2024"))

  /** Flagship: records ⋈ allocations, total amount per department. */
  def flagship(spark: SparkSession): DataFrame = {
    val c = cleaned(spark)
    c.records.select(col("doc"), col("nca_number"), col("department"))
      .join(c.allocations, Seq("doc", "nca_number"))
      .groupBy(col("department"))
      .agg(sum(col("amount")).as("total_amount"),
        count(lit(1)).as("n_allocations"))
      .orderBy(col("department"))
  }
}
