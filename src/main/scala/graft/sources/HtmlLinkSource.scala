package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OP-01/02: HTML link scan -> typed release candidates (reference
  * bs4_scraper.py:18-76, scrapy_scraper.py:18-71).
  *
  * The HTTP fetch itself is environment I/O (driver-side in the
  * reference too); this source takes the fetched page text and performs
  * the whole relational program declaratively: anchor extraction,
  * NCA-pdf predicate (OP-20), null guards (OP-21), URL absolutization
  * (OP-52), filename from last path segment (OP-51), year extraction
  * with UPDATED-override (OP-49/50), year threshold (OP-19), id
  * synthesis (OP-53), sort by year (OP-40).
  */
object HtmlLinkSource {

  // \shref (whitespace REQUIRED before href): without it, attributes
  // like data-href match first and their value becomes the anchor URL
  private val AnchorRe = """(?is)<a\b[^>]*?\shref\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>"""

  /** Parse the page into (url, title) anchor rows. Tag-stripping and
    * whitespace normalization mirror bs4's get_text(strip=True).
    */
  def anchors(spark: SparkSession, html: String): DataFrame = {
    import spark.implicits._
    AnchorRe.r.findAllMatchIn(html)
      .map(m => (m.group(1), m.group(2)))
      .toSeq.toDF("url", "raw_title")
      .select(col("url"),
        trim(regexp_replace(regexp_replace(col("raw_title"), "<[^>]*>", " "),
          "\\s+", " ")).as("title"))
  }

  /** Full candidate program over the anchor rows. `nowYear` is injected
    * (the reference's datetime.now().year, bs4_scraper.py:50) so runs
    * are reproducible.
    */
  def releaseCandidates(anchorsDf: DataFrame, baseUrl: String,
                        oldestYear: Int, nowYear: Int): DataFrame = {
    // full absolutization: protocol-relative keeps the base scheme,
    // already-absolute passes through, root-relative and bare-relative
    // join onto the base — a missed case either 404s (baseUrl//host/x)
    // or leaves an unfetchable relative url
    val scheme = baseUrl.takeWhile(_ != ':') + ":"
    val absolute =
      when(col("url").startsWith("//"), concat(lit(scheme), col("url")))
        .when(col("url").rlike("(?i)^https?://"), col("url"))
        .when(col("url").startsWith("/"), concat(lit(baseUrl), col("url")))
        .otherwise(concat(lit(baseUrl), lit("/"), col("url")))
    val filename = element_at(split(col("abs_url"), "/"), -1)
    val yearRe = regexp_extract(col("filename"), "(\\d{4})", 1)
    anchorsDf
      .filter(col("url").isNotNull && col("title").isNotNull && col("title") =!= "")
      .filter(col("url").rlike("(?i).*NCA.*\\.pdf$"))
      .withColumn("abs_url", absolute)
      .withColumn("filename", filename)
      .withColumn("year",
        when(col("filename").contains("UPDATED"), lit(nowYear))
          .otherwise(nullif(yearRe, lit("")).cast("int")))
      .filter(col("year").isNotNull)       // unparsable year -> dropped (OP-21)
      .filter(col("year") >= oldestYear)   // OP-19
      .select(
        format_string("id_%d", col("year")).as("id"),  // OP-53
        col("title"), col("filename"),
        col("abs_url").as("url"), col("year"))
      // the year IS the registry key downstream (release upsert +
      // cascade delete key), mirroring the reference's one-release-per-
      // year model — so a listing with several same-year links must
      // resolve to ONE deterministic winner here, not silently
      // overwrite each other in the store: an UPDATED variant always
      // beats its base file (an explicit flag, NOT lexicographic order —
      // "NCA-2023-UPDATED.pdf" < "NCA-2023.pdf" because '-' sorts
      // before '.'), then filename/url desc as deterministic tie-breaks
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(
            col("filename").contains("UPDATED").desc,
            col("filename").desc, col("url").desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("year"), col("filename"))           // OP-40, total order
  }
}
