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

  private val AnchorRe = """(?is)<a\b[^>]*href\s*=\s*["']([^"']+)["'][^>]*>(.*?)</a>"""

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
    val absolute = when(col("url").startsWith("/"),
      concat(lit(baseUrl), col("url"))).otherwise(col("url"))
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
      .orderBy(coalesce(col("year"), lit(0)))          // OP-40
  }
}
