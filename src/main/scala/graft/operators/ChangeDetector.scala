package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OP-26/27/28/63: change-data-capture of scraped candidates against the
  * already-ingested state (reference releases_scraper.py:69-126).
  *
  * A candidate release proceeds when:
  *  - no DB row exists for its id (new), OR
  *  - no stored file exists for its filename (missing blob), OR
  *  - its (created_at, modified_at) file metadata differs from the DB's
  *    (changed — the reference deletes the stale row and re-inserts).
  *
  * Expressed as one left join against the DB table plus a left-anti
  * membership probe against the file listing; the DB/dimension side is
  * broadcast when small (the common case — candidates per scrape are
  * few), so nothing large shuffles.
  */
object ChangeDetector {

  /** Classify candidates: adds a `change_status` column in
    * {new, missing_file, changed, unchanged}. `db` must have columns
    * (id, file_meta_created_at, file_meta_modified_at); `storedFiles`
    * must have a `filename` column.
    */
  def classify(candidates: DataFrame, db: DataFrame, storedFiles: DataFrame): DataFrame = {
    val dbSel = db.select(col("id").as("__db_id"),
      col("file_meta_created_at").as("__db_created"),
      col("file_meta_modified_at").as("__db_modified"))
    val stored = storedFiles.select(col("filename").as("__stored_fn")).distinct()
    candidates
      .join(broadcast(dbSel), col("id") === col("__db_id"), "left_outer")
      .join(broadcast(stored), col("filename") === col("__stored_fn"), "left_outer")
      .withColumn("change_status",
        when(col("__db_id").isNull, lit("new"))
          .when(col("__stored_fn").isNull, lit("missing_file"))
          .when(!(col("file_meta_created_at") <=> col("__db_created")) ||
                !(col("file_meta_modified_at") <=> col("__db_modified")), lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__db_id", "__db_created", "__db_modified", "__stored_fn")
  }

  /** The reference's filter: everything except unchanged proceeds. */
  def newOrUpdated(candidates: DataFrame, db: DataFrame, storedFiles: DataFrame): DataFrame =
    classify(candidates, db, storedFiles).filter(col("change_status") =!= "unchanged")
}
