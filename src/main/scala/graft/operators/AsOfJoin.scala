package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each probe row, the single build row with
  * the greatest build ts <= probe ts on the same key — the standard
  * time-series enrichment join (DuckDB/kdb "ASOF JOIN"; also named in
  * Pandas merge_asof).
  *
  * Union + running-window formulation: probe and build rows are tagged
  * and unioned, then one window per key ordered by (ts, tag) carries the
  * last non-null build payload forward onto each probe row. ONE shuffle
  * on the key, sized by |probe| + |build| — never a per-row range probe,
  * an interval explosion, or a join that AQE must rescue. Equal
  * timestamps match (build sorts before probe at the same ts).
  *
  * Build rows must be unique per (key, ts) — pre-aggregate otherwise
  * (ties at identical ts have no defined winner in any asof engine).
  */
object AsOfJoin {

  def backward(probe: DataFrame, build: DataFrame, keyCol: String,
               tsCol: String): DataFrame = {
    val pPayload = probe.columns.filterNot(c => c == keyCol || c == tsCol)
    val bPayload = build.columns.filterNot(c => c == keyCol || c == tsCol)
    // fail fast instead of emitting ambiguous duplicate output columns
    require(pPayload.intersect(bPayload).isEmpty,
      s"payload column collision: ${pPayload.intersect(bPayload).mkString(", ")}")
    val pStruct = struct(pPayload.map(col): _*)
    val bStruct = struct(bPayload.map(col): _*)
    val pType = probe.select(pStruct).schema.head.dataType
    val bType = build.select(bStruct).schema.head.dataType
    val tagged = probe.select(col(keyCol), col(tsCol), lit(1).as("__tag"),
        pStruct.as("__p"), lit(null).cast(bType).as("__b"))
      .unionByName(build.select(col(keyCol), col(tsCol), lit(0).as("__tag"),
        lit(null).cast(pType).as("__p"), bStruct.as("__b")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__asof", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col(keyCol) +: col(tsCol) +:
        (pPayload.map(c => col(s"__p.$c").as(c)) ++
          bPayload.map(c => col(s"__asof.$c").as(c))): _*)
  }
}
