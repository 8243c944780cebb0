package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-family declared-query registries; every
  * key with an entry in `oracleSql` is hash-checked against DuckDB by the
  * driver at sf0.01.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the NCA cleaner end-to-end on the synthetic fixture grid and
    * answers "total allocation amount per department".
    */
  def entry(spark: SparkSession): DataFrame = NcaPipeline.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      AggWindowQueries.queries ++
      ScalarQueries.queries ++
      ExtensionQueries.queries ++
      EventTimeQueries.queries ++
      SketchQueries.queries ++
      SamplingQueries.queries ++
      PackingQueries.queries ++
      Quantize.queries ++
      Contamination.queries ++
      PiiQueries.queries ++
      OlapQueries.queries ++
      CurationQueries.queries ++
      ZOrder.queries ++
      BpeQueries.queries ++
      RetrievalQueries.queries ++
      PassageDedup.queries ++
      Pq.queries ++
      IvfPq.queries ++
      Opq.queries ++
      Pca.queries ++
      UnigramLm.queries ++
      Coreset.queries ++
      EncodingRepair.queries ++
      ExportQueries.queries ++
      C4Rules.queries ++
      QualityClassifier.queries ++
      KnnGraph.queries ++
      DomainMixture.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      AggWindowQueries.oracleSql ++
      ScalarQueries.oracleSql ++
      ExtensionQueries.oracleSql ++
      EventTimeQueries.oracleSql ++
      SketchQueries.oracleSql ++
      SamplingQueries.oracleSql ++
      PackingQueries.oracleSql ++
      Quantize.oracleSql ++
      Contamination.oracleSql ++
      PiiQueries.oracleSql ++
      OlapQueries.oracleSql ++
      CurationQueries.oracleSql ++
      ZOrder.oracleSql ++
      BpeQueries.oracleSql ++
      RetrievalQueries.oracleSql ++
      PassageDedup.oracleSql ++
      Pq.oracleSql ++
      IvfPq.oracleSql ++
      Opq.oracleSql ++
      Pca.oracleSql ++
      UnigramLm.oracleSql ++
      Coreset.oracleSql ++
      EncodingRepair.oracleSql ++
      ExportQueries.oracleSql ++
      C4Rules.oracleSql ++
      QualityClassifier.oracleSql ++
      KnnGraph.oracleSql ++
      DomainMixture.oracleSql
}
