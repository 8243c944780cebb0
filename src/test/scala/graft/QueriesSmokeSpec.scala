package graft

/** Every declared query must run at sf0.001 and produce a schema with
  * stable column names (the driver hashes columns sorted by name — a
  * rename silently breaks the oracle compare). Value-level equivalence
  * is the driver's DuckDB gate (replicated in tools/check_oracle.py).
  */
class QueriesSmokeSpec extends SparkSpecBase {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  /** Recall/precision gates are anti-joins against provably-contained
    * relations: their PASS condition is zero rows.
    */
  private val emptyByDesign = Set(
    "x03r_dedup_minhash_recall",
    "x04r_dedup_simhash_recall",
    "x07p_ann_lsh_precision",
    "x12g_multimodal_meta_gate",
    "x16p_ann_ivf_precision",
    "x31g_quantize_gate",
    "x17g_approx_distinct_gate",
    "x18g_approx_median_gate",
    "x26g_heavy_hitters_recall",
    "x38g_decontam_bloom_gate")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and yields rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (emptyByDesign(name)) assert(n == 0, s"gate $name violated: $n rows")
      // q27_anti legitimately returns 0 rows at some sf; all others > 0
      else if (name != "q27_anti") assert(n > 0, s"$name returned no rows")
    }
  }
}
