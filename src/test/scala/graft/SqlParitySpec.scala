package graft

import org.apache.spark.sql.DataFrame

/** SURVEY §3.4 text-surface contract: for every §2-declared q/j query,
  * the SQL string in [[SqlSurface]] and the DSL form in
  * `SparkEntry.queries` must produce the SAME relation. One data-driven
  * test per key (row-for-row equality after a canonical sort, column
  * names and order equal), plus plan-shape equivalence for the
  * PlanAuditSpec-pinned queries — the SQL text must not silently plan a
  * worse physical shape than the DSL (broadcast dims for the star join,
  * WindowGroupLimit for the rank filter).
  *
  * Values compare by display string (numeric TYPE may legitimately
  * differ across the surfaces — e.g. a DSL `lit(1)` int vs a SQL
  * integer literal promoted by coercion — but every VALUE must render
  * identically; doubles go through the same Spark arithmetic on both
  * sides, so string rendering is exact, not a tolerance).
  */
class SqlParitySpec extends SparkSpecBase {

  // numbers render canonically (BigDecimal, trailing zeros stripped):
  // a DECIMAL-typed SQL column and the DSL's DOUBLE legitimately carry
  // the same VALUE with different toString scales (0.91667000 vs
  // 0.91667) — the parity contract is values, not renderings
  private def cell(v: Any): String = v match {
    case a: Array[_] => a.map(cell).mkString("[", ",", "]")
    case s: Seq[_]   => s.map(cell).mkString("[", ",", "]")
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: Double =>
      BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case f: Float =>
      BigDecimal(f.toDouble).bigDecimal.stripTrailingZeros.toPlainString
    case v => v.toString
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "<null>" else cell(r.get(i))))
      // order by the full cell SEQUENCE, not a joined string: any
      // single-string key collides when a cell itself contains the
      // separator, and a collision makes tie order depend on each
      // side's input order -- the zip-by-index compare below would
      // then flag spuriously mismatched rows on queries without a
      // total ORDER BY. Seq lexicographic ordering is injective.
      .sortBy(r => r: Seq[String])(
        Ordering.Implicits.seqOrdering[Seq, String])
    (cols, rows)
  }

  test("every declared q/j key has a SQL surface statement") {
    val missing = SqlSurface.declaredKeys.filter(k =>
      !SqlSurface.overrides.contains(k) && !SparkEntry.oracleSql.contains(k))
    assert(missing.isEmpty, s"keys without SQL surface: $missing")
  }

  test("the SQL surface + inexpressible registry PARTITION the oracle keyspace") {
    val surface = (SqlSurface.declaredKeys ++ SqlSurface.extendedKeys).toSet
    val overlap = surface.intersect(SqlSurface.inexpressible.keySet)
    assert(overlap.isEmpty, s"keys both on the surface and inexpressible: $overlap")
    val missing = SparkEntry.oracleSql.keySet -- surface --
      SqlSurface.inexpressible.keySet
    assert(missing.isEmpty,
      s"oracle-backed keys neither on the SQL surface nor documented inexpressible: $missing")
    val stale = SqlSurface.inexpressible.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"inexpressible entries without an oracle key: $stale")
  }

  (SqlSurface.declaredKeys ++ SqlSurface.extendedKeys).foreach { key =>
    test(s"$key: SQL text surface matches the DSL relation") {
      val dsl = SparkEntry.queries(key)(spark, sfDir)
      val sql = SqlSurface.run(spark, sfDir, key)
      val (dCols, dRows) = canon(dsl)
      val (sCols, sRows) = canon(sql)
      assert(sCols === dCols, s"$key: column mismatch (SQL vs DSL)")
      assert(sRows.size === dRows.size,
        s"$key: row count ${sRows.size} (SQL) vs ${dRows.size} (DSL)")
      sRows.zip(dRows).zipWithIndex.foreach { case ((srow, drow), i) =>
        assert(srow === drow, s"$key: row $i differs (SQL vs DSL)")
      }
    }
  }

  test("q52 SQL surface broadcasts its dimension sides like the DSL form") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SqlSurface.run(spark, sfDir, "q52_star_join")
      .queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.size >= 2,
      s"expected customer+nation broadcast in the SQL plan, got:\n$plan")
  }

  test("q54 SQL surface plans the WindowGroupLimit rewrite like the DSL form") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val plan = SqlSurface.run(spark, sfDir, "q54_topk_group")
      .queryExecution.sparkPlan
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    assert(limits.size === 2,
      s"expected partial+final WindowGroupLimit in the SQL plan, got:\n$plan")
  }

  test("no SQL-surface statement plans a cartesian product or an unbounded nested-loop join") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val failures = (SqlSurface.declaredKeys ++ SqlSurface.extendedKeys)
      .flatMap { key =>
        val plan = SqlSurface.run(spark, sfDir, key)
          .queryExecution.sparkPlan
        val cart = plan.collect { case c: CartesianProductExec => c }
        val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
        // BOUNDED nested loops, individually verified — every entry
        // broadcasts a relation that is small BY CONSTRUCTION, never
        // corpus-sized (the PlanAuditSpec x26g discipline). Classes:
        // (a) one-row / parameter-sized aggregate cross joins (corpus
        //     totals, vocab size, train stats, fitted weights, CMS
        //     widths, curve threshold grids, vocabulary size — ≤ tens
        //     of rows): x37 x42 x45 x48 x51 x60 x62 x63 x73 x88 x97
        //     x111 x116 x117 x118 x118s x126h x59 x66
        // (b) fixed probe slices against the corpus — linear, the
        //     documented ground-truth shape: x06 (10 query vectors),
        //     x13 (signup slice, user_id < 50), x72 (300-row sides).
        // A key NOT listed here that plans a nested loop is a real
        // hazard and must fail this audit.
        val bounded = Set(
          "x59_value_quartiles", "x66_temperature_mix",
          "x37_rare_token_ratio", "x42_bigram_logprob",
          "x45_hopping_window", "x48_bigram_logprob_split",
          "x51_tfidf", "x60_negative_samples", "x62_bm25_topk",
          "x63_dsir_logratio", "x73_rrf_fusion",
          "x88_cms_point_estimates", "x97_semantic_decontam",
          "x111_threshold_sweep", "x116_neardup_threshold_curve",
          "x117_decontam_threshold_curve", "x118_quality_lr_weights",
          "x118s_quality_lr_scores", "x126h_mix_heldout_uniform",
          "x06_ann_brute_topk", "x13_range_join", "x72_fuzzy_join")
        (if (cart.nonEmpty && !bounded(key)) Seq(s"$key: CartesianProduct")
         else Nil) ++
          (if (bnlj.nonEmpty && !bounded(key)) Seq(s"$key: BroadcastNestedLoopJoin")
           else Nil)
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("q26 SQL surface broadcasts the customer side like the DSL form") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = SqlSurface.run(spark, sfDir, "q26_join")
      .queryExecution.sparkPlan
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"expected a broadcast join in the SQL plan, got:\n$plan")
  }
}
