package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable column-level building blocks of the engine.
  *
  * Everything here composes built-in (codegen'd) Catalyst expressions —
  * no Scala UDFs — so the operators stay inside whole-stage codegen and
  * remain pushdown/pruning-friendly at 100 TB scale.
  */
object GraftFunctions {

  /** Header/text normalization used throughout the reference cleaner:
    * lower-case, trim, collapse runs of whitespace, spaces -> underscores.
    * (reference: pd_data_cleaner.py:62-66, 107-115)
    */
  def normalizeToken(c: Column): Column =
    regexp_replace(regexp_replace(lower(trim(c)), "\\s+", " "), " ", "_")

  /** Empty string -> null (reference's ""/NaN interconversion,
    * pd_data_cleaner.py:31,164).
    */
  def emptyToNull(c: Column): Column = when(trim(c) === "", lit(null)).otherwise(c)

  /** Take-while-nonempty ordered string join (OP-32, pd_data_cleaner.py:120-132).
    *
    * Input: array<struct<ord: numeric, v: string>> (unordered, as produced
    * by collect_list). Sorts by ord, then concatenates " " + v for the
    * leading run of non-empty values, stopping at the first null/empty —
    * trailing fragments after a gap are DISCARDED (a deliberate reference
    * wart we preserve). Result is trimmed (the reference trims globally).
    *
    * Implemented as a higher-order `aggregate` fold with a (stop, acc)
    * accumulator — pure built-in expressions, no UDAF needed.
    */
  def takeWhileJoin(arr: Column): Column = {
    val sorted = sort_array(arr)
    val folded = aggregate(
      sorted,
      struct(lit(false).as("stop"), lit("").as("acc")),
      (acc, x) => {
        // Gap test matches the reference's `if not item` exactly: null or
        // "" stops the fold; whitespace-only strings are truthy and join.
        val gap = acc("stop") || x("v").isNull || x("v") === ""
        struct(
          gap.as("stop"),
          when(gap, acc("acc")).otherwise(concat(acc("acc"), lit(" "), x("v"))).as("acc"))
      },
      acc => trim(acc("acc")))
    folded
  }

  /** Parse a human-formatted amount ("1,234,567.89") to double; garbage
    * coerces to null (OP-55, pd_data_cleaner.py:169-171). try_cast, not
    * cast: ANSI mode (Spark 4 default) would otherwise throw on the
    * reference's merged-amount wart rows instead of nulling them.
    */
  def parseAmount(c: Column): Column =
    regexp_replace(c, ",", "").try_cast("double")

  /** Cosine similarity between two array<float>/array<double> columns,
    * computed in double with an explicit, deterministic formula:
    * dot(a,b) / sqrt(dot(a,a) * dot(b,b)).
    */
  def cosineSim(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // zero-norm guard: 0/0 would be NaN, and Spark sorts NaN ABOVE every
    // double, so an all-zero vector would pass any >= threshold filter
    // as a "perfect match"; null fails such filters instead
    val denom = sqrt(dot(a, a) * dot(b, b))
    when(denom > 0, dot(a, b) / denom)
  }

  /** Whitespace tokenizer shared by the text-analysis operators; lowercases
    * and drops empty tokens so results are stable across engines.
    */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

  /** Word n-gram shingles (sorted, distinct) of a text column.
    * Positions run 1..max(len-(n-1), 1), so a document shorter than n
    * tokens yields its whole token list as one (short) shingle — matching
    * the SQL-oracle formulation exactly.
    */
  def shingles(text: Column, n: Int): Column =
    array_sort(array_distinct(filter(windowGrams(tokens(text), n), g => g =!= "")))

  /** All k-token sliding windows of a token array, joined with single
    * spaces — positions 1..max(len-(k-1), 1), so a shorter-than-k input
    * yields its whole token list as one (short) window. The ONE
    * definition of the window-position convention, shared by the
    * shingle dedup family, Contamination.tokenWindows and
    * PackingQueries.repetitionRatio (each with a matching SQL-oracle
    * formulation).
    */
  def windowGrams(ts: Column, k: Int): Column =
    // `ts` binds ONCE through the outer lambda variable (transform over
    // a 1-element array — Catalyst's `let`). Higher-order functions are
    // never codegen'd, and in interpreted eval a lambda body re-executes
    // every captured NON-variable subtree per element: the direct form
    // re-tokenized the whole document once per window position — O(L²)
    // in document length, a silent quadratic on the exact long-document
    // tail a web corpus always carries.
    element_at(transform(array(ts), t =>
      transform(
        sequence(lit(1), greatest(size(t) - (k - 1), lit(1))),
        i => array_join(slice(t, i, lit(k)), " "))), 1)
}
