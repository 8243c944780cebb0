package graft

import org.apache.spark.sql.functions._
import graft.operators.C4Rules

/** C4 line rules (x109): exact behavior on a hand-built fixture (every
  * rule and the reassembly pinned), plus declared-query consistency on
  * the real corpus with the planted artifacts.
  */
class C4RulesSpec extends SparkSpecBase {
  import spark.implicits._

  test("every rule and the reassembly are exact on a hand fixture") {
    // width 4, minWords 3 for readable chunks
    val docs = Seq(
      // two full lines ending in '.', both kept
      (1L, "one two three four. five six seven eight."),
      // line 0 no punct (dropped), line 1 = short tail "nine." (dropped)
      (2L, "one two three four five six seven eight nine."),
      // lorem line dropped, brace line dropped, good line kept
      (3L, "lorem ipsum dolor sit. alpha beta { nope. good line stays here."),
      (4L, "")
    ).toDF("id", "t")
    val out = C4Rules.c4LineClean(docs, "id", "t", width = 4, minWords = 3)
      .orderBy(col("id"))
      .collect()
    val r1 = out(0)
    assert(r1.getLong(1) === 2 && r1.getLong(6) === 2)
    assert(r1.getString(7) === "one two three four. five six seven eight.")
    val r2 = out(1)
    assert(r2.getLong(1) === 3, "9 tokens at width 4 = 3 lines")
    assert(r2.getLong(2) === 1, "only the tail line ends in punct")
    assert(r2.getLong(3) === 1, "the 1-token tail is short")
    assert(r2.getLong(6) === 0 && r2.getString(7) === "",
      "full lines lack punct, the punct line is short: nothing survives")
    val r3 = out(2)
    assert(r3.getLong(4) === 1 && r3.getLong(5) === 1)
    assert(r3.getString(7) === "good line stays here.")
    val r4 = out(3)
    assert(r4.getLong(1) === 0 && r4.getString(7) === "",
      "an empty document has no lines and empty clean text")
  }

  test("declared x109: planted rules fire, accounting is self-consistent") {
    val out = SparkEntry.queries("x109_c4_line_rules")(spark, sfDir)
      .localCheckpoint(true)
    try {
      assert(out.filter(col("doc_id") % 7 === 0 &&
        col("n_punct_lines") === 0).count() === 0,
        "every %7 doc gets a terminal-punctuation line")
      assert(out.filter(col("doc_id") % 11 === 0 &&
        col("n_lorem_lines") === 0).count() === 0)
      assert(out.filter(col("doc_id") % 13 === 0 &&
        col("n_brace_lines") === 0).count() === 0)
      // unplanted docs: word salad has no punctuation, placeholder text
      // or braces
      assert(out.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 11 =!= 0 &&
        col("doc_id") % 13 =!= 0 &&
        (col("n_punct_lines") > 0 || col("n_lorem_lines") > 0 ||
          col("n_brace_lines") > 0)).count() === 0)
      // kept lines are a subset of punct lines; empty text iff 0 kept
      assert(out.filter(col("n_kept") > col("n_punct_lines")).count() === 0)
      assert(out.filter((col("n_kept") === 0) =!=
        (col("clean_text") === "")).count() === 0)
      // the short-tail rule fires naturally somewhere in the corpus
      assert(out.filter(col("n_short_lines") > 0).count() > 0)
    } finally CheckpointBlocks.release(out)
  }
}
