package graft

import org.apache.spark.sql.functions._
import graft.operators.ParagraphOps

/** Paragraph-hygiene edge cases the sf-corpus oracle can't pin:
  * within-doc duplicate paragraphs, fully-dropped documents, empty/null
  * text, and the exact boilerplate threshold boundary.
  */
class ParagraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def dedup(rows: Seq[(Long, String)], width: Int = 2, maxDf: Int = 1) =
    ParagraphOps.paragraphDedup(rows.toDF("id", "text"), "id", "text", width, maxDf)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq

  test("paragraph shared across docs is dropped from BOTH; unique ones survive") {
    // width=2 → paragraphs are 2-token chunks; "a b" appears in docs 1 and 2
    val r = dedup(Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "p q r s")))
    assert(r === Seq(
      (1L, "c d", 1L, 1L),
      (2L, "x y", 1L, 1L),
      (3L, "p q r s", 2L, 0L)))
  }

  test("doc whose every paragraph is corpus-duplicated survives with empty text") {
    val r = dedup(Seq((1L, "a b"), (2L, "a b")))
    assert(r === Seq((1L, "", 0L, 1L), (2L, "", 0L, 1L)))
  }

  test("WITHIN-doc duplicate paragraph: df counts docs, both instances kept") {
    // "a b" twice in one doc — df = 1 distinct doc, so both stay
    val r = dedup(Seq((1L, "a b a b"), (2L, "x y z w")))
    assert(r === Seq((1L, "a b a b", 2L, 0L), (2L, "x y z w", 2L, 0L)))
  }

  test("empty and null text yield empty output rows, not dropped docs") {
    val rows = Seq((1L, Some("a b c d")), (2L, Some("")), (3L, None))
      .toDF("id", "text")
    val r = ParagraphOps.paragraphDedup(rows, "id", "text", 2, 1)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    assert(r === Seq(
      (1L, "a b c d", 2L, 0L), (2L, "", 0L, 0L), (3L, "", 0L, 0L)))
  }

  test("maxDf loosens the bar: df=2 paragraphs survive at maxDf=2") {
    val r = dedup(Seq((1L, "a b"), (2L, "a b"), (3L, "a b")), maxDf = 2)
    // "a b" is in 3 docs > maxDf=2 → still dropped everywhere
    assert(r.map(_._2) === Seq("", "", ""))
    val r2 = dedup(Seq((1L, "a b"), (2L, "a b")), maxDf = 2)
    assert(r2.map(_._2) === Seq("a b", "a b"))
  }

  test("case is PRESERVED in output but IGNORED for frequency counting") {
    // "A B" and "a b" are the same paragraph for dedup purposes (both
    // drop), yet the surviving text keeps its original casing
    val r = dedup(Seq((1L, "A B c D"), (2L, "a b x y")))
    assert(r === Seq((1L, "c D", 1L, 1L), (2L, "x y", 1L, 1L)))
  }

  test("reassembly preserves document order of the surviving paragraphs") {
    // drop the middle paragraph ("m m", shared with doc 2)
    val r = dedup(Seq((1L, "a b m m c d"), (2L, "m m")))
    assert(r.head === ((1L, "a b c d", 2L, 1L)))
  }

  private def strip(rows: Seq[(Long, String, String)], minFrac: Double) =
    ParagraphOps.boilerplateStrip(rows.toDF("id", "source", "text"),
        "id", "text", "source", width = 2, minFrac = minFrac)
      .orderBy("id")
      .as[(Long, String, Long, Long)].collect().toSeq

  test("NULL sources form their own bucket with normal strip semantics") {
    val rows = Seq(
      (1L, Option("A"), "h h a b"), (2L, Option("A"), "h h c d"),
      (3L, Option.empty[String], "n n u v"), (4L, Option.empty[String], "n n w x"))
      .toDF("id", "source", "text")
    val r = ParagraphOps.boilerplateStrip(rows, "id", "text", "source",
        width = 2, minFrac = 0.9)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    // each bucket strips ITS shared header ("h h" for A, "n n" for the
    // null bucket) and keeps the unique bodies — the null-source docs
    // are a bucket, not silently hollowed out
    assert(r === Seq(
      (1L, "a b", 1L, 1L), (2L, "c d", 1L, 1L),
      (3L, "u v", 1L, 1L), (4L, "w x", 1L, 1L)))
  }

  test("boilerplate threshold is per-source and EXACT at the boundary") {
    // "h h" in 2 of 4 src-A docs = 50%: at minFrac=0.5, nd >= frac*ns
    // holds with equality → boilerplate, stripped
    val corpus = Seq(
      (1L, "A", "h h a b"), (2L, "A", "h h c d"),
      (3L, "A", "e f"), (4L, "A", "g i"),
      (5L, "B", "h h j k"))
    val r = strip(corpus, 0.5)
    assert(r === Seq(
      (1L, "a b", 1L, 1L), (2L, "c d", 1L, 1L),
      (3L, "e f", 1L, 0L), (4L, "g i", 1L, 0L),
      // source B has one doc: EVERY chunk is 100% of B → all stripped
      (5L, "", 0L, 2L)))
    // just above the boundary nothing in A is boilerplate
    val r2 = strip(corpus, 0.500001)
    assert(r2.take(2).map(_._2) === Seq("h h a b", "h h c d"))
  }
}
