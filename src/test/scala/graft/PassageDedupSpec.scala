package graft

import graft.operators.PassageDedup

/** Pins the token-span semantics the sf-corpus oracle can't isolate:
  * overlapping-window merging into maximal spans, disjoint spans in one
  * document, within-doc repetition, short-document clamping, canonical
  * (globally first) occurrence retention, and null/empty text.
  */
class PassageDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val K = 5

  private def spans(rows: Seq[(Long, String)]) =
    PassageDedup.duplicatePassageSpans(rows.toDF("id", "text"), "id", "text", K)
      .as[(Long, Long, Long, Long)].collect().toSeq

  private def cleaned(rows: Seq[(Long, String)]) =
    PassageDedup.removeDuplicatePassages(rows.toDF("id", "text"), "id", "text", K)
      .as[(Long, String)].collect().toSeq

  test("shared 7-token passage merges its 3 overlapping windows into one maximal span") {
    val docs = Seq(
      1L -> "u1 u2 p1 p2 p3 p4 p5 p6 p7 u3",
      2L -> "w1 p1 p2 p3 p4 p5 p6 p7 w2 w3")
    assert(spans(docs) === Seq((1L, 3L, 9L, 7L), (2L, 2L, 8L, 7L)))
  }

  test("canonical (first) occurrence keeps its text; later occurrence is excised") {
    val docs = Seq(
      1L -> "u1 u2 p1 p2 p3 p4 p5 p6 p7 u3",
      2L -> "w1 p1 p2 p3 p4 p5 p6 p7 w2 w3")
    assert(cleaned(docs) === Seq(
      1L -> "u1 u2 p1 p2 p3 p4 p5 p6 p7 u3",
      2L -> "w1 w2 w3"))
  }

  test("two disjoint duplicated passages in one doc yield two spans") {
    val docs = Seq(
      1L -> "a1 a2 a3 a4 a5 z1 z2 z3 z4 z5 z6 b1 b2 b3 b4 b5",
      2L -> "a1 a2 a3 a4 a5",
      3L -> "b1 b2 b3 b4 b5")
    assert(spans(docs) === Seq(
      (1L, 1L, 5L, 5L), (1L, 12L, 16L, 5L),
      (2L, 1L, 5L, 5L), (3L, 1L, 5L, 5L)))
    // doc 1 holds both canonical occurrences; docs 2 and 3 empty out
    assert(cleaned(docs) === Seq(
      1L -> "a1 a2 a3 a4 a5 z1 z2 z3 z4 z5 z6 b1 b2 b3 b4 b5",
      2L -> "", 3L -> ""))
  }

  test("WITHIN-doc repetition duplicates its window; self-overlap collapses to one period") {
    // "q1..q5" twice: the repeated window occurs at pos 1 and 6; the gap
    // (5) is <= K so the two marks merge into one whole-doc span, and
    // removal keeps exactly the canonical first period.
    val docs = Seq(1L -> "q1 q2 q3 q4 q5 q1 q2 q3 q4 q5")
    assert(spans(docs) === Seq((1L, 1L, 10L, 10L)))
    assert(cleaned(docs) === Seq(1L -> "q1 q2 q3 q4 q5"))
  }

  test("identical short docs (< K tokens): whole-doc window, span_end clamped to dl") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c")
    assert(spans(docs) === Seq((1L, 1L, 3L, 3L), (2L, 1L, 3L, 3L)))
    assert(cleaned(docs) === Seq(1L -> "a b c", 2L -> ""))
  }

  test("incremental: history hits and in-batch repeats mark spans; fresh text does not") {
    val stored = PassageDedup.windowIndex(
      Seq(10L -> "h1 h2 h3 h4 h5 h6").toDF("id", "text"), "id", "text", K)
    val batch = Seq(
      1L -> "a1 h1 h2 h3 h4 h5 a2",      // history passage at pos 2..6
      2L -> "f1 f2 f3 f4 f5 f6 f7",      // fresh — no spans
      3L -> "r1 r2 r3 r4 r5 x9 r1 r2 r3 r4 r5") // in-batch repeat
      .toDF("id", "text")
    val out = PassageDedup.incrementalPassageSpans(batch, stored,
      "id", "text", K).as[(Long, Long, Long, Long)].collect().toSeq
    // doc 3's repeated 5-gram marks pos 1 and 7; the gap (6) exceeds K
    // so the two occurrences stay separate maximal spans
    assert(out === Seq((1L, 2L, 6L, 5L), (3L, 1L, 5L, 5L), (3L, 7L, 11L, 5L)))
  }

  test("null and empty text produce no spans and empty clean_text rows") {
    val rows = Seq((1L, Some("x1 x2 x3 x4 x5")), (2L, Some("")), (3L, None))
      .toDF("id", "text")
    assert(PassageDedup.duplicatePassageSpans(rows, "id", "text", K).count() === 0)
    val c = PassageDedup.removeDuplicatePassages(rows, "id", "text", K)
      .as[(Long, String)].collect().toSeq
    assert(c === Seq(1L -> "x1 x2 x3 x4 x5", 2L -> "", 3L -> ""))
  }
}
