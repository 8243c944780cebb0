package graft

import graft.operators.Contamination

/** Exact-substring overlap: window construction, duplicate-fraction
  * known values, and decontamination against a train corpus.
  */
class ContaminationSpec extends SparkSpecBase {
  import spark.implicits._

  test("dupWindowFrac: exact copies 1.0, unique doc 0.0, partial copy in between") {
    val base = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                     // copied by 2
      (2L, base),                                     // exact copy
      (3L, "all these words appear nowhere else at all"),
      // shares its first 8 tokens (4 of 8 windows at k=5) with doc 1
      (4L, (1 to 8).map(i => s"t$i").mkString(" ") + " zz yy xx ww")
    ).toDF("doc_id", "text")
    val r = Contamination.dupWindowFrac(docs, "doc_id", "text", k = 5)
      .as[(Long, Double)].collect().toMap
    assert(r(1L) === 1.0)
    assert(r(2L) === 1.0)
    assert(r(3L) === 0.0)
    assert(r(4L) === 0.5) // windows t1..t5, t2..t6, t3..t7, t4..t8 of 8
  }

  test("decontamination: eval fraction counts exactly the train-shared windows") {
    val train = Seq((10L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val eval_ = Seq(
      (20L, (1 to 6).map(i => s"w$i").mkString(" ")),  // both windows in train
      (21L, "clean text with no overlap here at all"),
      (22L, (4 to 8).map(i => s"w$i").mkString(" ") + " novel") // 1 of 2 windows
    ).toDF("doc_id", "text")
    val r = Contamination.decontamination(eval_, train, "doc_id", "text", k = 5)
      .as[(Long, Double)].collect().toMap
    assert(r(20L) === 1.0)
    assert(r(21L) === 0.0)
    assert(r(22L) === 0.5)
  }

  test("short documents form one whole-doc window and join the relation") {
    val docs = Seq((1L, "just three words"), (2L, "just three words")).toDF("doc_id", "text")
    val w = Contamination.tokenWindows(docs, "doc_id", "text", k = 5)
      .as[(Long, String)].collect().toSeq
    assert(w.length === 2 && w.map(_._2).distinct.size === 1)
    val r = Contamination.dupWindowFrac(docs, "doc_id", "text", k = 5)
      .as[(Long, Double)].collect().toMap
    assert(r === Map(1L -> 1.0, 2L -> 1.0))
  }
}
