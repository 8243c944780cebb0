package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalQueries

/** Retrieval/selection family: BM25 ranking semantics, DSIR importance
  * direction, and the SemDeDup canonical mapping. (Cross-engine value
  * equality is the DuckDB oracle's job; these pin the SEMANTICS.)
  */
class RetrievalSpec extends SparkSpecBase {
  import spark.implicits._

  test("bm25: tf monotonicity, idf favors rare terms, dl normalization") {
    val docs = Seq(
      (1L, "apple apple apple banana"), // tf(apple)=3
      (2L, "apple banana cherry date"), // tf(apple)=1
      (3L, "apple banana"), // tf=1 but SHORTER doc: dl-normalized above doc 2
      (4L, "cherry date elderberry fig"), // no query terms
      (5L, "banana banana banana banana") // only the common term
    ).toDF("doc_id", "text")
    val top = RetrievalQueries.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), k = 5)
      .as[(Long, Double)].collect().toSeq
    val rank = top.map(_._1)
    assert(!rank.contains(4L), "a doc with no query terms must not score")
    assert(rank.indexOf(1L) < rank.indexOf(2L),
      "higher tf must outrank lower tf at similar length")
    assert(rank.indexOf(3L) < rank.indexOf(2L),
      "equal tf in a shorter doc must rank higher (dl normalization)")
    assert(top.forall(_._2 > 0))
  }

  test("dsir: target-like docs get positive log-weights, off-target negative") {
    // target = src "t": speaks apple/banana; raw background speaks x/y/z
    val docs = (1L to 20L).map { i =>
      if (i <= 5) (i, "t", "apple banana apple banana apple")
      else (i, "r", "xx yy zz xx yy zz xx yy")
    }.toDF("doc_id", "source", "text")
    val w = RetrievalQueries.dsirLogWeights(docs, "doc_id", "text",
        col("source") === "t")
      .as[(Long, Double)].collect().toMap
    (1L to 5L).foreach(i => assert(w(i) > 0,
      s"target-domain doc $i must weigh positive, got ${w(i)}"))
    (6L to 20L).foreach(i => assert(w(i) < 0,
      s"background doc $i must weigh negative, got ${w(i)}"))
  }

  test("semantic canonical: exact-copy vectors share a min-id root; singletons self-root") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x64_semantic_canonical")(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // the augmentation copies ids < 20 to id+10000: every copy must
    // resolve to its original (the min id of the pair/cluster)
    (0L until 20L).filter(out.contains).foreach { i =>
      assert(out(i + 10000) === out(i),
        s"copy ${i + 10000} must share $i's root")
      assert(out(i) <= i, "root is the min cluster member")
    }
    // roots are fixpoints: root(root(x)) == root(x)
    out.values.toSet.foreach { r: Long => assert(out(r) === r) }
  }
}
