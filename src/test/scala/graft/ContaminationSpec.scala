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

  test("stop-window skew: a window shared by EVERY doc neither breaks " +
      "values nor plans a join keyed on the window hash") {
    // 200 docs, each carrying the same boilerplate phrase (the corpus-wide
    // hot key) plus a unique tail — the shape that used to funnel every
    // (id, w) row of the hot window into a single join task
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ")
    val docs = (1L to 200L).map(i =>
      (i, s"$boiler u${i}a u${i}b u${i}c u${i}d u${i}e")).toDF("doc_id", "text")
    val q = Contamination.dupWindowFrac(docs, "doc_id", "text", k = 5)
    // every doc: 6 distinct windows, exactly 1 (the pure boilerplate
    // window) shared; the 5 windows straddling boiler+unique tail are
    // unique to the doc
    val r = q.as[(Long, Double)].collect().toMap
    assert(r.size === 200 && r.values.forall(v => math.abs(v - 1.0 / 6) < 1e-6))
    // the physical plan's only join keys on doc id (long ids here): no
    // join may reference the window-hash column — the hot key must be
    // consumed by map-side-combinable aggregation only
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec, BroadcastHashJoinExec}
    val joins = q.queryExecution.sparkPlan.collect {
      case j: SortMergeJoinExec => j.leftKeys
      case j: ShuffledHashJoinExec => j.leftKeys
      case j: BroadcastHashJoinExec => j.leftKeys
    }
    assert(joins.nonEmpty)
    joins.foreach { keys =>
      assert(!keys.exists(_.references.exists(_.name == "w")),
        s"join keyed on window hash:\n${q.queryExecution.sparkPlan}")
    }
  }

  test("bloom decontamination dominates the exact fraction and hits full recall") {
    val train = Seq((10L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (20L, (1 to 10).map(i => s"w$i").mkString(" ")),  // fully in train
      (21L, "completely novel words that the train corpus never saw"),
      (22L, (25 to 35).map(i => s"w$i").mkString(" "))  // partially in train
    ).toDF("doc_id", "text")
    val evW = Contamination.tokenWindows(eval_, "doc_id", "text", k = 5)
    val trW = Contamination.tokenWindows(train, "doc_id", "text", k = 5)
    val exact = Contamination.decontaminationFromWindows(evW, trW)
      .as[(Long, Double)].collect().toMap
    val bloom = Contamination.decontaminationBloomFrac(evW, trW)
      .as[(Long, Double)].collect().toMap
    // Bloom guarantee: no false negatives -> bloom_frac >= exact, and a
    // fully-contained doc must read 1.0 regardless of false positives
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (id, e) =>
      assert(bloom(id) >= e - 1e-9, s"doc $id: bloom ${bloom(id)} < exact $e")
    }
    assert(bloom(20L) === 1.0)
    // at 10 bits/item on a tiny corpus, false positives are ~impossible:
    // the clean doc must read ~0
    assert(bloom(21L) <= 0.2)
  }

  test("short documents form one whole-doc window and join the relation") {
    val docs = Seq((1L, "just three words"), (2L, "just three words")).toDF("doc_id", "text")
    val w = Contamination.tokenWindows(docs, "doc_id", "text", k = 5)
      .as[(Long, Long)].collect().toSeq
    assert(w.length === 2 && w.map(_._2).distinct.size === 1)
    val r = Contamination.dupWindowFrac(docs, "doc_id", "text", k = 5)
      .as[(Long, Double)].collect().toMap
    assert(r === Map(1L -> 1.0, 2L -> 1.0))
  }

  private def spans(rows: Seq[(Long, String)], k: Int = 3) =
    Contamination.dropRepeatedSpans(rows.toDF("id", "text"), "id", "text", k)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq

  test("dropRepeatedSpans: the globally-first occurrence survives, copies hollow out") {
    val r = spans(Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),      // exact copy: every window duplicates doc 1
      (3L, "x y z w v")))
    assert(r === Seq(
      (1L, "a b c d e", 5L, 0L),
      (2L, "", 0L, 5L),
      (3L, "x y z w v", 5L, 0L)))
  }

  test("dropRepeatedSpans removes a WITHIN-document repeat, keeping the first") {
    // "p q r" repeats inside one doc; the second occurrence's tokens drop
    val r = spans(Seq((1L, "p q r m n p q r"), (2L, "f g h i j")))
    assert(r.head === ((1L, "p q r m n", 5L, 3L)))
  }

  test("dropRepeatedSpans: shorter-than-k docs pass through untouched") {
    val r = spans(Seq((1L, "a b"), (2L, "a b")))
    assert(r === Seq((1L, "a b", 2L, 0L), (2L, "a b", 2L, 0L)))
  }

  test("dropRepeatedSpans: case preserved in output, ignored for matching") {
    val r = spans(Seq((1L, "A B C d"), (2L, "a b c e")))
    // "a b c" matches case-insensitively: doc 1 (first) keeps its casing,
    // doc 2 loses the span and keeps only its tail token
    assert(r === Seq((1L, "A B C d", 4L, 0L), (2L, "e", 1L, 3L)))
  }

  test("dropRepeatedSpans: overlapping duplicate windows union their coverage") {
    // doc 2 repeats doc 1's full text plus one fresh tail token; all
    // overlapping windows are dups and their union covers the whole copy
    val r = spans(Seq((1L, "a b c d"), (2L, "a b c d z")))
    // windows of doc2: "a b c"(dup) "b c d"(dup) "c d z"(fresh) — tokens
    // 1..4 covered by dups; "c d z" is NOT a dup so z survives... but c,d
    // are already covered. Survivor = "z"
    assert(r === Seq((1L, "a b c d", 4L, 0L), (2L, "z", 1L, 4L)))
  }

  test("x97 catches a shuffled-word eval copy that x33 provably misses") {
    import org.apache.spark.sql.functions.col
    // 30 distinct tokens, then the same multiset in REVERSED order: no
    // 5-token window survives the reordering, but the bag of words —
    // and hence the md5-TF cosine — is identical
    val toks = (1 to 30).map(i => s"tok$i")
    val train = Seq((1L, toks.mkString(" ")),
      (2L, (100 to 129).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    val eval_ = Seq((900001L, toks.reverse.mkString(" "))).toDF("doc_id", "text")
    // x33's exact-substring check: ZERO shared windows => contam_frac 0
    val exact = Contamination.decontamination(eval_, train, "doc_id", "text", k = 5)
      .as[(Long, Double)].collect().toMap
    assert(exact(900001L) === 0.0,
      s"reversed copy should share no 5-token window: $exact")
    // x97's semantic check: cosine 1.0 => flagged against doc 1
    val sem = Contamination.semanticDecontamReport(train, eval_,
      "doc_id", "text", dim = 64, thr = 0.95)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(sem.head === ((1L, 900001L, 1.0, true)),
      s"semantic decontam missed the reordered copy: $sem")
    // the unrelated doc is NOT flagged (near-orthogonal vocabulary)
    assert(!sem(1)._4, s"unrelated doc spuriously flagged: ${sem(1)}")
  }
}
