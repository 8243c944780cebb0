package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Dedup + similarity operators on small controlled corpora: exact
  * ground truth for the approximate paths (LSH candidates must contain
  * the true near-dups; ANN recall vs brute force).
  */
class DedupSimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),      // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),      // near dup of 1
    (4L, "completely different content about spark engines"),
    (5L, "The Quick Brown Fox Jumps Over The Lazy Dog  ")     // case/space dup of 1
  ).toDF("id", "text")

  test("exactKeepFirst keeps lowest id per normalized content") {
    val kept = Dedup.exactKeepFirst(docs, "id", "text")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }

  test("null-text documents pass through exactKeepFirst, never collapse together") {
    val withNulls = Seq((1L, Some("same text")), (2L, Some("same text")),
      (3L, None), (4L, None)).toDF("id", "text")
    val kept = Dedup.exactKeepFirst(withNulls, "id", "text")
      .select("id").as[Long].collect().sorted.toSeq
    // 2 dedups against 1; the two null-text docs BOTH survive (absence
    // of content is not content equality)
    assert(kept === Seq(1L, 3L, 4L))
  }

  test("simhashPairs refuses a radius beyond the 4-block pigeonhole bound") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "id", "text", maxDist = 4)
    }
  }

  test("ngramJaccardPairs finds the dup cluster, not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", n = 3, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhashLshPairs candidates contain the exact duplicates") {
    val pairs = Dedup.minhashLshPairs(docs, "id", "text",
        n = 3, numPerm = 32, bands = 8, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("incremental LSH equals the full recompute restricted to new-doc pairs") {
    val oldDocs = Seq(
      (1L, "alpha beta gamma delta eps zeta"),
      (2L, "one two three four five six"),
      (3L, "alpha beta gamma delta eps zeta") // old-vs-old dup of 1
    ).toDF("id", "text")
    val newDocs = Seq(
      (10L, "alpha beta gamma delta eps zeta"),       // dup of 1 and 3
      (11L, "one two three four five six seven"),     // near dup of 2
      (12L, "alpha beta gamma delta eps zeta")        // dup of 1, 3, 10
    ).toDF("id", "text")
    val shOld = Dedup.shingleTable(oldDocs, "id", "text", n = 3)
    val shNew = Dedup.shingleTable(newDocs, "id", "text", n = 3)
    val inc = Dedup.incrementalMinhashLshPairs(shOld, shNew,
        numPerm = 32, bands = 16, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashLshPairsFromShingles(shOld.unionByName(shNew),
        numPerm = 32, bands = 16, threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(inc === full.filter { case (a, b) => a >= 10L || b >= 10L })
    // the cross and in-batch dups surface; old-vs-old (1,3) never does
    assert(inc.contains((1L, 10L)) && inc.contains((10L, 12L)) &&
      inc.contains((2L, 11L)))
    assert(full.contains((1L, 3L)) && !inc.contains((1L, 3L)))
  }

  test("simhash of identical docs is identical; pairs found at dist 0") {
    val sig = Dedup.simhash(docs, "id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(2L))
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxDist = 3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  private lazy val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 0.01f, 0.0f)),   // near dup of 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("cosinePairs finds only the near-identical pair") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("a zero-norm vector neither ranks in top-k nor emits NaN pairs") {
    val withZero = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (99L, Array(0.0f, 0.0f)) // padding row / failed embedding
    ).toDF("vec_id", "embedding")
    // NaN > any double in Spark's ordering: an unguarded zero vector
    // would out-rank the true neighbor and pass every threshold
    val topk = Similarity.bruteForceTopK(
        withZero.filter($"vec_id" === 1L), withZero, "vec_id", "embedding", k = 2)
      .select("rank", "nid", "sim").as[(Int, Long, Double)].collect().toSeq
    assert(topk.map(_._2) === Seq(2L, 3L), s"got $topk")
    assert(topk.forall(!_._3.isNaN))
    val pairs = Similarity.cosinePairs(withZero, "vec_id", "embedding", 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.forall(p => p._1 != 99L && p._2 != 99L && !p._3.isNaN))
    // zero-norm QUERY likewise yields no neighbors instead of NaN rows
    assert(Similarity.bruteForceTopK(
      withZero.filter($"vec_id" === 99L), withZero, "vec_id", "embedding", k = 2).isEmpty)
  }

  test("bruteForceTopK ranks the closest neighbor first") {
    val topk = Similarity.bruteForceTopK(
        vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", k = 2)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect().toSeq
    assert(topk.head === ((1L, 1, 2L)))
  }

  test("lshTopK achieves full recall@k=3 on the tiny corpus vs brute force") {
    val e = graft.Tables(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // nbits=0 => single bucket => must exactly reproduce brute force
    val lsh = Similarity.lshTopK(q, e, "vec_id", "embedding", k = 3, nbits = 0)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(lsh === brute)
    // nbits=2 => coarse buckets: approximate. On near-random synthetic
    // embeddings recall is genuinely low, so assert structure, not recall:
    // <= k results per query, all drawn from same-bucket candidates with
    // correctly-ranked sims.
    val lsh2 = Similarity.lshTopK(q, e, "vec_id", "embedding", k = 3, nbits = 2)
      .select("qid", "rank", "sim").as[(Long, Int, Double)].collect()
    assert(lsh2.nonEmpty)
    assert(lsh2.forall(_._2 <= 3))
    lsh2.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivfTopK: full probe reproduces brute force exactly; partial probe is precise") {
    val e = graft.Tables(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    // nprobe = nlist: every cell probed -> candidate set is the whole
    // corpus -> MUST equal brute force row-for-row
    val full = Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 3,
        nlist = 8, nprobe = 8)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full === brute)
    // partial probe: approximate recall, but every emitted (qid,nid,sim)
    // must appear score-identical in the exhaustive relation (precision)
    val exhaustive = Similarity.bruteForceTopK(q, e, "vec_id", "embedding",
        k = Int.MaxValue)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().toSet
    val part = Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 3,
        nlist = 8, nprobe = 2)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect()
    assert(part.nonEmpty)
    assert(part.forall(exhaustive.contains), "IVF emitted a score not in the exhaustive relation")
  }

  test("ivfBuildRefined: objective non-decreasing, improves on clustered data, search stays exact") {
    // four tight direction-clusters the hash-seeded centroids won't hit
    // cleanly: refinement must strictly raise the summed cosine
    val base = Seq(
      Array(1f, 0f, 0f), Array(0f, 1f, 0f), Array(0f, 0f, 1f), Array(1f, 1f, 0f))
    val vecs = (0 until 40).map { i =>
      val b = base(i % 4)
      (i.toLong, b.map(v => v * (1f + (i / 4) * 0.01f) + (i % 3) * 0.001f))
    }
    val e = vecs.toDF("vec_id", "embedding")
    val r = Similarity.ivfBuildRefined(e, "vec_id", "embedding",
      nlist = 4, iters = 4)
    assert(r.objectives.size === 5)
    r.objectives.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"objective fell $a -> $b")
    }
    assert(r.objectives.last > r.objectives.head + 1e-3,
      s"refinement must improve on clustered data: ${r.objectives}")
    // the refined index still scores exactly: full-probe search over the
    // refined cells equals brute force row-for-row
    val q = e.filter($"vec_id" < 3)
    val brute = Similarity.bruteForceTopK(q, e, "vec_id", "embedding", k = 3)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val full = Similarity.ivfSearch(r.index, q, "vec_id", "embedding",
        k = 3, nprobe = 4)
      .select("qid", "rank", "nid", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(full === brute)
  }

  test("IVF index round-trips through parquet: stored search == direct search") {
    val e = graft.Tables(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 5)
    val direct = Similarity.ivfTopK(q, e, "vec_id", "embedding", k = 3,
        nlist = 8, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect().toSet

    // build once, persist both halves, serve the query batch from disk
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val idx = Similarity.ivfBuild(e, "vec_id", "embedding", nlist = 8)
    idx.centroids.write.parquet(s"$dir/centroids")
    idx.assignments.write.parquet(s"$dir/assignments")
    val stored = Similarity.IvfIndex(
      spark.read.parquet(s"$dir/centroids"),
      spark.read.parquet(s"$dir/assignments"))
    val served = Similarity.ivfSearch(stored, q, "vec_id", "embedding",
        k = 3, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(served === direct,
      "a search served from the stored index must match the direct search")
  }

  test("fuzzyJoin equals the naive levenshtein join on random names (lossless blocking)") {
    // deterministic pseudo-random names over a tiny alphabet, lengths
    // 3..12 — dense enough that cross-length matches actually occur
    def name(seed: Int): String = {
      var h = seed * 2654435761L
      val len = 3 + math.floorMod(h, 10).toInt
      (0 until len).map { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        ('a' + math.floorMod(h >> 33, 4)).toChar
      }.mkString
    }
    val left = (0 until 60).map(i => (i.toLong, name(i))).toDF("lid", "name")
    val right = (0 until 60).map(i => (1000L + i, name(i + 30))).toDF("rid", "name")
    val got = Dedup.fuzzyJoin(left, right, "lid", "rid", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val naive = left.as[(Long, String)].collect().flatMap { case (l, ln) =>
      right.as[(Long, String)].collect().flatMap { case (r, rn) =>
        val d = levDist(ln, rn)
        if (d <= 2) Some((l, r, d)) else None
      }
    }.toSet
    assert(got === naive, s"blocking must lose nothing: ${naive.diff(got)}")
    assert(naive.nonEmpty, "fixture must actually produce matches")
    assert(naive.exists { case (l, r, _) =>
      val ln = left.filter(col("lid") === l).as[(Long, String)].head()._2
      val rn = right.filter(col("rid") === r).as[(Long, String)].head()._2
      ln.length != rn.length
    }, "fixture must exercise cross-length (adjacent-bucket) matches")
  }

  /** Independent reference Levenshtein (classic DP). */
  private def levDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x112 dup profile accounts for every fixture doc; x113 top grams rank dups first") {
    import org.apache.spark.sql.functions.col
    val prof = SparkEntry.queries("x112_dup_profile")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    // docsWithDups = 500 originals + 50 verbatim copies + 30 tail-
    // modified (content-distinct) copies at sf0.001
    assert(prof.map(_._3).sum === 580, s"every doc accounted: $prof")
    val two = prof.find(_._1 === 2).get
    assert(two._2 === 50, "the 50 verbatim copy pairs form the 2-clusters")
    assert(prof.find(_._1 === 1).get._3 === 480, "480 singletons remain")
    val top = SparkEntry.queries("x113_top_ngrams")(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(top.size === 10)
    // the duplicated docs' grams dominate: every top entry counts >= 2,
    // and ordering is (count desc, gram asc)
    assert(top.forall(_._2 >= 2), s"top grams must repeat: $top")
    assert(top === top.sortBy(t => (-t._2, t._1)))
  }
}
