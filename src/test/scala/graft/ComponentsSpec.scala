package graft

import graft.operators.Components

/** Connected components: known small graphs, log-round convergence on a
  * long path (the pointer-jumping property), and keep-canonical dedup.
  */
class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("chain, triangle and separate pair resolve to min-id roots") {
    val roots = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L))) // separate pair
    assert(roots === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a 64-node path converges within the round bound (pointer jumping)") {
    val path = (0L until 63L).map(i => (i, i + 1))
    val roots = cc(path)
    assert(roots.size == 64 && roots.values.forall(_ == 0L))
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 3L), (3L, 9L))) === Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
  }

  test("empty edge list: no components, keepCanonical passes everything through") {
    assert(cc(Seq.empty) === Map.empty)
    val docs = (1L to 3L).toDF("id")
    val kept = Components.keepCanonical(docs, "id",
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("convergence check launches no extra job: two jobs per round plus setup") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    val sc = spark.sparkContext
    // AQE splits one materialization into per-shuffle-stage jobs, which
    // would make the count plan-shape-dependent; job accounting is only
    // deterministic with it off (1 localCheckpoint = 1 job, no others)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abj = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // a broadcast build side collects via its own job; force SMJ so the
    // only jobs are the checkpoints themselves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.addSparkListener(listener)
    try {
      // triangle: round 1 relabels, round 2 confirms -> exactly 2 rounds
      val roots = cc(Seq((10L, 11L), (11L, 12L), (10L, 12L)))
      assert(roots === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
      // listener bus is async: poll until the count is stable
      var last = -1
      var spins = 0
      while (jobs.get != last && spins < 50) {
        last = jobs.get; spins += 1; Thread.sleep(100)
      }
      // 2 setup checkpoints (sym, initial labels) + 2 rounds x 2
      // checkpoints + 1 collect from cc() = 7; the old separate
      // join+count convergence job would add one per round (9+)
      assert(jobs.get <= 7, s"expected <=7 jobs (2 setup + 2/round + collect), saw ${jobs.get}")
    } finally {
      sc.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abj)
    }
  }

  test("keepCanonical keeps one doc per cluster and all unpaired docs") {
    val docs = (1L to 10L).toDF("id")
    val pairs = Seq((2L, 7L), (7L, 9L), (4L, 5L)).toDF("a", "b")
    val kept = Components.keepCanonical(docs, "id", pairs)
      .as[Long].collect().toSet
    // clusters {2,7,9} -> keep 2; {4,5} -> keep 4; others untouched
    assert(kept === Set(1L, 2L, 3L, 4L, 6L, 8L, 10L))
  }

  test("pageRank: cycle fixpoint, hub dominance, exact determinism") {
    val S = 1000000000000L
    // 3-cycle: every node's inflow is one full rank share -> the uniform
    // start IS the fixpoint, exactly (0.15*S + 0.85*S = S in integers)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cr = Components.pageRank(cycle, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(cr === Map(1L -> S, 2L -> S, 3L -> S))

    // symmetrized star: the hub must outrank every leaf; total mass is
    // conserved up to the per-division floor truncation
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    val sr = Components.pageRank(star, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(sr(0L) > sr(1L) && sr(1L) === sr(2L) && sr(2L) === sr(3L))
    val total = sr.values.sum
    assert(total <= 4 * S && total > 4 * S - 1000,
      s"mass conserved up to floor loss, got $total vs ${4 * S}")

    // bit-determinism: two evaluations agree exactly
    assert(Components.pageRank(star, iters = 5)
      .as[(Long, Long)].collect().toMap === sr)
  }

  test("pageRankShuffle: bit-identical to the broadcast path on every graph shape") {
    // the billion-node swap must be a pure data-movement change: same
    // integer algebra, same ranks to the last micro-unit
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    // an irregular multi-component graph: chain + triangle + self-loop,
    // mixed out-degrees — exercises floor-division truncation unevenly
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (2L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L), (8L, 8L)).toDF("src", "dst")
    for (g <- Seq(cycle, star, mixed); iters <- Seq(0, 1, 5)) {
      val bc = Components.pageRank(g, iters).as[(Long, Long)].collect().toMap
      val sh = Components.pageRankShuffle(g, iters).as[(Long, Long)].collect().toMap
      assert(sh === bc, s"iters=$iters diverged")
    }
  }

  test("pageRankAuto dispatches on node count, same ranks either way") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    val bc = Components.pageRank(star, iters = 3).as[(Long, Long)].collect().toMap
    // limit above node count -> broadcast path; below -> shuffle path
    assert(Components.pageRankAuto(star, 3, broadcastNodeLimit = 100L)
      .as[(Long, Long)].collect().toMap === bc)
    assert(Components.pageRankAuto(star, 3, broadcastNodeLimit = 1L)
      .as[(Long, Long)].collect().toMap === bc)
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.triangleCounts(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("triangleCounts: K4, pendant and triangle-free shapes count exactly") {
    // K4: every node sits in C(3,2) = 3 triangles; the pendant (5) and
    // the separate path (10-11-12) sit in none and must be absent
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = tri(k4 ++ Seq((4L, 5L), (10L, 11L), (11L, 12L)))
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got)
    // two triangles sharing an edge: shared nodes count both
    val bowtie = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)))
    assert(bowtie === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L), bowtie)
    // triangle-free graph: empty result
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
  }

  test("triangleCounts is invariant to edge direction, duplicates and self-loops") {
    val clean = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val messy = tri(Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (3L, 1L), (2L, 2L)))
    assert(clean === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(messy === clean)
  }

  test("triangleCounts on a skewed hub graph (the orientation's reason to exist)") {
    // star hub 0 with 40 spokes, spokes chained pairwise: triangles are
    // exactly (0, 2i+1, 2i+2); the hub's 40 edges must all be charged
    // to the degree-2 spokes by the orientation, never fanned out from
    // the hub itself (behavioral check: counts are exact under skew)
    val spokes = (1L to 40L).map(i => (0L, i))
    val chains = (0L until 20L).map(i => (2 * i + 1, 2 * i + 2))
    val got = tri(spokes ++ chains)
    assert(got(0L) === 20L)
    (1L to 40L).foreach(i => assert(got(i) === 1L, s"spoke $i"))
  }
}
