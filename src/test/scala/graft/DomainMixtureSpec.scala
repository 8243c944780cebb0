package graft

import org.apache.spark.sql.functions._
import graft.operators.DomainMixture

/** x126: DoReMi-style learned domain-mixture weights. */
class DomainMixtureSpec extends SparkSpecBase {
  import spark.implicits._

  private def traj = SparkEntry.queries("x126_doremi_mix_weights")(
    spark, sfDir)

  test("trajectory shape: (iters+1) x domains rows, uniform start") {
    val rows = traj.orderBy("iter", "dom").collect()
    assert(rows.length === 6 * 5)
    val it0 = rows.filter(_.getInt(0) == 0)
    assert(it0.map(_.getString(1)).toSeq === Seq("de", "en", "es", "fr", "zh"))
    assert(it0.forall(_.getLong(2) === 200000L), "iter 0 must be uniform")
  }

  test("EG balancing: the mixture moves toward high-loss domains and shrinks the spread") {
    val rows = traj.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val first = rows.filter(_._1 == 0)
    val last = rows.filter(_._1 == 5)
    def spread(rs: Array[(Int, String, Long, Long)]): Long =
      rs.map(_._4).max - rs.map(_._4).min
    assert(spread(last) < spread(first),
      s"loss spread must shrink: ${spread(first)} -> ${spread(last)}")
    val worst0 = first.maxBy(_._4)._2
    val w0 = first.find(_._2 == worst0).get._3
    val w5 = last.find(_._2 == worst0).get._3
    assert(w5 > w0, s"worst domain $worst0 must gain weight: $w0 -> $w5")
    // and somebody paid for it — the simplex is zero-sum
    assert(last.exists(r => r._3 < first.find(_._2 == r._2).get._3))
  }

  test("x126g gate: empty on the real trajectory, clauses fire on tampered ones") {
    assert(SparkEntry.queries("x126g_mix_gate")(spark, sfDir).count() === 0)
    // flat losses (spread cannot shrink) -> balance fires
    val flat = Seq(
      (0, "a", 500000L, 100L), (0, "b", 500000L, 200L),
      (1, "a", 500000L, 100L), (1, "b", 500000L, 200L))
      .toDF("iter", "dom", "w_micro", "loss_micro")
    val fl = DomainMixture.gateRows(spark, flat).collect().map(_.getString(0))
    assert(fl.contains("balance"), fl.toSeq)
    assert(fl.contains("direction"), fl.toSeq)
    // broken simplex -> simplex fires
    val broken = Seq((0, "a", 900000L, 100L), (0, "b", 300000L, 200L))
      .toDF("iter", "dom", "w_micro", "loss_micro")
    val br = DomainMixture.gateRows(spark, broken).collect().map(_.getString(0))
    assert(br.exists(_.startsWith("simplex")), br.toSeq)
    // a non-positive weight -> positive fires
    val neg = Seq((0, "a", 1000001L, 100L), (0, "b", -1L, 200L))
      .toDF("iter", "dom", "w_micro", "loss_micro")
    val ng = DomainMixture.gateRows(spark, neg).collect().map(_.getString(0))
    assert(ng.exists(_.startsWith("positive")), ng.toSeq)
  }

  test("x126s: the learned mixture deploys through the hash sampler") {
    assert(SparkEntry.queries("x126sg_mix_sample_gate")(spark, sfDir)
      .count() === 0)
    val sizes = SparkEntry.queries("x126s_mix_sample_sizes")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sizes.map(_._1).toSeq === Seq("de", "en", "es", "fr", "zh"))
    // en is over-represented in the corpus relative to its learned
    // weight, so the sampler must down-sample it below corpus share;
    // the binding (highest w/n) domain keeps everything
    val totN = sizes.map(_._2).sum.toDouble
    val totK = sizes.map(_._3).sum.toDouble
    val en = sizes.find(_._1 == "en").get
    assert(en._3 / totK < en._2 / totN,
      s"en share must fall: kept ${en._3}/$totK vs corpus ${en._2}/$totN")
    assert(sizes.exists { case (_, n, kept) => kept == n },
      "some domain must bind at keep-rate 1")
  }

  test("x126sg clauses fire on tampered sizes") {
    import spark.implicits._
    val w = Map("a" -> 500000L, "b" -> 500000L)
    // kept > n -> bound; shares far from weights -> share; binding kept < n
    val bad = Seq(("a", 100L, 120L), ("b", 100L, 10L))
      .toDF("lang", "n_docs", "kept")
    val viol = DomainMixture.sampleGateRows(spark, bad, w)
      .collect().map(_.getString(0))
    assert(viol.exists(_.startsWith("bound_")), viol.toSeq)
    assert(viol.exists(_.startsWith("share_")), viol.toSeq)
    val notBinding = Seq(("a", 100L, 50L), ("b", 100L, 50L))
      .toDF("lang", "n_docs", "kept")
    val nb = DomainMixture.sampleGateRows(spark, notBinding, w)
      .collect().map(_.getString(0))
    assert(nb.contains("binding"), nb.toSeq)
  }

  test("determinism: two trajectories are identical") {
    val docs = Tables(spark, sfDir, "documents")
    val a = DomainMixture.egMixture(docs, "text", "lang",
      DomainMixture.Doms, iters = 2, eta = DomainMixture.Eta)
    val b = DomainMixture.egMixture(docs, "text", "lang",
      DomainMixture.Doms, iters = 2, eta = DomainMixture.Eta)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("held-out ctx counts come from ALL train tokens, not just bigram starters") {
    // "q" appears in train only DOCUMENT-FINALLY (it starts no train
    // bigram), so countTable's cb join-keyed-on-cu inner join drops its
    // row — but the eval bigram "q r" must still see cu(q)=1 in its
    // denominator, matching the x126h oracle's uni join over all train
    // tokens. With one domain at weight U and v=2 distinct train
    // tokens:  t = ln((0+U)/(1·U + 2·U)) = ln(1/3) nats
    //            -> loss = 1098612 micro-nats.
    // A ctx built from the joined count table would miss cu(q) and
    // yield ln(1/2) -> 693147 instead.
    val train = Seq(("d1", "a", "w q")).toDF("id", "dom", "text")
    val eval = Seq(("e1", "a", "q r")).toDF("id", "dom", "text")
    val rows = DomainMixture.heldOutLossRows(
      train, eval, "text", "dom", Seq("a"), Seq(1000000L))
    assert(rows === Seq(("a", 1L, 1098612L)), s"got $rows")
  }

  test("x126a: held-out advantage gate empty on the real run; force-baseline fires it") {
    val real = DomainMixture.advantageRows(spark, sfDir, forceBaseline = false)
    val rows = real.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.isEmpty, s"gate violated: ${rows.mkString("; ")}")
    // the spec hook: a "learned" side with no edge (uniform weights on
    // both sides) must trip exactly the advantage clause — coverage and
    // heterogeneity still hold, so the fixture premise clauses stay out
    val forced = DomainMixture.advantageRows(spark, sfDir, forceBaseline = true)
      .select("clause").collect().map(_.getString(0)).toSeq
    assert(forced === Seq("worst_advantage"), s"got $forced")
  }
}
