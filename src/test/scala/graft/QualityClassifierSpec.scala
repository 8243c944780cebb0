package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationQueries, QualityClassifier, TextAnalysis}

/** x118 family: in-engine trained quality classifier. */
class QualityClassifierSpec extends SparkSpecBase {

  private def docs = Tables(spark, sfDir, "documents")

  test("labeled frame features match the shared x09 surface and the label matches x49 pass") {
    // the micro-int surface must be the EXACT x65/x49 relations (drift
    // here silently breaks the oracle): re-derive both from the shared
    // builders and anti-join
    val aug = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 7 === 0, lit(" ### #! ##")).otherwise(lit("")))
        .as("t"))
    val expect = TextAnalysis.qualityFeatures(aug, "doc_id", "t")
      .select(col("doc_id"),
        round(col("quality") * 1e6).cast("long").as("fq"),
        round(col("stopword_ratio") * 1e6).cast("long").as("fs"),
        round(col("punct_ratio") * 1e6).cast("long").as("fp"),
        (least(col("n_tokens"), lit(200)).cast("long") * lit(5000L)).as("fn"))
      .join(CurationQueries.gopherRules(
          CurationQueries.gopherStats(aug, "doc_id", "t"))
        .select(col("doc_id"), col("pass").cast("long").as("y")), Seq("doc_id"))
    val got = QualityClassifier.labeledFrame(docs, "doc_id", "text")
    assert(got.join(expect,
      Seq("doc_id", "fq", "fs", "fp", "fn", "y"), "left_anti").count() === 0)
    assert(got.count() === expect.count())
    // both classes present on the train split, or the fixture is dead
    val y = got.select(col("y")).distinct().collect().map(_.getLong(0)).toSet
    assert(y === Set(0L, 1L), s"degenerate label fixture: $y")
  }

  test("distributed GD trajectory matches an independent driver-side replay") {
    val lf = QualityClassifier.labeledFrame(docs, "doc_id", "text")
    val train = lf.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) <= "cb")
    val tr = QualityClassifier.fit(train)
    // independent reference: collect the raw micro features and run the
    // whole pipeline (scaler + standardize + 16 GD steps) in plain
    // Scala — not through any QualityClassifier arithmetic
    val rows = train.select("fq", "fs", "fp", "fn", "y").collect()
      .map(r => (Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)),
        r.getLong(4)))
    val n = rows.length
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val means = (0 until 4).map { j =>
      rnd(rows.map(_._1(j)).sum.toDouble / n)
    }
    val stds = (0 until 4).map { j =>
      val s1 = rows.map(_._1(j)).sum.toDouble
      val s2 = rows.map(r => r._1(j) * r._1(j)).sum.toDouble
      val m = s1 / n
      val s = math.max(rnd(math.sqrt(math.max(s2 / n - m * m, 0.0))), 1L)
      if (s < 1L) 1000000L else s
    }
    val std = rows.map { case (f, y) =>
      ((0 until 4).map(j =>
        rnd((f(j) - means(j)) * 1000000.0 / stds(j))).toArray, y)
    }
    var w = Array.fill(5)(0L)
    val traj = scala.collection.mutable.ArrayBuffer(w.clone())
    (1 to QualityClassifier.Iters).foreach { _ =>
      val g = Array.fill(5)(0L)
      std.foreach { case (f, y) =>
        val zp = w(0) * 1000000L + (0 until 4).map(j => w(j + 1) * f(j)).sum
        val z = zp.toDouble / 1.0e12
        val p6 = rnd(1000000.0 / (1.0 + math.exp(-z)))
        val e = p6 - y * 1000000L
        g(0) += e * 1000000L
        (0 until 4).foreach(j => g(j + 1) += e * f(j))
      }
      w = w.clone()
      (0 until 5).foreach(j => w(j) -= rnd(g(j).toDouble / (n * 1000000.0)))
      traj += w.clone()
    }
    assert(tr.trajectory.size === traj.size)
    tr.trajectory.zip(traj).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.toSeq === b.toSeq, s"trajectory diverges at iteration $i")
    }
  }

  test("x118g: monotone-loss gate is empty on the real run, fires on gradient ascent") {
    val lf = QualityClassifier.labeledFrame(docs, "doc_id", "text")
    val train = lf.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) <= "cb")
    val good = QualityClassifier.fit(train)
    assert(QualityClassifier.gateRows(spark, good).count() === 0)
    assert(good.losses.size === QualityClassifier.Iters + 1)
    // tamper hook: ASCENT (lrNum = -1) must rise the loss and trip both
    // the monotonicity and the net-improvement clauses
    val bad = QualityClassifier.fit(train, lrNum = -1L)
    val viol = QualityClassifier.gateRows(spark, bad)
      .collect().map(_.getString(0))
    assert(viol.nonEmpty, "ascent run produced no violations — gate is dead")
    assert(viol.contains("improved"), s"net-improvement clause silent: ${viol.toSeq}")
  }

  test("x118a: advantage gate empty for the trained scorer, fires under force-fixed") {
    assert(QualityClassifier
      .advantageRows(spark, sfDir, forceFixed = false).count() === 0)
    // identical scorers have identical AUC — the strict clause must fire
    val forced = QualityClassifier
      .advantageRows(spark, sfDir, forceFixed = true).collect()
    assert(forced.nonEmpty, "force-fixed produced no violation — gate is dead")
  }

  test("x118s scores are valid micro probabilities over exactly the held-out split") {
    val scores = SparkEntry.queries("x118s_quality_lr_scores")(spark, sfDir)
    val heldN = docs.filter(
      substring(md5(col("doc_id").cast("string")), 1, 2) > "e5").count()
    assert(scores.count() === heldN)
    assert(scores.filter(col("score_micro") < 0 ||
      col("score_micro") > 1000000L).count() === 0)
  }

  test("exact rank-sum AUC agrees with a naive pairwise count") {
    import spark.implicits._
    val scored = Seq(
      (1L, 1L, 900000L), (2L, 1L, 700000L), (3L, 0L, 700000L),
      (4L, 0L, 300000L), (5L, 1L, 100000L), (6L, 0L, 100000L))
      .toDF("id", "y", "p6")
    val (num2, pos, neg) = QualityClassifier.aucNum2(scored)
    // pairwise: wins + ties/2 over pos*neg pairs
    val rows = scored.select("p6", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ps = rows.filter(_._2 == 1L).map(_._1)
    val ns = rows.filter(_._2 == 0L).map(_._1)
    val wins = (for (p <- ps; q <- ns) yield
      if (p > q) 2L else if (p == q) 1L else 0L).sum
    // AUC = (num2 - pos(pos+1)) / (2 pos neg) must equal wins / (2 pos neg)
    assert(num2 - pos * (pos + 1) === wins)
    assert(pos === 3L && neg === 3L)
  }
}
