package graft

import graft.operators.Pq

/** x121: the PQ (M, Ks) distortion/size/recall operating curve. */
class PqCurveSpec extends SparkSpecBase {

  test("curve shape: 6 cells, error falls with bits, gate empty") {
    val df = SparkEntry.queries("x121_pq_mks_curve")(spark, sfDir)
    val rows = df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length === 6)
    assert(rows.map(r => (r._1, r._2)).toSet ===
      (for (m <- Seq(2, 4, 8); ks <- Seq(16, 256)) yield (m, ks)).toSet)
    // code bits = m * log2(ks)
    rows.foreach { case (m, ks, bits, _, _) =>
      assert(bits === m * (if (ks == 16) 4 else 8))
    }
    // the two monotone directions the gate pins
    val cell = rows.map(r => ((r._1, r._2), r._4)).toMap
    assert(cell((8, 16)) <= cell((4, 16)) && cell((4, 16)) <= cell((2, 16)))
    assert(cell((8, 256)) <= cell((2, 256)))
    assert(cell((2, 256)) <= cell((2, 16)) && cell((8, 256)) <= cell((8, 16)))
    assert(SparkEntry.queries("x121g_pq_mks_gate")(spark, sfDir).count() === 0)
  }

  test("x121g clauses fire on a tampered curve") {
    // error RISING in Ks at fixed M, a bits lie, and an out-of-range recall
    val bad = Seq(
      (2, 16, 8, 0.1, 0.5), (2, 256, 16, 0.2, 0.6),
      (4, 16, 16, 0.05, 1.2), (4, 256, 31, 0.04, 0.9),
      (8, 16, 32, 0.03, 0.9), (8, 256, 64, 0.01, 0.95))
    val viol = Pq.mksGateRows(spark, bad).collect().map(_.getString(0))
    assert(viol.exists(_.startsWith("err_ks_")), s"got ${viol.toSeq}")
    assert(viol.contains("bits_4_256"), s"got ${viol.toSeq}")
    assert(viol.contains("recall_range_4_16"), s"got ${viol.toSeq}")
  }
}
