package graft

import org.apache.spark.sql.functions._
import graft.operators.EncodingRepair

/** Mojibake detect + repair (x107 family): roundtrip exactness on
  * multi-width UTF-8, strict-grammar refusals (overlongs, surrogates,
  * stray lead bytes), the declared query's planted/clean split, and
  * per-clause gate sensitivity via the tamper hooks.
  */
class EncodingRepairSpec extends SparkSpecBase {
  import spark.implicits._

  /** Run the engine's detect+repair on one driver string. */
  private def runOne(s: String): (Int, Boolean, String) = {
    val df = Seq(s).toDF("s").select(
      EncodingRepair.mojiScore(col("s")).as("score"),
      EncodingRepair.mojiFlag(col("s")).as("flag"),
      EncodingRepair.fixedText(col("s")).as("fixed"))
    val r = df.head()
    (r.getInt(0), r.getBoolean(1), r.getString(2))
  }

  test("corrupt then repair restores 2-, 3-, and 4-byte UTF-8 exactly") {
    val torture = Seq(
      "caf\u00e9 na\u00efve stra\u00dfe", // 2-byte
      "em\u2014dash \u20ac euro",         // 3-byte
      "smile \ud83d\ude42 ok",       // 4-byte (U+1F642, a surrogate pair)
      "\u03b1\u03b2\u03b3 \u4e2d\u6587 mixed ascii tail")
    torture.foreach { orig =>
      val moji = EncodingRepair.mojibake(orig)
      assert(moji !== orig, s"corruption must change: $orig")
      val (score, flag, fixed) = runOne(moji)
      assert(score >= 1, s"must detect groups in ${moji}")
      assert(flag, s"must be repairable: $moji")
      assert(fixed === orig, s"roundtrip must restore '$orig', got '$fixed'")
    }
  }

  test("clean ASCII passes through unflagged and untouched") {
    val (score, flag, fixed) = runOne("plain ascii text, no mojibake here!")
    assert(score === 0 && !flag)
    assert(fixed === "plain ascii text, no mojibake here!")
  }

  test("strict grammar refuses overlongs, surrogates, and stray lead bytes") {
    // overlong 3-byte (E0 80 80), UTF-16 surrogate bytes (ED A0 80),
    // and a valid group followed by a lone lead byte
    val refusals = Seq(
      "x\u00e0\u0080\u0080y",
      "x\u00ed\u00a0\u0080y",
      EncodingRepair.mojibake("\u00e9") + "\u00c3!")
    refusals.foreach { s =>
      val (_, flag, fixed) = runOne(s)
      assert(!flag, s"must refuse: ${s.map(_.toInt.toHexString)}")
      assert(fixed === s, "refused input must pass through unchanged")
    }
    // real Latin-1 text (\u00e9 followed by a space) is NOT valid UTF-8 bytes:
    // must be left alone, not "repaired" into garbage
    val latin1 = "caf\u00e9 au lait"
    val (_, flag, fixed) = runOne(latin1)
    assert(!flag && fixed === latin1)
  }

  test("declared x107: planted docs repaired, clean docs untouched") {
    val out = SparkEntry.queries("x107_mojibake_repair")(spark, sfDir)
      .localCheckpoint(true)
    try {
      val planted = out.filter(col("doc_id") % 13 === 0)
      val clean = out.filter(col("doc_id") % 13 =!= 0)
      assert(planted.count() > 0 && clean.count() > 0)
      assert(planted.filter(!col("is_moji")).count() === 0,
        "every planted doc must be flagged")
      assert(planted.filter(!col("fixed_text").endsWith(EncodingRepair.plantedPhrase))
        .count() === 0, "repair must restore the planted phrase")
      // repair shrinks: multi-byte groups collapse to single chars
      assert(planted.filter(col("n_fixed") >= col("n_in")).count() === 0)
      assert(clean.filter(col("is_moji") || col("moji_score") =!= 0 ||
        col("n_c1") =!= 0).count() === 0, "clean docs must score 0")
      assert(clean.filter(col("n_fixed") =!= col("n_in")).count() === 0)
    } finally CheckpointBlocks.release(out)
  }

  test("x107g gate is empty and every clause fires under its tamper") {
    assert(SparkEntry.queries("x107g_mojibake_gate")(spark, sfDir).count() === 0)
    val rt = EncodingRepair.gateViolations(spark, sfDir, doubleCorrupt = true)
      .groupBy(col("clause")).count().as[(String, Long)].collect().toMap
    assert(rt.keySet === Set("roundtrip"), s"doubleCorrupt must fire only roundtrip: $rt")
    val cl = EncodingRepair.gateViolations(spark, sfDir, detectAlways = true)
      .groupBy(col("clause")).count().as[(String, Long)].collect().toMap
    assert(cl.keySet === Set("clean"), s"detectAlways must fire only clean: $cl")
    val gd = EncodingRepair.gateViolations(spark, sfDir, guardOff = true)
      .groupBy(col("clause")).count().as[(String, Long)].collect().toMap
    assert(gd.keySet === Set("guard"), s"guardOff must fire only guard: $gd")
  }
}
