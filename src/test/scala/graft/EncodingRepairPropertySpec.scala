package graft

import org.scalacheck.{Gen, rng}
import org.apache.spark.sql.functions._
import graft.operators.EncodingRepair

/** Property-based roundtrip for the mojibake repair, through the ENGINE
  * path (the Catalyst expressions, not driver string code): for any
  * generated unicode text, corrupt-then-detect-then-repair restores the
  * original exactly, and clean ASCII text is never touched. Fixed
  * seeds \u2014 deterministic, no flaky CI.
  *
  * The generator mixes ASCII words with code points across every UTF-8
  * width: 2-byte (Latin-1 letters, Greek), 3-byte (CJK, punctuation,
  * currency), 4-byte (emoji, supplementary plane) \u2014 including the
  * boundary code points of each width class (U+0080, U+07FF, U+0800,
  * U+FFFD, U+10000, U+10FFFF).
  */
class EncodingRepairPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val asciiWord: Gen[String] =
    Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)

  // code points by UTF-8 width, with the class boundaries included
  private val nonAscii: Gen[String] = Gen.oneOf(
    Gen.oneOf(0x80, 0xe9, 0xdf, 0x3b1, 0x7ff),          // 2-byte
    Gen.oneOf(0x800, 0x2014, 0x20ac, 0x4e2d, 0xfffd),   // 3-byte
    Gen.oneOf(0x10000, 0x1f642, 0x10ffff)               // 4-byte
  ).map(cp => new String(Character.toChars(cp)))

  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 24)
    parts <- Gen.listOfN(n, Gen.frequency(3 -> asciiWord, 2 -> nonAscii))
  } yield parts.mkString(" ")

  test("engine corrupt -> detect -> repair restores any generated unicode text") {
    val samples = (1L to 40L).map(s =>
      textGen.pureApply(Gen.Parameters.default, rng.Seed(s)))
    // every sample here contains at least the frequency-mixed chance of
    // non-ASCII; keep only those whose corruption CHANGES the string
    // (pure-ASCII samples corrupt to themselves \u2014 covered below)
    val moji = samples.map(EncodingRepair.mojibake)
    val df = moji.toDF("s").select(col("s"),
      EncodingRepair.mojiFlag(col("s")).as("flag"),
      EncodingRepair.fixedText(col("s")).as("fixed"))
    val got = df.collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
    got.zip(samples).foreach { case ((m, flag, fixed), orig) =>
      if (m != orig) {
        assert(flag, s"corrupted text must be detected: ${orig.take(40)}")
        assert(fixed === orig,
          s"roundtrip must restore '${orig.take(40)}', got '${fixed.take(40)}'")
      } else {
        // pure-ASCII sample: corruption is the identity and the engine
        // must leave it alone
        assert(!flag && fixed === orig)
      }
    }
    // the generator must actually have exercised all three widths
    assert(samples.exists(_.exists(_ > 0x7f)), "generator produced no non-ASCII")
    assert(samples.exists(_.codePoints().anyMatch(_ > 0xffff)),
      "generator produced no supplementary-plane code point")
  }

  test("double corruption repairs exactly ONE layer per pass") {
    val orig = "caf\u00e9 \u2014 \ud83d\ude42"
    val twice = EncodingRepair.mojibake(EncodingRepair.mojibake(orig))
    val once = Seq(twice).toDF("s")
      .select(EncodingRepair.fixedText(col("s"))).head().getString(0)
    assert(once === EncodingRepair.mojibake(orig), "one pass peels one layer")
    val again = Seq(once).toDF("s")
      .select(EncodingRepair.fixedText(col("s"))).head().getString(0)
    assert(again === orig, "the second pass restores the original")
  }
}
