package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GraftExtensions, UnicodeNormalize}

/** The corpus-canonicalization expression: composed/decomposed accents
  * and compatibility forms, both execution paths, policy errors.
  */
class UnicodeNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def viaDf(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(GraftExtensions.unicodeNormalize(col("t"), form))
      .collect()(0).getString(0)

  private def viaEval(s: String, form: String): String =
    UnicodeNormalize(Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType), form)
      .eval(null).asInstanceOf[UTF8String].toString

  test("NFC composes decomposed accents on both paths") {
    val decomposed = "cafe\u0301"
    assert(viaDf(decomposed, "NFC") === "caf\u00e9")
    assert(viaEval(decomposed, "NFC") === "caf\u00e9")
  }

  test("NFD decomposes; NFC round-trips back") {
    assert(viaDf("caf\u00e9", "NFD") === "cafe\u0301")
    assert(viaDf(viaDf("caf\u00e9", "NFD"), "NFC") === "caf\u00e9")
  }

  test("NFKC folds compatibility forms (ligature, fullwidth)") {
    assert(viaDf("ﬁle", "NFKC") === "file")
    assert(viaDf("ＡＢ", "NFKC") === "AB")
    // NFC leaves compatibility forms alone
    assert(viaDf("ﬁle", "NFC") === "ﬁle")
  }

  test("already-normalized ASCII passes through unchanged (fast path)") {
    val s = "plain ascii text 123"
    assert(viaDf(s, "NFC") === s)
    assert(viaEval(s, "NFC") === s)
  }

  test("null input yields null; hash-equality after normalization") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(GraftExtensions.unicodeNormalize(col("t"), "NFC"))
      .collect()(0)
    assert(r.isNullAt(0))
    // the dedup motivation: equal text, different encodings, one hash
    val hashes = Seq("caf\u00e9", "cafe\u0301").toDF("t")
      .select(md5(GraftExtensions.unicodeNormalize(col("t"), "NFC")))
      .as[String].collect().toSet
    assert(hashes.size === 1)
  }

  test("an unsupported form is rejected at construction") {
    intercept[IllegalArgumentException] {
      UnicodeNormalize(Literal(UTF8String.fromString("x"),
        org.apache.spark.sql.types.StringType), "NFX")
    }
  }
}
