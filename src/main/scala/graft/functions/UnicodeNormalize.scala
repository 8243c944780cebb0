package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the corpus-canonicalization step a web-scale text pipeline runs
  * before hashing or dedup: composed vs decomposed accents (é vs
  * e+U+0301) and compatibility forms (ﬁ vs fi under NFKC) must not
  * make equal text hash differently.
  *
  * The hot path is `Normalizer.isNormalized` first: web corpora are
  * overwhelmingly already-NFC (pure ASCII trivially so), and the check
  * is a scan without allocation — only the rare denormalized string
  * pays the rewrite. Both eval paths (codegen + interpreted) share
  * that shape.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unsupported normalization form: $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize requires a string argument, got ${child.dataType}")

  private def normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.$form)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_unicode_normalize"
}
