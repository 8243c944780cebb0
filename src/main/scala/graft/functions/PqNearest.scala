package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid code for one PQ subvector, as ONE codegen'd loop
  * over a driver-provided codebook instead of a subvector×Ks join.
  *
  * The join formulation materializes |sv|·Ks rows through an exchange
  * and a min(struct) hash aggregate per encoded relation — at encode
  * time that whole blow-up exists only to take a per-row argmin over
  * values that are a pure function of the row and the (driver-state)
  * codebook. This expression computes the same argmin in place:
  * d2(code) = sn2 + cn2(code) − 2·(sv·cvec) with sn2 and the dot
  * accumulated left-to-right exactly as graft_vec_dot does, cn2
  * precomputed by the same left-to-right Scala fold `train` uses, and
  * the (d2, code) minimum taken under java.lang.Double.compare with
  * ties to the smaller code — the exact semantics of
  * `min(struct(d2, code))`. Codes are therefore BIT-IDENTICAL to the
  * join path (no cross-row float accumulation is involved), which is
  * what licenses using it on the encode path while the Lloyd TRAINING
  * aggregation keeps its join: train's member sums are order-sensitive
  * double folds whose layout is frozen.
  *
  * The codebook rides the expression as a reference object (plan-size:
  * M·Ks·ds doubles — parameter-server sized), not a per-row relation.
  */
case class PqNearestCode(m: Expression, sv: Expression,
                         cb: Array[Array[Array[Double]]],
                         cn2: Array[Array[Double]],
                         cbKey: String)
    extends Expression {

  override def children: Seq[Expression] = Seq(m, sv)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = m.nullable || sv.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val svOk = sv.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (m.dataType == IntegerType && svOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_pq_nearest requires (int m, array<double> sv), got " +
          s"${m.dataType} / ${sv.dataType}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val mv = m.eval(input)
    val sve = sv.eval(input)
    if (mv == null || sve == null) return null
    PqNearestCode.nearest(mv.asInstanceOf[Int],
      sve.asInstanceOf[ArrayData], cb, cn2)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][][]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[][]")
    val mCode = m.genCode(ctx)
    val svCode = sv.genCode(ctx)
    ev.copy(code =
      code"""
         |${mCode.code}
         |${svCode.code}
         |boolean ${ev.isNull} = ${mCode.isNull} || ${svCode.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.PqNearestCode.nearest(
         |    ${mCode.value}, ${svCode.value}, $cbRef, $cn2Ref);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqNearestCode =
    copy(m = newChildren(0), sv = newChildren(1))

  // the codebook arrays would make tree-node equality/explain noisy —
  // identify the expression by the caller-supplied key instead
  override def prettyName: String = "graft_pq_nearest"
  override def flatArguments: Iterator[Any] = Iterator(m, sv, cbKey)
  override def stringArgs: Iterator[Any] = Iterator(m, sv, cbKey)
}

object PqNearestCode {
  /** The argmin loop — shared by interpreted eval and codegen (the
    * generated code calls straight into it; the loop body is primitive
    * arithmetic, so the method-call boundary costs nothing next to the
    * join+aggregate it replaces).
    */
  def nearest(m: Int, sv: ArrayData,
              cb: Array[Array[Array[Double]]],
              cn2: Array[Array[Double]]): Int = {
    val cvecs = cb(m - 1)
    val n2 = cn2(m - 1)
    val ds = sv.numElements()
    var sn2 = 0.0
    var i = 0
    while (i < ds) { val x = sv.getDouble(i); sn2 += x * x; i += 1 }
    var bestCode = -1
    var bestD = 0.0
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      var d = 0.0
      var j = 0
      while (j < ds) { d += sv.getDouble(j) * cv(j); j += 1 }
      val d2 = sn2 + n2(c) - 2.0 * d
      if (bestCode < 0 || java.lang.Double.compare(d2, bestD) < 0) {
        bestD = d2
        bestCode = c + 1
      }
      c += 1
    }
    bestCode
  }
}
