package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of common elements between two ASCENDING-sorted array<bigint>
  * columns (set semantics on sorted-distinct inputs), as a two-pointer
  * merge inside whole-stage codegen.
  *
  * This is the exact-Jaccard verification kernel: candidate pairs carry
  * each side's sorted shingle-hash array, and |A ∩ B| falls out of one
  * linear pass — no re-join of the corpus-wide shingle relation per
  * candidate, no per-row hash-set allocation (array_intersect builds an
  * OpenHashSet per invocation and materializes the intersection array
  * when only its SIZE is needed).
  *
  * Inputs must be sorted ascending (sort_array(collect_list(...)) — the
  * producer in Dedup.docShingleArrays). On duplicate elements the count
  * advances both cursors per match, i.e. multiset-min semantics, which
  * equals set intersection on the distinct inputs the dedup path builds.
  * A null array or null element yields null, never a partial count that
  * could clear a similarity threshold.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires array<bigint> args, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  private def mayHoldNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (mayHoldNulls) {
      var j = 0
      while (j < nx) { if (x.isNullAt(j)) return null; j += 1 }
      j = 0
      while (j < ny) { if (y.isNullAt(j)) return null; j += 1 }
    }
    var i = 0
    var k = 0
    var c = 0L
    while (i < nx && k < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(k)
      if (xv == yv) { c += 1L; i += 1; k += 1 }
      else if (xv < yv) i += 1
      else k += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      // element null checks only when the input type admits them — the
      // sort_array(collect_list(...)) producer never does, keeping the
      // hot loop branch-free (the VecDot convention)
      val nullGuard =
        if (mayHoldNulls) {
          val j = ctx.freshName("j")
          s"""
             |for (int $j = 0; $j < $nx && !${ev.isNull}; $j++)
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;
             |for (int $j = 0; $j < $ny && !${ev.isNull}; $j++)
             |  if ($b.isNullAt($j)) ${ev.isNull} = true;
           """.stripMargin
        } else ""
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |$nullGuard
         |if (!${ev.isNull}) {
         |  int $i = 0; int $k = 0; long $c = 0L;
         |  while ($i < $nx && $k < $ny) {
         |    long $xv = $a.getLong($i);
         |    long $yv = $b.getLong($k);
         |    if ($xv == $yv) { $c++; $i++; $k++; }
         |    else if ($xv < $yv) { $i++; } else { $k++; }
         |  }
         |  ${ev.value} = $c;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}
