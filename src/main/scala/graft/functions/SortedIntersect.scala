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

/** The common ELEMENTS of two ASCENDING-sorted array<bigint> columns,
  * as a two-pointer merge — the sibling of [[SortedLongIntersectCount]]
  * for consumers that need the members, not just the size (per-node
  * triangle attribution explodes them). No per-row hash set, no boxing:
  * `array_intersect` allocates an OpenHashSet per invocation, which on
  * a million-edge adjacency join is pure GC churn. Inputs must be
  * sorted ascending and duplicate-free (sort_array(collect_list(...))
  * over a distinct producer); nulls (array or element) yield null.
  */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect requires array<bigint> args, got " +
          s"${left.dataType} / ${right.dataType}")
  }

  private def mayHoldNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (mayHoldNulls) {
      var j = 0
      val nx = x.numElements()
      while (j < nx) { if (x.isNullAt(j)) return null; j += 1 }
      j = 0
      val ny = y.numElements()
      while (j < ny) { if (y.isNullAt(j)) return null; j += 1 }
    }
    SortedIntersectKernel.intersect(x, y)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nullGuard =
        if (mayHoldNulls) {
          val j = ctx.freshName("j")
          s"""
             |for (int $j = 0; $j < $a.numElements() && !${ev.isNull}; $j++)
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;
             |for (int $j = 0; $j < $b.numElements() && !${ev.isNull}; $j++)
             |  if ($b.isNullAt($j)) ${ev.isNull} = true;
           """.stripMargin
        } else ""
      s"""
         |$nullGuard
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.SortedIntersectKernel.intersect($a, $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect"
}

/** Shared kernel for [[SortedLongIntersectCountAtLeast]] — a plain
  * object so whole-stage codegen can call it through the static
  * forwarder (`SortedIntersectKernel.countAtLeast(...)` is valid Java).
  */
object SortedIntersectKernel {

  /** Intersection elements of two sorted-ascending long arrays, as
    * ArrayData (packed primitives, no boxing). Callable from generated
    * Java (the [[SortedLongIntersect]] codegen).
    */
  def intersect(x: ArrayData, y: ArrayData): ArrayData = {
    val nx = x.numElements()
    val ny = y.numElements()
    val buf = new Array[Long](math.min(nx, ny))
    var i = 0
    var k = 0
    var c = 0
    while (i < nx && k < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(k)
      if (xv == yv) { buf(c) = xv; c += 1; i += 1; k += 1 }
      else if (xv < yv) i += 1
      else k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOfRange(buf, 0, c))
  }

  /** Exact |A ∩ B| if it reaches `minReq`, else -1 — the PPJoin+
    * suffix-filter contract (Xiao et al., WWW'08 §4) adapted to
    * value-sorted arrays: before paying the O(|A|+|B|) merge, a
    * depth-limited divide-and-conquer probe (pivot on A's median,
    * binary-search it in B, recurse on both halves) upper-bounds the
    * overlap in O(2^depth · log) — candidates that cannot reach minReq
    * are dismissed without scanning. The merge itself then bails the
    * moment count + min(remaining) drops below minReq. Callers filter
    * survivors on the exact threshold afterwards, so a -1 can never
    * change the result set — only skip work that was doomed.
    */
  def countAtLeast(x: ArrayData, y: ArrayData, minReq: Long): Long = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (math.min(nx, ny) < minReq) return -1L
    if (minReq > 1 && upperBound(x, 0, nx, y, 0, ny, 2) < minReq) return -1L
    var i = 0
    var k = 0
    var c = 0L
    while (i < nx && k < ny) {
      if (c + math.min(nx - i, ny - k) < minReq) return -1L
      val xv = x.getLong(i)
      val yv = y.getLong(k)
      if (xv == yv) { c += 1L; i += 1; k += 1 }
      else if (xv < yv) i += 1
      else k += 1
    }
    if (c >= minReq) c else -1L
  }

  /** Overlap upper bound of x[xl,xh) vs y[yl,yh), both sorted asc. */
  private def upperBound(x: ArrayData, xl: Int, xh: Int,
                         y: ArrayData, yl: Int, yh: Int, depth: Int): Long = {
    val lx = xh - xl
    val ly = yh - yl
    if (lx == 0 || ly == 0) 0L
    else if (depth == 0) math.min(lx, ly).toLong
    else {
      val mid = xl + lx / 2
      val pivot = x.getLong(mid)
      var lo = yl
      var hi = yh
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (y.getLong(m) < pivot) lo = m + 1 else hi = m
      }
      val found = lo < yh && y.getLong(lo) == pivot
      upperBound(x, xl, mid, y, yl, lo, depth - 1) +
        (if (found) 1L else 0L) +
        upperBound(x, mid + 1, xh, y, if (found) lo + 1 else lo, yh, depth - 1)
    }
  }
}

/** [[SortedLongIntersectCount]] with a required minimum: returns the
  * exact count when it is >= `minRequired`, -1 otherwise (see
  * [[SortedIntersectKernel.countAtLeast]]). The third child must be a
  * bigint expression; null arrays/elements yield null.
  */
case class SortedLongIntersectCountAtLeast(first: Expression,
    second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(first.dataType) && ok(second.dataType) && third.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count_at_least requires (array<bigint>, " +
          s"array<bigint>, bigint), got ${first.dataType} / " +
          s"${second.dataType} / ${third.dataType}")
  }

  private def mayHoldNulls: Boolean =
    first.dataType.asInstanceOf[ArrayType].containsNull ||
      second.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, m: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (mayHoldNulls) {
      var j = 0
      val nx = x.numElements()
      while (j < nx) { if (x.isNullAt(j)) return null; j += 1 }
      j = 0
      val ny = y.numElements()
      while (j < ny) { if (y.isNullAt(j)) return null; j += 1 }
    }
    SortedIntersectKernel.countAtLeast(x, y, m.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) => {
      val nullGuard =
        if (mayHoldNulls) {
          val j = ctx.freshName("j")
          s"""
             |for (int $j = 0; $j < $a.numElements() && !${ev.isNull}; $j++)
             |  if ($a.isNullAt($j)) ${ev.isNull} = true;
             |for (int $j = 0; $j < $b.numElements() && !${ev.isNull}; $j++)
             |  if ($b.isNullAt($j)) ${ev.isNull} = true;
           """.stripMargin
        } else ""
      s"""
         |$nullGuard
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.SortedIntersectKernel.countAtLeast($a, $b, $m);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedLongIntersectCountAtLeast =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_sorted_intersect_count_at_least"
}
