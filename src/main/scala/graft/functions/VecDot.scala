package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.call_function

/** Native dot product over array<float>/array<double> columns.
  *
  * The pure-HOF formulation (zip_with + aggregate) allocates an
  * intermediate array and boxes per element — measured ~50x slower on
  * 64-dim embeddings at pairwise scale. This expression compiles to a
  * tight primitive loop inside whole-stage codegen, which is what makes
  * brute-force / LSH similarity search viable at 100 TB (SURVEY §7.4:
  * custom Expression preferred over UDF for hot paths).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires array<float|double> args, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHoldNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  // null OUTPUT for mismatched dimensions or null elements — matching
  // the zip_with+aggregate formulation this expression replaces, where
  // a truncated dot product would be a plausible-looking WRONG score
  // that can clear a similarity threshold
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    if (mayHoldNulls) {
      var j = 0
      while (j < n) {
        if (x.isNullAt(j) || y.isNullAt(j)) return null
        j += 1
      }
    }
    var s = 0.0
    var i = 0
    if (isFloat(left) && isFloat(right)) {
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else if (isFloat(left)) {
      while (i < n) { s += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
    } else if (isFloat(right)) {
      while (i < n) { s += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      if (isFloat(e)) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // the per-element null check is emitted ONLY when the input type
      // admits nulls — the common non-null embedding path keeps the
      // tight branch-free loop
      val nullGuard =
        if (mayHoldNulls)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $s += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_vec_dot"
}

/** Session-extension entry point: registers graft's native functions.
  * Load via `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_vec_dot takes exactly 2 arguments")
      VecDot(args(0), args(1))
    })

  // Spark ships a production Bloom filter pair for its runtime-filter
  // rewrite (BloomFilterAggregate / BloomFilterMightContain) but does
  // NOT register them as SQL-callable functions — surface the existing
  // battle-tested implementation through the public extensions API
  // instead of re-implementing a sketch.
  private val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_bloom_agg(value, estimatedItems, numBits) takes exactly 3 arguments")
      org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2), 0, 0)
    })

  private val mightContainDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_might_contain"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_might_contain"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_might_contain(bloom, value) takes exactly 2 arguments")
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))
    })

  private val sortedIntersectDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedLongIntersectCount].getName,
      "graft_sorted_intersect_count"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_sorted_intersect_count takes exactly 2 arguments")
      SortedLongIntersectCount(args(0), args(1))
    })

  private val unicodeNormalizeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_unicode_normalize"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName,
      "graft_unicode_normalize"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_unicode_normalize(str, form) takes exactly 2 arguments")
      val form = args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
          v.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal, got $other")
      }
      UnicodeNormalize(args(0), form)
    })

  private val hilbertDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_hilbert"),
    new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_hilbert takes exactly 2 arguments")
      HilbertIndex(args(0), args(1))
    })

  private val sortedIntersectArrayDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect"),
    new ExpressionInfo(classOf[SortedLongIntersect].getName,
      "graft_sorted_intersect"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_sorted_intersect takes exactly 2 arguments")
      SortedLongIntersect(args(0), args(1))
    })

  private val sortedIntersectAtLeastDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_sorted_intersect_count_at_least"),
    new ExpressionInfo(classOf[SortedLongIntersectCountAtLeast].getName,
      "graft_sorted_intersect_count_at_least"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_sorted_intersect_count_at_least takes exactly 3 arguments")
      SortedLongIntersectCountAtLeast(args(0), args(1), args(2))
    })

  private val pqNearestDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_pq_nearest"),
    new ExpressionInfo(classOf[PqNearestCode].getName, "graft_pq_nearest"),
    (args: Seq[Expression]) => {
      require(args.length == 3,
        "graft_pq_nearest(m, sv, codebookLiteral) takes exactly 3 arguments")
      val nested = args(2) match {
        case Literal(v, _) if v != null =>
          v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        case other => throw new IllegalArgumentException(
          s"codebook must be a nested array literal, got $other")
      }
      val cb: Array[Array[Array[Double]]] = nested.array.map { perM =>
        perM.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .array.map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            .toDoubleArray())
      }
      // cn2 by the SAME left-to-right fold Pq.train's toDf uses, so
      // d2 values are bit-identical to the join formulation's
      val cn2: Array[Array[Double]] =
        cb.map(_.map(cv => cv.map(x => x * x).sum))
      PqNearestCode(args(0), args(1), cb, cn2,
        "cb" + java.util.Arrays.deepHashCode(
          cb.asInstanceOf[Array[AnyRef]]).toHexString)
    })

  private[functions] val descriptors =
    Seq(vecDotDescriptor, bloomAggDescriptor, mightContainDescriptor,
      sortedIntersectDescriptor, sortedIntersectArrayDescriptor,
      sortedIntersectAtLeastDescriptor,
      unicodeNormalizeDescriptor, hilbertDescriptor, pqNearestDescriptor)

  /** Idempotent registration on a live session (for sessions not built
    * with spark.sql.extensions).
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Column-level API once registered. */
  def vecDot(a: Column, b: Column): Column = call_function("graft_vec_dot", a, b)

  def hilbert(x: Column, y: Column): Column =
    call_function("graft_hilbert", x.cast("long"), y.cast("long"))

  def bloomAgg(value: Column, estimatedItems: Column, numBits: Column): Column =
    call_function("graft_bloom_agg", value, estimatedItems, numBits)

  def mightContain(bloom: Column, value: Column): Column =
    call_function("graft_might_contain", bloom, value)

  def sortedIntersectCount(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)

  def sortedIntersect(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect", a, b)

  def sortedIntersectCountAtLeast(a: Column, b: Column, minRequired: Column): Column =
    call_function("graft_sorted_intersect_count_at_least", a, b,
      minRequired.cast("long"))

  def unicodeNormalize(s: Column, form: String): Column =
    call_function("graft_unicode_normalize", s,
      org.apache.spark.sql.functions.lit(form))

  /** Nearest-code argmin against a driver-state codebook map keyed
    * (m, code), codes 1..Ks per subspace 1..M (Pq.PqCodebook.asMap's
    * shape). The map rides the plan as one nested literal the builder
    * unpacks into primitive arrays.
    */
  def pqNearestCode(m: Column, sv: Column,
                    cbMap: Map[(Int, Int), IndexedSeq[Double]]): Column = {
    val ms = cbMap.keySet.map(_._1)
    val cs = cbMap.keySet.map(_._2)
    require(ms == (1 to ms.max).toSet && cs == (1 to cs.max).toSet,
      "codebook must cover (1..M) x (1..Ks)")
    val nested: Seq[Seq[Seq[Double]]] =
      (1 to ms.max).map(mm => (1 to cs.max).map(c => cbMap((mm, c)).toSeq))
    call_function("graft_pq_nearest", m, sv,
      org.apache.spark.sql.functions.typedlit(nested))
  }
}
