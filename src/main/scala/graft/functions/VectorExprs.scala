package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst dot-product expression over `array<float>` /
  * `array<double>` columns.
  *
  * Why a custom expression (SURVEY §7.3's one sanctioned escape hatch):
  * the HOF formulation (`aggregate(zip_with(...))`) allocates a zipped
  * array and evaluates two lambdas per element — measured ~6× slower on
  * the 64-dim embedding corpus. This expression is a single fused loop,
  * participates in whole-stage codegen via `doGenCode`, and keeps the
  * exact same left-to-right double-precision fold semantics (so results
  * stay bit-identical with the HOF version and the DuckDB oracle).
  *
  * Length-mismatch contract: returns NULL, exactly like the HOF spelling
  * — `zip_with` null-pads the shorter array, `x * null` is null, and
  * `acc + null` poisons the fold. A stock session running the documented
  * fallback therefore agrees with the extension on every input.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      case _ =>
        while (i < n) {
          val xv = if (elemType(left) == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
          val yv = if (elemType(right) == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
          acc += xv * yv; i += 1
        }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, v: String, i: String): String = elemType(e) match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  double acc = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    acc += ${getter(left, a, "i")} * ${getter(right, b, "i")};
         |  }
         |  ${ev.value} = acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[DotProduct]]'s integer sibling for quantized (int8-in-int32) vector
  * scans: a fused `long`-accumulator loop over two `array<int>` columns.
  *
  * The non-native spelling this replaces (kept for reference — it is the
  * exact fold this expression fuses, and stays the fallback on a stock
  * session without GraftExtensions):
  * {{{
  *   aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
  *     lit(0L), (acc, v) => acc + v)
  * }}}
  * The HOF form allocates the zipped array and runs two lambda
  * interpreters per element; this is one codegen'd loop — the constant
  * that dominates a quantized ANN scan, where integer dot products ARE
  * the workload. Integer sums are exact, so results are bit-identical
  * with the HOF form and the DuckDB oracle by construction.
  *
  * Length-mismatch contract: returns NULL, exactly like the HOF spelling
  * (`zip_with` null-pads the shorter array and `acc + null` is null), so
  * the documented fallback never diverges from the extension.
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int_dot_product expects two array<int> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int n = $a.numElements();
         |  long acc = 0L;
         |  for (int i = 0; i < n; i++) {
         |    acc += (long) $a.getInt(i) * (long) $b.getInt(i);
         |  }
         |  ${ev.value} = acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Fused dot product as a Column. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Fused integer dot product (exact `long` sum) as a Column. */
  def intDot(a: Column, b: Column): Column =
    GraftBridge.column(IntDotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
