package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule fusing the portable higher-order-function dot-product
  * spelling into the codegen'd native kernels: a user who writes plain
  * Spark —
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0D, (acc, v) -> acc + v)                  // → dot_product
  *   aggregate(zip_with(qa, qb, (x, y) -> long(x) * long(y)),
  *             0L, (acc, v) -> acc + v)                    // → int_dot_product
  * }}}
  *
  * — gets [[DotProduct]]/[[IntDotProduct]]'s single fused loop (measured
  * ~6× on the 64-dim corpus: the HOF form materializes the zipped array
  * and interprets two lambdas per element) without changing a line. The
  * fused kernels keep the exact left-to-right fold, so the rewrite is
  * value-identical, including the NULL-on-length-mismatch contract the
  * HOF spelling has via zip_with's null padding.
  *
  * The match is deliberately strict — it fires ONLY when:
  *   - the zero literal is bit-exactly +0.0 / 0L and the finish lambda is
  *     the identity (the shapes `aggregate` generates for a plain sum); a
  *     -0.0 seed compares == 0.0 but folds to -0.0 over empty arrays, so
  *     the double guard checks `doubleToRawLongBits(zero) == 0L`;
  *   - the merge lambda is `acc + v` in that argument order;
  *   - the element lambda is `x * y` with each side the corresponding
  *     lambda variable, bare or under a single widening cast;
  *   - both arrays declare `containsNull = false`: a NULL ELEMENT
  *     poisons the HOF fold to NULL, which the fused loop does not
  *     reproduce — those plans keep the HOF spelling (correctness
  *     before speed);
  *   - element types are float/double (→ [[DotProduct]]) or int
  *     (→ [[IntDotProduct]]).
  *
  * `spark.graft.fuseVectorOps=false` disables the rule (the spec uses
  * this to cross-check fused-vs-HOF agreement on the same session). */
object FuseVectorOps extends Rule[LogicalPlan] {

  private def asLambdaVar(e: Expression, want: DataType): Option[NamedLambdaVariable] =
    e match {
      case v: NamedLambdaVariable if v.dataType == want => Some(v)
      case Cast(v: NamedLambdaVariable, dt, _, _) if dt == want => Some(v)
      case _ => None
    }

  /** f is `(x, y) -> x * y` (each side possibly under one cast to `t`). */
  private def isElementwiseMul(f: Expression, t: DataType): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (asLambdaVar(l, t), asLambdaVar(r, t)) match {
        case (Some(a), Some(b)) => a.exprId == x.exprId && b.exprId == y.exprId
        case _ => false
      }
    case _ => false
  }

  /** f is `(acc, v) -> acc + v`. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      l.exprId == acc.exprId && r.exprId == v.exprId
    case _ => false
  }

  /** f is `v -> v`. */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  private def denseArrayOf(e: Expression, ok: DataType => Boolean): Boolean =
    e.dataType match {
      case ArrayType(et, containsNull) => !containsNull && ok(et)
      case _ => false
    }

  private def floatish(e: Expression): Boolean =
    denseArrayOf(e, t => t == FloatType || t == DoubleType)

  private def intArray(e: Expression): Boolean =
    denseArrayOf(e, _ == IntegerType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.fuseVectorOps", "true") != "true") plan
    else plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, mul), Literal(zero: Double, DoubleType),
          merge, finish)
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            floatish(a) && floatish(b) &&
            isElementwiseMul(mul, DoubleType) && isSum(merge) &&
            isIdentity(finish) =>
        DotProduct(a, b)
      case ArrayAggregate(ZipWith(a, b, mul), Literal(zero: Long, LongType),
          merge, finish)
          if zero == 0L && intArray(a) && intArray(b) &&
            isElementwiseMul(mul, LongType) && isSum(merge) &&
            isIdentity(finish) =>
        IntDotProduct(a, b)
    }
}
