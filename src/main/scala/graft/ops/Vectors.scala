package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column kernels for embedding similarity: dot product,
  * norm, cosine — as higher-order-function expressions over
  * `array<float>` columns.
  *
  * Accumulation is an explicit left fold in DOUBLE precision: floats are
  * cast up before multiplying and summed strictly left-to-right, which is
  * (a) the numerically sane thing and (b) bit-reproducible across engines
  * (DuckDB's `list_reduce` folds the same way), keeping cosine scores
  * oracle-checkable.
  */
object Vectors {

  private def d(c: Column): Column = c.cast("double")

  /** Left-fold sum of an array<double> column. */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** HOF dot product — same fold semantics as [[dot]]; kept as the
    * reference implementation for cross-checking the fused expression. */
  def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => d(x) * d(y)))

  /** Fused-loop dot product (custom Catalyst expression with codegen —
    * see [[graft.functions.DotProduct]]); bit-identical to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
