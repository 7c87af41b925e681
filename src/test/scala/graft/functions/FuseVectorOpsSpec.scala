package graft.functions

import graft.SparkTestSession
import graft.ops.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HOF→fused optimizer rule: (a) the portable `aggregate(zip_with)`
  * dot-product spelling plans as the native kernel, (b) the rewrite is
  * value-identical to the un-rewritten HOF on the same session (toggled
  * via `spark.graft.fuseVectorOps`), (c) near-miss patterns are left
  * alone, and (d) nullable-element arrays are NOT rewritten (a null
  * element must poison the fold to NULL).
  *
  * Inputs build on `spark.range` — a literal DataFrame collapses to a
  * LocalRelation before the optimizer runs, hiding the expression tree
  * from any plan assertion. */
class FuseVectorOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // containsNull = false float arrays over a non-collapsible source
  private def vecs = spark.range(4).select(
    array((col("id") + 1).cast("float"), (col("id") + 2).cast("float"),
      lit(3.0f)).as("a"),
    array(lit(4.0f), (col("id") + 5).cast("float"), lit(6.0f)).as("b"))

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("float HOF dot product plans as the fused DotProduct") {
    val df = vecs.select(Vectors.dotHof(col("a"), col("b")).as("d"))
    assert(optimized(df).contains("dotproduct"),
      s"HOF spelling not fused:\n${optimized(df)}")
  }

  test("int HOF dot product plans as the fused IntDotProduct") {
    val df = spark.range(4).select(
      array(col("id").cast("int"), lit(2)).as("a"),
      array(lit(3), col("id").cast("int")).as("b"))
      .select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, v) => acc + v).as("d"))
    assert(optimized(df).contains("intdotproduct"),
      s"int HOF spelling not fused:\n${optimized(df)}")
  }

  test("rewrite is value-identical to the disabled-rule HOF plan") {
    val expr = Vectors.dotHof(col("a"), col("b")).as("d")
    val fused = vecs.select(expr).collect().map(_.getDouble(0)).toSeq
    spark.conf.set("spark.graft.fuseVectorOps", "false")
    try {
      val df = vecs.select(expr)
      assert(!optimized(df).contains("dotproduct"), "rule fired while disabled")
      assert(df.collect().map(_.getDouble(0)).toSeq == fused)
    } finally spark.conf.unset("spark.graft.fuseVectorOps")
  }

  test("near-miss patterns are left alone") {
    // x * x (not x * y), zero = 1.0, and acc - v must all survive
    val squares = vecs.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, _) => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(squares).contains("dotproduct"))
    val wrongZero = vecs.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(wrongZero).contains("dotproduct"))
    val wrongMerge = vecs.select(aggregate(
      zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc - v).as("d"))
    assert(!optimized(wrongMerge).contains("dotproduct"))
  }

  test("a -0.0 seed is NOT fused (folds to -0.0 over empty arrays)") {
    // -0.0 == 0.0 under IEEE ==, but an empty-array fold returns the seed
    // verbatim: the HOF gives -0.0 where DotProduct seeds +0.0. The guard
    // is bit-exact (doubleToRawLongBits), so this plan keeps the HOF.
    val df = spark.range(2).select(
      array().cast("array<double>").as("a"), array().cast("array<double>").as("b"))
      .select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(-0.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(df).contains("dotproduct"), "rule fired on -0.0 seed")
    val bits = df.collect().map(r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    assert(bits.forall(_ == java.lang.Double.doubleToRawLongBits(-0.0)),
      "empty-array fold should return the -0.0 seed bit-exactly")
  }

  test("nullable-element arrays keep the HOF spelling and its NULL") {
    // one element nullable through when() — containsNull = true, and the
    // fused loop would not reproduce the null-poisoned fold
    val df = spark.range(2).select(
      array(when(col("id") === 0, lit(null).cast("double"))
        .otherwise(col("id").cast("double")), lit(1.0)).as("a"),
      array(lit(2.0), lit(3.0)).as("b"))
      .select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!optimized(df).contains("dotproduct"),
      "rule fired on containsNull arrays")
    val rows = df.orderBy(lit(1)).collect()
    assert(rows.exists(_.isNullAt(0)), "null element did not poison the fold")
    assert(rows.exists(r => !r.isNullAt(0)))
  }
}
