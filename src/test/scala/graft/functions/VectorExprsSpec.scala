package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native vector expressions: the fused loops must agree bit-for-bit
  * with the HOF (`aggregate(zip_with(...))`) spellings they replace —
  * that equivalence is what lets q30/q92 swap them in without touching
  * their oracles — and the SQL registrations must reach the same code.
  */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def hofIntDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  test("IntDotProduct agrees exactly with the HOF fold it fuses") {
    import spark.implicits._
    val df = Seq(
      (Array(1, 2, 3), Array(4, 5, 6)),            // 4+10+18 = 32
      (Array(-128, 127), Array(127, 127)),         // int8 corners
      (Array.empty[Int], Array.empty[Int]),        // empty → 0
      (Array(Int.MaxValue, Int.MaxValue), Array(2, 2)) // needs long acc
    ).toDF("a", "b")
    val rows = df.select(
      VectorExprs.intDot(col("a"), col("b")).as("fused"),
      hofIntDot("a", "b").as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(rows(0).getLong(0) == 32L)
    assert(rows(3).getLong(0) == 2L * Int.MaxValue * 2)
  }

  test("mismatched lengths → null, matching the HOF spelling; null arrays → null") {
    import spark.implicits._
    // zip_with null-pads the shorter array and acc + null poisons the HOF
    // fold, so the fused expression must return null too — the documented
    // fallback on a stock session never diverges from the extension.
    val df = Seq((Array(2, 3, 100), Array(10, 10))).toDF("a", "b")
    val r = df.select(
      VectorExprs.intDot(col("a"), col("b")).as("fused"),
      hofIntDot("a", "b").as("hof")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    val withNull = Seq((Some(Array(1, 2)), Option.empty[Array[Int]])).toDF("a", "b")
    assert(withNull.select(VectorExprs.intDot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("int_dot_product is reachable from SQL via GraftExtensions") {
    import spark.implicits._
    Seq((Array(1, 2), Array(3, 4))).toDF("a", "b").createOrReplaceTempView("vex")
    assert(spark.sql("SELECT int_dot_product(a, b) AS d FROM vex").head().getLong(0) == 11L)
  }

  test("non-int arrays are rejected at analysis, not silently coerced") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorExprs.intDot(col("a"), col("b"))).head()
    }
  }
}
