package graft

import graft.ops.Salt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted two-stage aggregation equals direct groupBy on skewed data") {
    import spark.implicits._
    // heavy skew: 90% of rows share one key
    val df = (0 until 10000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, (i % 100).toDouble)
    }.toDF("k", "id", "v")

    val salted = Salt.skewedSumCount(df, Seq("k"), "v", "id", buckets = 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      val (ss, sn) = salted(k)
      assert(sn == n, s"count mismatch for $k")
      assert(math.abs(ss - s) < 1e-9, s"sum mismatch for $k")
    }
  }
}
