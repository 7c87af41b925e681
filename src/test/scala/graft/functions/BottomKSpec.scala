package graft.functions

import graft.SparkTestSession
import graft.ops.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bottom-k-by-hash sample aggregate: exact closed form vs a local
  * reference, partition-count invariance (the property map-side partial
  * aggregation rests on), and the plan pin that the partial actually
  * happens. */
class BottomKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sample equals the k lexicographically-smallest (hash, value) pairs") {
    import spark.implicits._
    val rows = (1 to 400).map(i => (s"k$i", i * 1.5))
    val df = rows.toDF("key", "v")
      .select(Text.baseHash(col("key")).as("h"), col("v"))
    val want = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sorted.take(64).map(_._2).toSeq
    val got = df.agg(BottomKSample.sample(col("h"), col("v"), 64).as("s"))
      .head().getSeq[Double](0)
    assert(got == want)
  }

  test("below k the sample is the whole group (hash-ascending); nulls skipped") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("b", None), ("c", Some(3.0)))
      .toDF("key", "v")
      .select(Text.baseHash(col("key")).as("h"), col("v"))
    val want = df.where(col("v").isNotNull).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.map(_._2).toSeq
    val got = df.agg(BottomKSample.sample(col("h"), col("v"), 8).as("s"))
      .head().getSeq[Double](0)
    assert(got == want && got.size == 2)
  }

  test("partition-count invariance: 1, 7, 32 partitions give the identical sample") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 4, s"row$i", i.toDouble)).toDF("g", "key", "v")
      .select(col("g"), Text.baseHash(col("key")).as("h"), col("v"))
    val ref = df.repartition(1).groupBy("g")
      .agg(BottomKSample.sample(col("h"), col("v"), 32).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (parts <- Seq(7, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(BottomKSample.sample(col("h"), col("v"), 32).as("s"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      assert(got == ref, s"parts=$parts")
    }
  }

  test("q204 plan: ObjectHashAggregate with a map-side partial bottom_k_sample") {
    val plan = graft.Registry.all.find(_.name == "q204_quantile_sketch").get
      .run(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_bottom_k_sample"))
  }
}
