package graft.functions

import graft.SparkTestSession
import graft.ops.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native KMV aggregate: exact below k, closed-form estimate at k,
  * and — the property partial aggregation and streaming state rest on —
  * partition-count invariance of the merge. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("below k the sketch is the exact distinct count (duplicates collapse)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 2L, 1L, 7L).toDF("h")
      .agg(KmvSketch.estimate(col("h"), 16).as("e"))
    assert(df.head().getDouble(0) == 4.0)
  }

  test("empty input evaluates to 0, null hashes are ignored") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("h")
      .agg(KmvSketch.estimate(col("h"), 16).as("e"))
    assert(empty.head().getDouble(0) == 0.0)
    val withNulls = Seq(Some(5L), None, Some(9L), None).toDF("h")
      .agg(KmvSketch.estimate(col("h"), 16).as("e"))
    assert(withNulls.head().getDouble(0) == 2.0)
  }

  test("at >= k the estimate is (k-1) * 2^60 / h_k and is partition-invariant") {
    import spark.implicits._
    val n = 500
    val hashes = spark.createDataset((1 to n).map(i => s"user-$i"))
      .select(Text.baseHash(col("value")).as("h"))
    val expected = {
      val hs = hashes.collect().map(_.getLong(0)).distinct.sorted
      15.0 * 1.152921504606846976e18 / hs(15).toDouble
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = hashes.repartition(parts)
        .agg(KmvSketch.estimate(col("h"), 16).as("e"))
        .head().getDouble(0)
      assert(got == expected, s"parts=$parts") // bit-exact, not approx
    }
    // sanity: the estimate is within 60% of truth for n=500, k=16
    assert(math.abs(expected - n) / n < 0.6)
  }

  test("grouped: per-key sketches match per-key closed forms") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i % 3, s"u$i")).toDF("g", "s")
      .select(col("g"), Text.baseHash(col("s")).as("h"))
    val got = df.groupBy("g").agg(KmvSketch.estimate(col("h"), 16).as("e"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = df.collect().map(r => r.getInt(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, rows) =>
        val hs = rows.map(_._2).distinct.sorted
        g -> (if (hs.length >= 16) 15.0 * 1.152921504606846976e18 / hs(15).toDouble
              else hs.length.toDouble)
      }
    assert(got == want)
  }

  test("kmv_values returns the k smallest distinct hashes ascending, partition-invariant") {
    import spark.implicits._
    val hashes = spark.createDataset((1 to 500).map(i => s"user-$i"))
      .select(Text.baseHash(col("value")).as("h"))
    val want = hashes.collect().map(_.getLong(0)).distinct.sorted.take(16).toSeq
    for (parts <- Seq(1, 7, 32)) {
      val got = hashes.repartition(parts)
        .agg(KmvValues.values(col("h"), 16).as("kv"))
        .head().getSeq[Long](0)
      assert(got == want, s"parts=$parts")
    }
    // below k: the values ARE the full distinct set, still ascending
    val small = Seq(9L, 3L, 9L, 1L).toDF("h")
      .agg(KmvValues.values(col("h"), 16).as("kv"))
      .head().getSeq[Long](0)
    assert(small == Seq(1L, 3L, 9L))
  }

  test("kmv_values sketch algebra matches exact set operations below saturation") {
    import spark.implicits._
    // two overlapping sets, both smaller than k: the union sketch is the
    // exact union, so intersection/Jaccard from sketches must be exact
    val a = (1 to 40).map(i => s"doc-$i")
    val b = (21 to 70).map(i => s"doc-$i")
    def kv(xs: Seq[String]) = spark.createDataset(xs)
      .select(Text.baseHash(col("value")).as("h"))
      .agg(KmvValues.values(col("h"), 256).as("kv"))
      .head().getSeq[Long](0).toSet
    val (ka, kb) = (kv(a), kv(b))
    val ku = (ka ++ kb).toSeq.sorted.take(256).toSet
    assert((ku & ka & kb).size == 20) // |A ∩ B| exactly
    assert(ku.size == 70)             // |A ∪ B| exactly
  }

  test("kmv_values is registered as a SQL function via GraftExtensions") {
    import spark.implicits._
    Seq(5L, 2L, 2L, 8L).toDF("h").createOrReplaceTempView("kmv_vals_in")
    val got = spark.sql("SELECT kmv_values(h, 4) AS kv FROM kmv_vals_in")
      .head().getSeq[Long](0)
    assert(got == Seq(2L, 5L, 8L))
  }
}
