package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Count-Min aggregate: the q108 harness rests on (a) the one-sided
  * guarantee — estimate ≥ exact count, always — and (b) the sketch being
  * a deterministic function of the input MULTISET, identical under any
  * partitioning (what makes it oracle-checkable and streaming-safe).
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sketch(xs: Seq[Long], d: Int, w: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    xs.toDF("v").repartition(parts)
      .agg(CmsCounts.counts(col("v"), d, w).as("cms"))
      .head().getSeq[Long](0)
  }

  private def estimates(xs: Seq[Long], d: Int, w: Int, parts: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = xs.toDF("v").repartition(parts)
    val sk = df.agg(CmsCounts.counts(col("v"), d, w).as("cms"))
    df.distinct().crossJoin(broadcast(sk))
      .select(col("v"), CmsCounts.estimate(col("cms"), col("v"), d, w).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("counters sum to depth * n, and the sketch is partitioning-invariant") {
    val rnd = new scala.util.Random(20260813L)
    val xs = Seq.fill(500)(rnd.nextLong(40L))
    val s1 = sketch(xs, 4, 32, 1)
    assert(s1.sum == 4L * xs.size)
    for (parts <- Seq(3, 8, 32))
      assert(sketch(xs, 4, 32, parts) == s1, s"parts=$parts diverged")
  }

  test("one-sided error: estimate >= exact for every key, any partitioning") {
    val rnd = new scala.util.Random(42L)
    // small width vs many keys: collisions guaranteed, the regime where
    // a two-sided bug would show as an underestimate
    val xs = Seq.fill(2000)(rnd.nextLong(300L))
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 8)) {
      val est = estimates(xs, 4, 16, parts)
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"parts=$parts key=$k est=${est(k)} < exact=$n")
      }
    }
  }

  test("collision-free regime: estimates are exact") {
    // 10 keys into width 1024 with 4 rows: P(any collision) tiny, and
    // with these fixed hashes, zero — estimates equal exact counts
    val xs = (0L until 10L).flatMap(k => Seq.fill((k + 1).toInt)(k))
    val est = estimates(xs, 4, 1024, 4)
    (0L until 10L).foreach(k => assert(est(k) == k + 1))
  }

  test("nulls are ignored; empty input yields an all-zero matrix") {
    import spark.implicits._
    val s = Seq(Some(3L), None, Some(3L)).toDF("v")
      .agg(CmsCounts.counts(col("v"), 2, 8).as("cms"))
      .head().getSeq[Long](0)
    assert(s.sum == 4L && s.length == 16)
    assert(sketch(Seq.empty, 2, 8, 1).forall(_ == 0L))
  }

  test("grouped sketches: each group folds independently") {
    import spark.implicits._
    val xs = Seq.fill(30)((0, 5L)) ++ Seq.fill(20)((1, 5L))
    val got = xs.toDF("g", "v").repartition(4)
      .groupBy("g").agg(CmsCounts.counts(col("v"), 2, 8).as("cms"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).sum).toMap
    assert(got(0) == 60L && got(1) == 40L) // depth 2 × group size
  }
}
