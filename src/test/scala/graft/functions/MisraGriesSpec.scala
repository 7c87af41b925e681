package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries candidate aggregate: the one property the q105
  * two-pass pattern rests on is the SUPERSET guarantee — any item with
  * true count > n/(k+1) appears in the candidate array — and that it
  * survives merging partial buffers from any partitioning.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def candidates(xs: Seq[Long], k: Int, parts: Int): Set[Long] = {
    import spark.implicits._
    xs.toDF("h").repartition(parts)
      .agg(MgCandidates.candidates(col("h"), k).as("c"))
      .head().getSeq[Long](0).toSet
  }

  test("fewer distinct items than k: candidates are exactly the distinct set") {
    val xs = Seq(1L, 2L, 2L, 3L, 3L, 3L)
    assert(candidates(xs, 8, 3) == Set(1L, 2L, 3L))
  }

  test("candidate count never exceeds k") {
    val xs = (1L to 1000L) // all distinct: worst case for counter churn
    assert(candidates(xs, 16, 7).size <= 16)
  }

  // a skewed stream: items 0..9 heavy (100 each), 1000 singleton items
  test("every phi-heavy item survives, at any partitioning") {
    val heavy = (0L until 10L).flatMap(h => Seq.fill(100)(h))
    val noise = (100L until 1100L)
    val xs = scala.util.Random.shuffle(heavy ++ noise) // n = 2000
    // k = 39: guarantee covers counts > 2000/40 = 50; the heavies have 100
    for (parts <- Seq(1, 4, 32)) {
      val c = candidates(xs, 39, parts)
      assert((0L until 10L).toSet.subsetOf(c), s"parts=$parts lost a heavy: $c")
    }
  }

  test("property: candidates(k) always contain every item with count > n/(k+1)") {
    val rnd = new scala.util.Random(20260813L) // seeded: reproducible cases
    for (_ <- 1 to 15) {
      val n = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(20)
      val parts = 1 + rnd.nextInt(8)
      // small key space → heavy ties, the adversarial regime for MG
      val xs = Seq.fill(n)(rnd.nextLong(31L))
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // integer '>' is exact here: count > floor(n/(k+1)) ⇔ count > n/(k+1)
      val mustSurvive = counts.filter(_._2 > xs.size.toLong / (k + 1)).keySet
      val c = candidates(xs, k, parts)
      assert(mustSurvive.subsetOf(c),
        s"k=$k parts=$parts n=${xs.size} missing=${mustSurvive -- c}")
    }
  }

  test("nulls are ignored; empty input yields an empty candidate array") {
    import spark.implicits._
    val withNulls = Seq(Some(5L), None, Some(5L), None).toDF("h")
      .agg(MgCandidates.candidates(col("h"), 4).as("c"))
    assert(withNulls.head().getSeq[Long](0) == Seq(5L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(MgCandidates.candidates(col("h"), 4).as("c"))
    assert(empty.head().getSeq[Long](0).isEmpty)
  }

  test("grouped candidates: per-group guarantee holds independently") {
    import spark.implicits._
    // group 0: key 7 heavy; group 1: key 9 heavy
    val xs = Seq.fill(50)((0, 7L)) ++ (100L until 130L).map(h => (0, h)) ++
      Seq.fill(50)((1, 9L)) ++ (200L until 230L).map(h => (1, h))
    val got = xs.toDF("g", "h").repartition(5)
      .groupBy("g").agg(MgCandidates.candidates(col("h"), 3).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    assert(got(0).contains(7L) && got(1).contains(9L))
  }
}
