package graft.nba

import graft.SparkTestSession
import graft.nba.Model._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the GameFeed rotation scheme — the invariants the whole
  * oracle strategy rests on: the k-th swap of a team takes OUT player
  * (k-1)%10 (always on court) and brings IN player (k+4)%10 (always on
  * the bench), so after k swaps the lineup is exactly {k..k+4 mod 10},
  * every lineup has 5 players, and every swap changes the lineup. If any
  * of these ever broke, the closed-form DuckDB oracles (Domain.PRELUDE's
  * `st`/`mem`/`pev` CTEs) would diverge from the real fold silently.
  *
  * Checked by direct simulation over arbitrary swap counts — pure
  * driver-side math, no Spark job, so the property runs hundreds of
  * cases instantly; the fold-vs-closed-form agreement on real data is
  * separately pinned by the 57 oracle-gated queries.
  */
class GameFeedPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
  private lazy val spark = SparkTestSession.spark

  private def simulate(nSwaps: Int): (Boolean, Boolean, Boolean) = {
    var court = (0 until 5).toSet
    var outOk = true
    var inOk = true
    var always5AndChanged = true
    for (k <- 1 to nSwaps) {
      val out = (k - 1) % 10
      val in = (k + 4) % 10
      outOk &&= court.contains(out)
      inOk &&= !court.contains(in)
      val next = court - out + in
      always5AndChanged &&= next.size == 5 && next != court
      court = next
    }
    (outOk, inOk, always5AndChanged)
  }

  test("rotation invariant: out on court, in off court, lineup always 5 and changing") {
    check(Prop.forAll(Gen.choose(0, 500)) { n =>
      val (outOk, inOk, c5) = simulate(n)
      outOk && inOk && c5
    })
  }

  test("closed form: after k swaps the lineup is {k..k+4 mod 10}") {
    check(Prop.forAll(Gen.choose(0, 500)) { n =>
      var court = (0 until 5).toSet
      for (k <- 1 to n) court = court - ((k - 1) % 10) + ((k + 4) % 10)
      court == (n until n + 5).map(_ % 10).toSet
    })
  }

  test("the real fold on a feed-shaped stream equals the closed form") {
    import spark.implicits._
    // one synthetic team with 23 swaps at distinct clocks through the
    // actual Stints.lineupSnapshots cogroup fold
    val teamId = 7L
    val starters = (0L to 4L).map(i => Starter(1L, teamId, 700L + i)).toDS()
    val subs = (1 to 23).flatMap { k =>
      val clock = k * 30.0
      Seq(
        Model.SubEvent(1L, teamId, 700L + (k - 1) % 10, clock, is_in = false),
        Model.SubEvent(1L, teamId, 700L + (k + 4) % 10, clock, is_in = true))
    }.toDS()
    val snaps = Stints.lineupSnapshots(spark, starters, subs)
      .collect().sortBy(_.global_clock)
    assert(snaps.length == 24) // starters + one snapshot per swap
    snaps.zipWithIndex.foreach { case (s, k) =>
      val want = (k until k + 5).map(i => 700L + i % 10).sorted
      assert(s.player_ids == want, s"swap $k")
    }
  }
}
