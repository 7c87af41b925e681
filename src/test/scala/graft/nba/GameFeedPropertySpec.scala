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

  // --- action-id keyspace (round-2 ADVICE / round-3 VERDICT item 5) ---
  //
  // Every pbp row is keyed by the (game_id, action_id) composite. Event
  // rows occupy the non-negative ids {event_id*4 + j | j in 0..2}; period
  // bracket rows occupy the negative per-game ids {-2p, -2p-1 | p >= 1}.
  // The two keyspaces must stay disjoint and each injective at ANY event
  // volume, or downstream as-of joins / NEXT chains silently merge rows.

  test("id formulas: event and period keyspaces disjoint and injective at adversarial counts") {
    val evId = Gen.choose(0L, 1L << 40) // far past any real feed volume
    val per = Gen.choose(1, 1000000)
    check(Prop.forAll(Gen.listOfN(50, evId), Gen.listOfN(50, per)) {
      (evs, pers) =>
        val eventIds = evs.distinct.flatMap(e => Seq(e * 4, e * 4 + 1, e * 4 + 2))
        val periodIds = pers.distinct.flatMap(p => Seq(-2L * p, -2L * p - 1))
        eventIds.forall(_ >= 0) && periodIds.forall(_ < 0) &&
          eventIds.distinct.size == eventIds.size &&
          periodIds.distinct.size == periodIds.size
    })
  }

  test("real pbp on an adversarial feed: (game_id, action_id) is a key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 3 games x ~300 events each, cycling every event family including the
    // max-fan-out one (foul + 2 FTs = 3 rows/event) and enough 45 s clock
    // steps to tile multiple OT periods — the shapes that would collide
    // first if the keyspace scheme regressed.
    val dir = java.nio.file.Files.createTempDirectory("graft_feed_keyspace").toString
    val types = Seq("signup", "click", "purchase", "error", "view")
    (0 until 900).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        (i % 3).toLong, types(i % 5), (i * 7 % 200).toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val pbp = GameFeed.pbp(spark, dir).cache()
    try {
      val total = pbp.count()
      val distinctKeys =
        pbp.select(col("game_id"), col("action_id")).distinct().count()
      assert(total == distinctKeys, s"key collision: $total rows, $distinctKeys keys")
      // and the structural split that makes collisions impossible:
      assert(pbp.filter(col("action_type") =!= "period" && col("action_id") < 0).isEmpty)
      assert(pbp.filter(col("action_type") === "period" && col("action_id") >= 0).isEmpty)
      // multiple OT periods actually reached (the adversarial part)
      assert(pbp.agg(max(col("period"))).as[Int].head() > 4)
    } finally pbp.unpersist()
  }
}
