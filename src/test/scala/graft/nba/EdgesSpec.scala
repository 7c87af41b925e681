package graft.nba

import graft.SparkTestSession
import graft.ops.TimeKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the actor-edge inventory (Edges.actorEdges / caused) on
  * the hand-built fixture game, plus the OT path of the periods
  * pipeline. Expectations computed by hand from Fixture.scala's script.
  */
class EdgesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val result = GamePipeline.run(
    spark, Fixture.pbp(spark), Fixture.starters(spark),
    Fixture.gameTeams(spark))

  private lazy val edges = Edges
    .actorEdges(result.attributedEvents, result.playerStints)
    .select("rel_type", "src_id", "src_kind", "dst_action_id")
    .collect()
    .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    .toSet

  test("TOOK_SHOT resolves shooters to the player stint live at the shot") {
    // action 1: 2pt by player 1 at t=60 -> run [0,300) = 9001_1_1
    assert(edges.contains(("TOOK_SHOT", "9001_1_1", "player_stint", 1L)))
    // action 9: 3pt by player 6 at t=400 -> 6's only run
    assert(edges.contains(("TOOK_SHOT", "9001_6_1", "player_stint", 9L)))
    // action 16: 2pt by player 1 at t=1100 -> 1's SECOND run (post-revert)
    assert(edges.contains(("TOOK_SHOT", "9001_1_2", "player_stint", 16L)))
  }

  test("ASSISTED / BLOCKED / DREW_FOUL / STOLE_BALL resolve cross-actor edges") {
    assert(edges.contains(("ASSISTED", "9001_2_1", "player_stint", 1L)))
    assert(edges.contains(("ASSISTED", "9001_7_1", "player_stint", 9L)))
    // action 11: away 2pt missed at t=650, blocked by home player 5
    assert(edges.contains(("BLOCKED", "9001_5_1", "player_stint", 11L)))
    // action 5: home foul by 4, drawn by away 13
    assert(edges.contains(("COMMITTED_FOUL", "9001_4_1", "player_stint", 5L)))
    assert(edges.contains(("DREW_FOUL", "9001_13_1", "player_stint", 5L)))
    // action 10: away turnover by 14, stolen by home 3
    assert(edges.contains(("LOST_BALL", "9001_14_1", "player_stint", 10L)))
    assert(edges.contains(("STOLE_BALL", "9001_3_1", "player_stint", 10L)))
  }

  test("free throws carry TOOK_SHOT from the shooting player's stint") {
    assert(edges.contains(("TOOK_SHOT", "9001_13_1", "player_stint", 6L)))
    assert(edges.contains(("TOOK_SHOT", "9001_13_1", "player_stint", 7L)))
  }

  test("CAUSED links the foul to both same-clock free throws") {
    val caused = Edges.caused(result.attributedEvents)
      .select("src_action_id", "dst_action_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(caused == Set((5L, 6L), (5L, 7L)))
  }

  test("CAUSED never cross-multiplies when several fouls share one clock") {
    import spark.implicits._
    // double-foul clock 100: each FT links to the nearest PRECEDING foul
    // in action-id order (9 has none -> falls back to the first foul);
    // clock 200 has a foul-less FT which must drop out
    val rows = Seq(
      (1L, 100.0, 10L, "foul", false), (1L, 100.0, 12L, "foul", false),
      (1L, 100.0, 9L, "freethrow", true), (1L, 100.0, 11L, "freethrow", true),
      (1L, 100.0, 13L, "freethrow", true), (1L, 200.0, 20L, "freethrow", true))
      .toDF("game_id", "global_clock", "action_id", "action_type", "is_freethrow")
    val caused = Edges.caused(rows)
      .select("src_action_id", "dst_action_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(caused == Set((10L, 9L), (10L, 11L), (12L, 13L)))
  }

  test("periods pipeline: OT period gets the 300 s tile and OT label") {
    import spark.implicits._
    // 5-period game: Q1-Q4 regulation + one OT ending at 3100
    val rows = (1 to 5).flatMap { p =>
      val start = if (p <= 4) (p - 1) * 720.0 else 2880.0
      val end = if (p < 4) p * 720.0 else if (p == 4) 2880.0 else 3100.0
      Seq(
        Model.PbpAction(1L, p * 10L, p, start, "period", Some("start"),
          None, None, None, None, None, None, None, None),
        Model.PbpAction(1L, p * 10L + 1, p, end, "period", Some("end"),
          None, None, None, None, None, None, None, None))
    }
    val periods = Periods.fromPbp(rows.toDF())
      .orderBy("period")
      .collect()
    assert(periods.length == 5)
    val ot = periods.last
    assert(ot.getAs[String]("label") == "OT")
    assert(ot.getAs[Boolean]("is_overtime"))
    assert(ot.getAs[Double]("start_clock") == 2880.0)
    assert(ot.getAs[Double]("end_clock") == 3100.0)
    assert(periods.take(4).forall(!_.getAs[Boolean]("is_overtime")))
    assert(periods.head.getAs[String]("label") == "Q1")
    val bounds = Periods.gameBounds(Periods.fromPbp(rows.toDF())).head()
    assert(bounds.getAs[Double]("game_end_clock") == 3100.0)
    assert(bounds.getAs[Double]("game_duration") == 3100.0)
  }

  test("TimeKernel periodOfClock/localClock invert the OT tiling") {
    import spark.implicits._
    val df = Seq(0.0, 719.9, 720.0, 2879.9, 2880.0, 3050.0, 3180.0).toDF("c")
      .select(col("c"), TimeKernel.periodOfClock(col("c")).as("p"),
        TimeKernel.localClock(col("c")).as("lc"))
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2)))
    assert(df.toSeq == Seq(
      (0.0, 1, 0.0), (719.9, 1, 719.9), (720.0, 2, 0.0),
      (2879.9, 4, 719.9000000000001), (2880.0, 5, 0.0),
      (3050.0, 5, 170.0), (3180.0, 6, 0.0)))
  }
}
