package graft.nba

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Golden for the possession segmentation semantics on a hand-built
  * timeline: boundaries at made shot / made last FT / turnover /
  * defensive rebound, period changes always cut, the ending event stays
  * INSIDE its possession.
  */
class PossessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("possession cuts: scoring, turnover, defensive rebound, period edge") {
    import spark.implicits._
    // (seq, action_id, period, order_clock, action_type, team_id,
    //  is_shot, is_made, is_last_ft, rebound_defensive, points)
    val rows = Seq(
      // P1: miss -> offensive rebound -> made 2pt (ends P1)
      (1, 10L, 1, 10.0, "2pt", 1L, true, false, false, false, 0),
      (2, 11L, 1, 12.0, "rebound", 1L, false, false, false, false, 0),
      (3, 12L, 1, 14.0, "2pt", 1L, true, true, false, false, 2),
      // P2: turnover (ends P2)
      (4, 13L, 1, 20.0, "turnover", 2L, false, false, false, false, 0),
      // P3: miss -> DEFENSIVE rebound (ends P3)
      (5, 14L, 1, 30.0, "3pt", 1L, true, false, false, false, 0),
      (6, 15L, 1, 32.0, "rebound", 2L, false, false, false, true, 0),
      // P4: foul + FT1 missed + FT2 made (last, ends P4)
      (7, 16L, 1, 40.0, "foul", 2L, false, false, false, false, 0),
      (8, 17L, 1, 40.1, "freethrow", 1L, false, false, false, false, 0),
      (9, 18L, 1, 40.2, "freethrow", 1L, false, true, true, false, 1),
      // P5: lone miss at end of Q1...
      (10, 19L, 1, 700.0, "2pt", 2L, true, false, false, false, 0),
      // ...P6: period change cuts even without an ending event
      (11, 20L, 2, 730.0, "violation", 1L, false, false, false, false, 0))
      .map { case (seq, aid, p, c, t, tm, sh, md, lft, rd, pts) =>
        (1L, seq, aid, p, c, t, tm, sh, md, lft, rd, pts)
      }
      .toDF("game_id", "seq", "action_id", "period", "order_clock",
        "action_type", "team_id", "is_shot", "is_made", "is_last_ft",
        "rebound_defensive", "points")

    val got = Possessions.segments(rows)
      .orderBy("possession_index")
      .collect()
      .map(r => (r.getAs[Long]("possession_index"), r.getAs[Long]("n_events"),
        r.getAs[Long]("points"), r.getAs[Long]("first_team_id"),
        r.getAs[Long]("period")))
      .toSeq

    assert(got == Seq(
      (1L, 3L, 2L, 1L, 1L), // miss+oreb+made2
      (2L, 1L, 0L, 2L, 1L), // turnover
      (3L, 2L, 0L, 1L, 1L), // miss + dreb
      (4L, 3L, 1L, 2L, 1L), // foul + 2 FTs
      (5L, 1L, 0L, 2L, 1L), // lone miss, cut by period edge
      (6L, 1L, 0L, 1L, 2L))) // Q2 opener
  }
}
