package graft.nba

import graft.nba.Model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic hand-built mini-game (FIXTURES.md §A5): 2 teams × 7
  * players, 2 periods, covering starter lineups, a same-clock double
  * substitution (the batch rule), a player spanning a lineup change,
  * made/missed 2PT/3PT, "1 of 2" free throws, a rebound within 10 s of a
  * miss, and cross-period scoring. Golden expectations live in the specs.
  *
  * Home team 100: players 1-7 (starters 1-5).
  * Away team 200: players 11-17 (starters 11-15).
  * Clocks are seconds since game start; periods are 720 s halves here
  * (the engine doesn't care — period length enters only via the raw clock
  * derivation, already covered by TimeKernel tests).
  */
object Fixture {

  val gameId = 9001L
  val home = 100L
  val away = 200L

  def starters(spark: SparkSession): Dataset[Starter] = {
    import spark.implicits._
    ((1L to 5L).map(p => Starter(gameId, home, p)) ++
      (11L to 15L).map(p => Starter(gameId, away, p))).toDS()
  }

  /** Substitutions (as pbp `substitution` rows, the way the real feed
    * ships them — `Stints.subEvents` extracts the typed stream):
    *  - t=300: home double sub (1→6, 2→7) at the same clock (batch rule:
    *    one new lineup {3,4,5,6,7}, not two intermediate 4/6-man sets)
    *  - t=600: away single sub (11→16)
    *  - t=900 (period 2): home reverts 6→1
    */
  val subActions: Seq[(Long, Int, Double, Long, Long, String)] = Seq(
    (101L, 1, 300.0, home, 1L, "out"),
    (102L, 1, 300.0, home, 6L, "in"),
    (103L, 1, 300.0, home, 2L, "out"),
    (104L, 1, 300.0, home, 7L, "in"),
    (105L, 1, 600.0, away, 11L, "out"),
    (106L, 1, 600.0, away, 16L, "in"),
    (107L, 2, 900.0, home, 6L, "out"),
    (108L, 2, 900.0, home, 1L, "in"))

  /** Scoring / action stream (non-sub): each tuple is
    * (action_id, period, clock, type, subType, shotResult, team, person,
    * assist, block, steal, foulDrawn). */
  def pbp(spark: SparkSession): Dataset[PbpAction] = {
    import spark.implicits._
    def a(id: Long, period: Int, clock: Double, typ: String,
        sub: Option[String] = None, res: Option[String] = None,
        team: Option[Long] = None, person: Option[Long] = None,
        assist: Option[Long] = None, block: Option[Long] = None,
        steal: Option[Long] = None, drawn: Option[Long] = None) =
      PbpAction(gameId, id, period, clock, typ, sub, None, res,
        team, person, assist, block, steal, drawn)

    val subRows = subActions.map { case (id, period, clock, team, person, dir) =>
      a(id, period, clock, "substitution", sub = Some(dir),
        team = Some(team), person = Some(person))
    }
    // period bracket rows (A1 inputs): first/second event of each period
    // carry its start/end — Periods.fromPbp derives bounds + game end
    val periodRows = Seq(
      a(900, 1, 0.0, "period", sub = Some("start")),
      a(901, 1, 720.0, "period", sub = Some("end")),
      a(902, 2, 720.0, "period", sub = Some("start")),
      a(903, 2, 1440.0, "period", sub = Some("end")))
    (subRows ++ periodRows ++ Seq(
      // P1, first lineups on court
      a(1, 1, 60.0, "2pt", res = Some("Made"), team = Some(home), person = Some(1L), assist = Some(2L)),
      a(2, 1, 120.0, "3pt", res = Some("Missed"), team = Some(away), person = Some(11L)),
      a(3, 1, 125.0, "rebound", sub = Some("defensive"), team = Some(home), person = Some(3L)),
      a(4, 1, 200.0, "2pt", res = Some("Made"), team = Some(away), person = Some(12L)),
      a(5, 1, 280.0, "foul", team = Some(home), person = Some(4L), drawn = Some(13L)),
      a(6, 1, 280.0, "freethrow", sub = Some("1 of 2"), res = Some("Made"), team = Some(away), person = Some(13L)),
      a(7, 1, 280.0, "freethrow", sub = Some("2 of 2"), res = Some("Missed"), team = Some(away), person = Some(13L)),
      a(8, 1, 282.0, "rebound", sub = Some("defensive"), team = Some(home), person = Some(5L)),
      // after home double-sub at 300
      a(9, 1, 400.0, "3pt", res = Some("Made"), team = Some(home), person = Some(6L), assist = Some(7L)),
      a(10, 1, 500.0, "turnover", sub = Some("bad pass"), team = Some(away), person = Some(14L), steal = Some(3L)),
      // after away sub at 600
      a(11, 1, 650.0, "2pt", res = Some("Missed"), team = Some(away), person = Some(16L), block = Some(5L)),
      a(12, 1, 655.0, "rebound", sub = Some("offensive"), team = Some(away), person = Some(16L)),
      a(13, 1, 700.0, "2pt", res = Some("Made"), team = Some(away), person = Some(16L)),
      // P2 (starts at 720), home reverts at 900
      a(14, 2, 800.0, "2pt", res = Some("Made"), team = Some(home), person = Some(7L)),
      a(15, 2, 950.0, "3pt", res = Some("Made"), team = Some(away), person = Some(15L)),
      a(16, 2, 1100.0, "2pt", res = Some("Missed"), team = Some(home), person = Some(1L)),
      a(17, 2, 1130.0, "rebound", sub = Some("defensive"), team = Some(away), person = Some(12L)), // 30s after miss: NOT linked
      a(18, 2, 1300.0, "2pt", res = Some("Made"), team = Some(home), person = Some(3L))
    )).toDS()
  }

  /** (game_id, home_team_id, away_team_id) dimension. */
  def gameTeams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((gameId, home, away)).toDF("game_id", "home_team_id", "away_team_id")
  }

  // Hand-computed golden facts (see spec):
  //   Final score: home 2+3+2+2 = 9, away 2+1+2+3 = 8 -> margin +1
  //   Home lineup stints: [0,300) {1,2,3,4,5}, [300,900) {3,4,5,6,7},
  //                       [900,1440) {1,3,4,5,7}... (revert is 6->1 only)
  //   Away lineup stints: [0,600) {11..15}, [600,1440) {12,13,14,15,16}
}
