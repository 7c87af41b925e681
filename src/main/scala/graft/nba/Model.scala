package graft.nba

/** Typed data model for the game-analytics domain engine — the Spark-native
  * re-expression of the reference's heterogeneous temporal property graph
  * (`/root/reference/docs/schema.md:47-196`). One case class per node-table
  * family; ids are Long throughout (NBA ids exceed int32,
  * `docs/schema.md:59`), clocks are seconds-since-game-start doubles
  * (SURVEY.md §1.2: Neo4j durations → double seconds).
  */
object Model {

  /** A play-by-play action row (reference `src/fetcher.py:100-115`,
    * projected at `src/managers/game.py:99-118`). Sentinels already
    * normalized to null (F10). `global_clock` = seconds since game start
    * (derived via [[graft.ops.TimeKernel.globalClock]]). */
  case class PbpAction(
      game_id: Long,
      action_id: Long,
      period: Int,
      global_clock: Double,
      action_type: String, // period|substitution|jumpball|violation|foul|2pt|3pt|freethrow|rebound|turnover|timeout
      sub_type: Option[String],
      descriptor: Option[String],
      shot_result: Option[String], // Made | Missed
      team_id: Option[Long],
      person_id: Option[Long],
      assist_person_id: Option[Long],
      block_person_id: Option[Long],
      steal_person_id: Option[Long],
      foul_drawn_person_id: Option[Long],
      // jumpball actor ids (reference game.py:239-259); default None so
      // non-jumpball construction sites stay positional-14
      jumpball_won_person_id: Option[Long] = None,
      jumpball_lost_person_id: Option[Long] = None,
      jumpball_recovered_person_id: Option[Long] = None,
      // shot coordinates (reference docs/schema.md:110-115)
      x: Option[Double] = None,
      y: Option[Double] = None,
      dist: Option[Double] = None)

  /** Boxscore starter row (reference `src/fetcher.py:88-96`, filter at
    * `src/managers/game.py:88-90`). */
  case class Starter(game_id: Long, team_id: Long, person_id: Long)

  /** One game of the schedule (reference `src/fetcher.py:75-84`). */
  case class ScheduledGame(
      season_id: String,
      game_id: Long,
      game_time: java.sql.Timestamp,
      home_team_id: Long,
      away_team_id: Long)

  /** A substitution event on the team's clock-ordered sub stream. */
  case class SubEvent(
      game_id: Long,
      team_id: Long,
      person_id: Long,
      global_clock: Double,
      is_in: Boolean)

  /** An emitted 5-player lineup snapshot (the reference's fold output,
    * `src/managers/game.py:147-193`): the lineup on court for `team_id`
    * from `global_clock` until the next snapshot. */
  case class LineupSnapshot(
      game_id: Long,
      team_id: Long,
      global_clock: Double,
      player_ids: Seq[Long])

  /** A lineup stint: maximal interval one 5-player lineup is on court
    * (reference `LineUpStint`, `src/queries/game.py:54-129`). */
  case class LineupStint(
      game_id: Long,
      team_id: Long,
      stint_id: String,
      lineup_id: String,
      stint_index: Int,
      start_clock: Double,
      end_clock: Double,
      player_ids: Seq[Long])
}
