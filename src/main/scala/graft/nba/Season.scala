package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Season/schedule domain pipeline — the reference's `load_games`
  * (`/root/reference/src/queries/season.py:3-28`): upsert games from the
  * schedule feed, then chain each team's games in time order with a
  * `NEXT` edge carrying `time_since` (season.py:19-27's ORDER BY +
  * collect + UNWIND pairing, re-expressed as one `lead` window — W1).
  *
  * One explode (each game appears once per participating team) + one
  * window on `team_id`: linear, no self-join, scale-invariant.
  */
object Season {

  /** Per-team game NEXT chain. Input schedule:
    * (game_id, game_time, home_team_id, away_team_id). Output one row per
    * (team, game) with the team's next game and the gap in microseconds
    * (µs keeps the value integral and engine-portable — reference
    * `duration.between` at season.py:27). */
  def nextGameChain(schedule: DataFrame): DataFrame = {
    val perTeam = schedule.select(
      explode(array(col("home_team_id"), col("away_team_id"))).as("team_id"),
      col("game_id"), col("game_time"))
    val w = Window.partitionBy(col("team_id")).orderBy(col("game_time"), col("game_id"))
    perTeam.select(
      col("team_id"), col("game_id"), col("game_time"),
      lead(col("game_id"), 1).over(w).as("next_game_id"),
      (unix_micros(lead(col("game_time"), 1).over(w)) - unix_micros(col("game_time")))
        .as("time_since_us"))
  }
}
