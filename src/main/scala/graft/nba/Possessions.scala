package graft.nba

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Possession segmentation — the reference DECLARES the `Possession`
  * entity (unique constraint + start_time/global_clock indexes,
  * `/root/reference/src/queries/setup.py:18,32-33`) but no query ever
  * creates one; we implement the documented intent (the §2.11
  * fix-not-port rule), with standard basketball semantics: a possession
  * ends at a made shot (for free-throw trips, the made LAST attempt), a
  * turnover, or a defensive rebound, and never crosses a period boundary.
  *
  * Shape: one window pass over the priority-ordered timeline — the cut
  * flag looks one row back (lag), the possession ordinal is a running
  * sum, and the roll-up is a single groupBy on (game, ordinal). Linear,
  * partitioned by game, no cross-game state.
  */
object Possessions {

  /** Segment the per-game action timeline (the output of
    * [[Events.timeline]]) into possessions. Output: one row per
    * possession with interval, event count, points, and the side of its
    * first action. */
  def segments(timeline: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("game_id")).orderBy(col("seq"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val endFlag =
      (col("is_shot") && col("is_made")) ||
        (col("is_last_ft") && col("is_made")) ||
        col("action_type") === "turnover" ||
        col("rebound_defensive")
    // a new possession starts after an ending event or on a period change
    val cut =
      when(coalesce(lag(endFlag, 1).over(w), lit(false)) ||
        col("period") =!= lag(col("period"), 1).over(w), 1L).otherwise(0L)
    timeline
      .withColumn("__cut", cut)
      .withColumn("pid", sum(col("__cut")).over(run) + 1)
      .groupBy(col("game_id"), col("pid"))
      .agg(
        min(col("period")).as("period"),
        min(col("order_clock")).as("start_clock"),
        max(col("order_clock")).as("end_clock"),
        count(lit(1)).as("n_events"),
        sum(col("points")).cast("long").as("points"),
        min_by(col("team_id"), col("seq")).as("first_team_id"))
      .select(col("game_id"),
        concat_ws("_", col("game_id"), col("pid")).as("possession_id"),
        col("pid").as("possession_index"),
        col("period").cast("long").as("period"),
        col("start_clock"), col("end_clock"),
        col("n_events"), col("points"), col("first_team_id"))
  }
}
