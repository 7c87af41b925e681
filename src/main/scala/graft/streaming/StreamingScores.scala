package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming score reconstruction — the reference's running-total fold
  * with per-period partials (A6/W7, `/root/reference/src/queries/
  * game.py:641-707`) hosted on `flatMapGroupsWithState`: scoring events
  * stream in per game, cumulative Score rows stream out. The batch twin
  * is `graft.nba.Scores.scoreChain`; StreamingScoresSpec asserts they
  * agree.
  *
  * Ordering contract: like the reference's polled live-PBP loop (and
  * [[StreamingStints]]), the feed is append-only in event-time per game —
  * events are processed sorted within each micro-batch, and state is the
  * O(1) running totals, so a season of games holds #games × 4 longs of
  * state regardless of data volume.
  */
object StreamingScores {

  /** One scoring event (points > 0 rows of the enriched stream). */
  case class ScoringEvent(
      game_id: Long, action_id: Long, period: Int, order_clock: Double,
      is_home: Boolean, points: Int)

  /** Cumulative score row — the streaming spelling of a scoreChain row. */
  case class ScoreRow(
      game_id: Long, score_id: Long, period: Int, clock: Double,
      points: Long, home_score: Long, away_score: Long, margin: Long,
      period_home_score: Long, period_away_score: Long)

  case class ScoreState(
      home: Long, away: Long,
      period: Int, periodHome: Long, periodAway: Long)

  private[streaming] def step(
      gameId: Long, events: Seq[ScoringEvent], start: ScoreState): (ScoreState, Seq[ScoreRow]) = {
    var st = start
    val out = Seq.newBuilder[ScoreRow]
    for (e <- events.sortBy(e => (e.order_clock, e.action_id))) {
      // per-period partials reset at the period boundary (the reference's
      // explicit reduce() reset; the batch twin's window partition)
      if (e.period != st.period)
        st = st.copy(period = e.period, periodHome = 0L, periodAway = 0L)
      st =
        if (e.is_home)
          st.copy(home = st.home + e.points, periodHome = st.periodHome + e.points)
        else
          st.copy(away = st.away + e.points, periodAway = st.periodAway + e.points)
      out += ScoreRow(gameId, e.action_id, e.period, e.order_clock, e.points.toLong,
        st.home, st.away, st.home - st.away, st.periodHome, st.periodAway)
    }
    (st, out.result())
  }

  /** Streaming transform: `readStream` of scoring events → cumulative
    * Score rows, one state per game. */
  def scoreRows(events: Dataset[ScoringEvent]): Dataset[ScoreRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.game_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (gameId: Long, it: Iterator[ScoringEvent], state: GroupState[ScoreState]) => {
          val st = state.getOption.getOrElse(ScoreState(0L, 0L, -1, 0L, 0L))
          val (next, rows) = step(gameId, it.toSeq, st)
          state.update(next)
          rows.iterator
        })
  }
}
