package graft.queries

import graft.Q
import graft.nba.{GameFeed, GamePipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-engine queries, oracle-gated end to end: the full game pipeline
  * (periods → stint fold → as-of attribution → score chain → plus-minus →
  * COO export) runs on games DERIVED from the driver's `events.parquet`
  * via the closed-form mapping in [[graft.nba.GameFeed]], and each query
  * carries DuckDB SQL that re-derives the same result independently (the
  * lineup fold's output is closed-form under the feed's rotation scheme —
  * see GameFeed's scaladoc). Deep fixture-level semantics (same-clock
  * batching, rebound claims, OT clocks) stay pinned by GamePipelineSpec.
  */
object Domain {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), GamePipeline.Result]()

  private[graft] def pipeline(s: SparkSession, dir: String): GamePipeline.Result =
    cache.computeIfAbsent((s, dir), { case (s2, d2) =>
      GamePipeline.run(s2, GameFeed.pbp(s2, d2), GameFeed.starters(s2, d2),
        GameFeed.gameTeams(s2, d2))
    })

  /** Shared oracle CTEs mirroring GameFeed's mapping: the derived event
    * base, game ends, swap ordinals, stint tiling (closed-form lineups),
    * scoring rows, per-stint plus-minus, and player on-court runs. */
  private val PRELUDE =
    """WITH base AS (
      |  SELECT user_id AS game_id, event_id, event_type, value,
      |         30.0 * row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS clock,
      |         user_id % 4 + 1 AS home_team_id,
      |         (user_id + 1) % 4 + 1 AS away_team_id,
      |         CASE WHEN event_id % 2 = 0 THEN user_id % 4 + 1
      |              ELSE (user_id + 1) % 4 + 1 END AS team_id,
      |         CASE WHEN event_id % 2 = 0 THEN (user_id + 1) % 4 + 1
      |              ELSE user_id % 4 + 1 END AS opp_id
      |  FROM events
      |),
      |gend AS (
      |  SELECT game_id, max(clock) + 30.0 AS game_end, max(clock) AS max_clock
      |  FROM base GROUP BY 1
      |),
      |subk AS (
      |  SELECT game_id, team_id, clock,
      |         row_number() OVER (PARTITION BY game_id, team_id ORDER BY clock) AS k
      |  FROM base WHERE event_type = 'signup'
      |),
      |teams2 AS (
      |  SELECT DISTINCT game_id, home_team_id AS team_id FROM base
      |  UNION ALL
      |  SELECT DISTINCT game_id, away_team_id FROM base
      |),
      |bounds AS (
      |  SELECT game_id, team_id, clock, k FROM subk
      |  UNION ALL
      |  SELECT game_id, team_id, 0.0, CAST(0 AS BIGINT) FROM teams2
      |),
      |st AS (
      |  SELECT b.game_id, b.team_id,
      |         CAST(b.game_id AS VARCHAR) || '_' || CAST(b.team_id AS VARCHAR)
      |           || '_' || CAST(b.k AS VARCHAR) AS stint_id,
      |         b.k AS j, b.clock AS start_clock,
      |         coalesce(lead(b.clock) OVER (PARTITION BY b.game_id, b.team_id ORDER BY b.clock),
      |                  g.game_end) AS end_clock
      |  FROM bounds b JOIN gend g USING (game_id)
      |),
      |mem AS (
      |  SELECT st.*, st.team_id * 100 + (st.j + i.i) % 10 AS person_id
      |  FROM st CROSS JOIN (SELECT unnest(range(5)) AS i) i
      |),
      |lu AS (
      |  SELECT stint_id, array_to_string(list_sort(list(person_id)), '_') AS lineup_id
      |  FROM mem GROUP BY 1
      |),
      |sc AS (
      |  SELECT game_id, home_team_id, away_team_id, team_id, clock,
      |         2 AS pts, event_id * 4 AS score_id, clock AS oclock
      |  FROM base WHERE event_type = 'click' AND value >= 100.0
      |  UNION ALL
      |  SELECT game_id, home_team_id, away_team_id, team_id, clock,
      |         3, event_id * 4, clock
      |  FROM base WHERE event_type = 'purchase' AND value >= 100.0
      |  UNION ALL
      |  SELECT game_id, home_team_id, away_team_id, opp_id, clock,
      |         1, event_id * 4 + a.i, clock + a.i * CAST(0.1 AS DOUBLE)
      |  FROM base CROSS JOIN (SELECT unnest([1, 2]) AS i) a
      |  WHERE event_type = 'view' AND value < 150.0 AND (event_id + a.i) % 2 = 0
      |),
      |spm AS (
      |  SELECT st.game_id, st.team_id, st.stint_id, st.j, st.start_clock, st.end_clock,
      |         CAST(coalesce(sum(CASE WHEN sc.team_id = st.team_id THEN sc.pts END), 0) AS BIGINT) AS pts_for,
      |         CAST(coalesce(sum(CASE WHEN sc.team_id <> st.team_id THEN sc.pts END), 0) AS BIGINT) AS pts_against
      |  FROM st LEFT JOIN sc
      |    ON sc.game_id = st.game_id
      |   AND sc.clock >= st.start_clock AND sc.clock < st.end_clock
      |  GROUP BY st.game_id, st.team_id, st.stint_id, st.j, st.start_clock, st.end_clock
      |),
      |pev AS (
      |  SELECT game_id, team_id, team_id * 100 + i.i AS person_id, 0.0 AS clock, 1 AS d
      |  FROM teams2 CROSS JOIN (SELECT unnest(range(5)) AS i) i
      |  UNION ALL
      |  SELECT game_id, team_id, team_id * 100 + (k - 1) % 10, clock, -1 FROM subk
      |  UNION ALL
      |  SELECT game_id, team_id, team_id * 100 + (k + 4) % 10, clock, 1 FROM subk
      |),
      |runs0 AS (
      |  SELECT game_id, team_id, person_id, clock, d,
      |         lead(clock) OVER (PARTITION BY game_id, person_id ORDER BY clock) AS nxt,
      |         row_number() OVER (PARTITION BY game_id, person_id ORDER BY clock) AS rn
      |  FROM pev
      |),
      |runs AS (
      |  SELECT r.game_id, r.team_id, r.person_id, (r.rn + 1) // 2 AS run_id,
      |         r.clock AS start_clock, coalesce(r.nxt, g.game_end) AS end_clock,
      |         CAST(r.game_id AS VARCHAR) || '_' || CAST(r.person_id AS VARCHAR)
      |           || '_' || CAST((r.rn + 1) // 2 AS VARCHAR) AS player_stint_id
      |  FROM runs0 r JOIN gend g USING (game_id) WHERE r.d = 1
      |)
      |""".stripMargin

  /** Lineup stints with plus-minus — SURVEY §7.2's flagship slice, now on
    * the events-derived feed with a full DuckDB recomputation as oracle. */
  val q60StintPlusMinus: Q = Q.sql(
    "q60_stint_plusminus",
    PRELUDE +
      """SELECT s.game_id, s.team_id, s.stint_id, lu.lineup_id,
        |       s.start_clock, s.end_clock, s.pts_for, s.pts_against,
        |       s.pts_for - s.pts_against AS plus_minus
        |FROM spm s JOIN lu USING (stint_id)""".stripMargin,
    "lineup stints with plus-minus over the events-derived feed") { (s, dir) =>
    pipeline(s, dir).stintPlusMinus.select(
      col("game_id"), col("team_id"), col("stint_id"), col("lineup_id"),
      col("start_clock"), col("end_clock"),
      col("pts_for"), col("pts_against"), col("plus_minus"))
  }

  val q61ScoreChain: Q = Q.sql(
    "q61_score_chain",
    PRELUDE +
      """SELECT game_id, CAST(p AS BIGINT) AS period, score_id, team_id,
        |       CAST(pts AS BIGINT) AS points, oclock AS clock,
        |       CAST(hs AS BIGINT) AS home_score,
        |       CAST(aw AS BIGINT) AS away_score,
        |       CAST(hs - aw AS BIGINT) AS margin,
        |       CAST(phs AS BIGINT) AS period_home_score,
        |       CAST(pas AS BIGINT) AS period_away_score,
        |       next_score_id
        |FROM (
        |  SELECT *,
        |         sum(CASE WHEN team_id = home_team_id THEN pts ELSE 0 END)
        |           OVER wg AS hs,
        |         sum(CASE WHEN team_id = away_team_id THEN pts ELSE 0 END)
        |           OVER wg AS aw,
        |         sum(CASE WHEN team_id = home_team_id THEN pts ELSE 0 END)
        |           OVER wp AS phs,
        |         sum(CASE WHEN team_id = away_team_id THEN pts ELSE 0 END)
        |           OVER wp AS pas,
        |         lead(score_id) OVER (PARTITION BY game_id ORDER BY oclock, score_id)
        |           AS next_score_id
        |  FROM (
        |    SELECT *,
        |           CASE WHEN clock < 2880 THEN CAST(floor(clock / 720) AS INT) + 1
        |                ELSE 5 + CAST(floor((clock - 2880) / 300) AS INT) END AS p
        |    FROM sc)
        |  WINDOW
        |    wg AS (PARTITION BY game_id ORDER BY oclock, score_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wp AS (PARTITION BY game_id, p ORDER BY oclock, score_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)""".stripMargin,
    "running score reconstruction with NEXT links (A6/W7 windows)") { (s, dir) =>
    pipeline(s, dir).scoreChain
      .withColumn("period", col("period").cast("long"))
      .withColumn("points", col("points").cast("long"))
  }

  val q62PlayerStints: Q = Q.sql(
    "q62_player_stints",
    PRELUDE +
      """SELECT r.game_id, r.team_id, r.person_id, r.run_id,
        |       r.start_clock, r.end_clock,
        |       CAST(count(s.stint_id) AS BIGINT) AS n_lineup_stints,
        |       r.player_stint_id,
        |       CAST(sum(s.pts_for - s.pts_against) AS BIGINT) AS plus_minus
        |FROM runs r JOIN spm s
        |  ON s.game_id = r.game_id AND s.team_id = r.team_id
        | AND s.start_clock >= r.start_clock AND s.start_clock < r.end_clock
        |GROUP BY r.game_id, r.team_id, r.person_id, r.run_id,
        |         r.start_clock, r.end_clock, r.player_stint_id""".stripMargin,
    "player-stint sessionization with rolled-up plus-minus") { (s, dir) =>
    val p = pipeline(s, dir)
    p.playerStints.join(
      p.playerPlusMinus.select(col("player_stint_id"), col("plus_minus")),
      Seq("player_stint_id"), "left_outer")
      .drop("stint_ids")
      .select(col("game_id"), col("team_id"), col("person_id"), col("run_id"),
        col("start_clock"), col("end_clock"), col("n_lineup_stints"),
        col("player_stint_id"), col("plus_minus"))
  }

  /** Season-scale invariant over every derived game: Σ stint plus-minus
    * per team must equal the signed final margin (SURVEY §5.2.3). */
  val q63SeasonInvariant: Q = Q.sql(
    "q63_season_invariant",
    PRELUDE +
      """, tm AS (
        |  SELECT game_id, team_id,
        |         CAST(sum(pts_for - pts_against) AS BIGINT) AS pm_sum
        |  FROM spm GROUP BY 1, 2
        |),
        |mg AS (
        |  SELECT game_id,
        |         CAST(sum(CASE WHEN team_id = home_team_id THEN pts ELSE -pts END) AS BIGINT) AS m
        |  FROM sc GROUP BY 1
        |)
        |SELECT t.game_id, t.team_id, t.pm_sum,
        |       CAST(CASE WHEN t.team_id = t.game_id % 4 + 1
        |                 THEN coalesce(mg.m, 0) ELSE -coalesce(mg.m, 0) END AS BIGINT) AS expected,
        |       t.pm_sum = (CASE WHEN t.team_id = t.game_id % 4 + 1
        |                        THEN coalesce(mg.m, 0) ELSE -coalesce(mg.m, 0) END) AS ok
        |FROM tm t LEFT JOIN mg USING (game_id)""".stripMargin,
    "per game: sum(stint +-) == signed final margin, as data") { (s, dir) =>
    val p = pipeline(s, dir)
    val teams = GameFeed.gameTeams(s, dir)
    val pm = p.stintPlusMinus
      .groupBy(col("game_id"), col("team_id"))
      .agg(sum(col("plus_minus")).as("pm_sum"))
    val margin = p.scoreChain
      .join(teams, Seq("game_id"))
      .groupBy(col("game_id"))
      .agg(sum(when(col("team_id") === col("home_team_id"), col("points"))
        .otherwise(-col("points"))).as("final_margin"))
    pm.join(teams, Seq("game_id"))
      .join(margin, Seq("game_id"), "left_outer")
      .withColumn("final_margin", coalesce(col("final_margin"), lit(0L)))
      .withColumn("expected",
        when(col("team_id") === col("home_team_id"), col("final_margin"))
          .otherwise(-col("final_margin")))
      .select(col("game_id"), col("team_id"), col("pm_sum"),
        col("expected"), (col("pm_sum") === col("expected")).as("ok"))
  }

  /** Dense-id COO export of the feed's stint graph (S10/§3.3): NEXT
    * chains + ON_COURT_WITH membership, dense ids ordered by natural key
    * — the oracle re-derives both edge sets and the id assignment. */
  val q64GraphExport: Q = Q.sql(
    "q64_graph_export",
    PRELUDE +
      """, sid AS (
        |  SELECT stint_id, row_number() OVER (ORDER BY stint_id) - 1 AS dense_id FROM st
        |),
        |pid AS (
        |  SELECT player_stint_id, row_number() OVER (ORDER BY player_stint_id) - 1 AS dense_id
        |  FROM runs
        |),
        |nextE AS (
        |  SELECT a.stint_id AS src, b.stint_id AS dst
        |  FROM st a JOIN st b
        |    ON a.game_id = b.game_id AND a.team_id = b.team_id AND b.j = a.j + 1
        |),
        |ocwE AS (
        |  SELECT r.player_stint_id AS src, s.stint_id AS dst
        |  FROM runs r JOIN st s
        |    ON s.game_id = r.game_id AND s.team_id = r.team_id
        |   AND s.start_clock >= r.start_clock AND s.start_clock < r.end_clock
        |)
        |SELECT 'NEXT' AS rel_type, sa.dense_id AS src_idx, sb.dense_id AS dst_idx
        |FROM nextE e JOIN sid sa ON sa.stint_id = e.src JOIN sid sb ON sb.stint_id = e.dst
        |UNION ALL
        |SELECT 'ON_COURT_WITH', p.dense_id, s.dense_id
        |FROM ocwE e JOIN pid p ON p.player_stint_id = e.src JOIN sid s ON s.stint_id = e.dst""".stripMargin,
    "dense-id COO edge export (NEXT + ON_COURT_WITH)") { (s, dir) =>
    import graft.graph.GraphExport
    val p = pipeline(s, dir)
    val stints = GraphExport.denseIds(p.lineupStints, Seq("stint_id"))
    val playerStints = GraphExport.denseIds(p.playerStints, Seq("player_stint_id"))
    val next = GraphExport.cooEdges(
      graft.nba.Stints.stintChains(p.lineupStints), "stint_id", "next_stint_id",
      stints, "stint_id", stints, "stint_id")
      .withColumn("rel_type", lit("NEXT"))
    val onCourtWith = GraphExport.cooEdges(
      p.playerStints.select(col("player_stint_id"), explode(col("stint_ids")).as("ls_id")),
      "player_stint_id", "ls_id",
      playerStints, "player_stint_id", stints, "stint_id")
      .withColumn("rel_type", lit("ON_COURT_WITH"))
    next.unionByName(onCourtWith)
      .select(col("rel_type"), col("src_idx"), col("dst_idx"))
  }

  /** Periods pipeline (reference game.py:11-51 + manager:126-135): bounds
    * from PBP period events, Q/OT labels, NEXT chain — oracle re-derives
    * the tiling closed-form from each game's event count. */
  val q66Periods: Q = Q.sql(
    "q66_periods",
    PRELUDE +
      """, np AS (
        |  SELECT game_id, game_end,
        |         CASE WHEN max_clock < 2880 THEN CAST(floor(max_clock / 720) AS INT) + 1
        |              ELSE 5 + CAST(floor((max_clock - 2880) / 300) AS INT) END AS n_periods
        |  FROM gend
        |),
        |per AS (
        |  SELECT game_id, CAST(p.p AS INT) AS period, game_end, n_periods,
        |         CASE WHEN p.p <= 4 THEN (p.p - 1) * 720.0
        |              ELSE 2880.0 + (p.p - 5) * 300.0 END AS start_clock,
        |         CASE WHEN p.p < n_periods THEN
        |                CASE WHEN p.p < 4 THEN p.p * 720.0
        |                     ELSE 2880.0 + (p.p - 4) * 300.0 END
        |              ELSE game_end END AS end_clock
        |  FROM np CROSS JOIN (SELECT unnest(range(1, 13)) AS p) p
        |  WHERE p.p <= n_periods
        |)
        |SELECT game_id, CAST(period AS BIGINT) AS period,
        |       CAST(game_id AS VARCHAR) || '_' || CAST(period AS VARCHAR) AS period_id,
        |       start_clock, end_clock,
        |       CASE WHEN period <= 4 THEN 'Q' || CAST(period AS VARCHAR) ELSE 'OT' END AS label,
        |       period > 4 AS is_overtime,
        |       lead(CAST(game_id AS VARCHAR) || '_' || CAST(period AS VARCHAR))
        |         OVER (PARTITION BY game_id ORDER BY period) AS next_period_id,
        |       lead(start_clock) OVER (PARTITION BY game_id ORDER BY period) - start_clock
        |         AS time_delta
        |FROM per""".stripMargin,
    "period bounds/labels/NEXT derived from PBP period events") { (s, dir) =>
    pipeline(s, dir).periods
      .withColumn("period", col("period").cast("long"))
      .select(col("game_id"), col("period"), col("period_id"),
        col("start_clock"), col("end_clock"), col("label"),
        col("is_overtime"), col("next_period_id"), col("time_delta"))
  }

  /** Season schedule NEXT chain (reference season.py:19-27): each team's
    * games ordered by start time, linked with `time_since` (µs). */
  val q65SeasonChain: Q = Q.sql(
    "q65_season_chain",
    """WITH sched AS (
      |  SELECT user_id AS game_id, min(ts) AS game_time,
      |         user_id % 4 + 1 AS home_team_id,
      |         (user_id + 1) % 4 + 1 AS away_team_id
      |  FROM events GROUP BY 1, 3, 4
      |),
      |per_team AS (
      |  SELECT home_team_id AS team_id, game_id, game_time FROM sched
      |  UNION ALL
      |  SELECT away_team_id, game_id, game_time FROM sched
      |)
      |SELECT team_id, game_id, game_time,
      |       lead(game_id) OVER w AS next_game_id,
      |       epoch_us(lead(game_time) OVER w) - epoch_us(game_time) AS time_since_us
      |FROM per_team
      |WINDOW w AS (PARTITION BY team_id ORDER BY game_time, game_id)""".stripMargin,
    "per-team game NEXT chain with time_since (W1 over the schedule)") { (s, dir) =>
    graft.nba.Season.nextGameChain(GameFeed.schedule(s, dir))
  }

  val all: Seq[Q] =
    Seq(q60StintPlusMinus, q61ScoreChain, q62PlayerStints, q63SeasonInvariant,
      q64GraphExport, q65SeasonChain, q66Periods)
}
