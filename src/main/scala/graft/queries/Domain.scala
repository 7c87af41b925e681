package graft.queries

import graft.Q
import graft.nba.{Fixture, GamePipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Domain-engine queries: the full game pipeline (stint fold → as-of
  * attribution → score chain → plus-minus) run on the built-in
  * deterministic fixture game. Rows-only checks (the fixture is not one
  * of the driver's parquet tables, so no DuckDB oracle) — deep value
  * correctness is pinned by GamePipelineSpec's hand-computed goldens.
  */
object Domain {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, GamePipeline.Result]()

  private def pipeline(s: SparkSession): GamePipeline.Result =
    cache.computeIfAbsent(s, (s2: SparkSession) => GamePipeline.run(
      s2, Fixture.pbp(s2), Fixture.starters(s2), Fixture.gameTeams(s2), Fixture.gameEnd(s2)))

  val q60StintPlusMinus: Q = Q.rowsOnly(
    "q60_stint_plusminus",
    "lineup stints with plus-minus (SURVEY §7.2 flagship slice)") { (s, _) =>
    pipeline(s).stintPlusMinus.select(
      col("game_id"), col("team_id"), col("stint_id"), col("lineup_id"),
      col("start_clock"), col("end_clock"),
      col("pts_for"), col("pts_against"), col("plus_minus"))
  }

  val q61ScoreChain: Q = Q.rowsOnly(
    "q61_score_chain",
    "running score reconstruction with NEXT links") { (s, _) =>
    pipeline(s).scoreChain
  }

  val q62PlayerStints: Q = Q.rowsOnly(
    "q62_player_stints",
    "player-stint sessionization with rolled-up plus-minus") { (s, _) =>
    val p = pipeline(s)
    p.playerStints.join(
      p.playerPlusMinus.select(col("player_stint_id"), col("plus_minus")),
      Seq("player_stint_id"), "left_outer")
      .drop("stint_ids")
  }

  /** Season-scale run: 50 generated games through the full pipeline in
    * one partitioned plan; output is the per-game reconciliation of
    * Σ stint plus-minus against the final score margin — `ok` must be
    * true for every game (the SURVEY §5.2.3 invariant, at season shape).
    */
  val q63SeasonInvariant: Q = Q.rowsOnly(
    "q63_season_invariant",
    "50-game season: sum(stint +-) == final margin per game") { (s, _) =>
    val r = graft.nba.SeasonFixture.pipeline(s, 50)
    val pmByTeam = r.stintPlusMinus
      .groupBy(col("game_id"), col("team_id"))
      .agg(sum(col("plus_minus")).as("pm_sum"))
    val finalMargin = r.scoreChain
      .groupBy(col("game_id"))
      .agg(max_by(col("margin"), struct(col("clock"), col("score_id"))).as("final_margin"))
    val teams = graft.nba.SeasonFixture.gameTeams(s, 50)
    pmByTeam
      .join(teams, Seq("game_id"))
      .withColumn("is_home", col("team_id") === col("home_team_id"))
      .join(finalMargin, Seq("game_id"))
      .withColumn("expected",
        when(col("is_home"), col("final_margin")).otherwise(-col("final_margin")))
      .select(col("game_id"), col("team_id"), col("pm_sum"),
        col("expected"), (col("pm_sum") === col("expected")).as("ok"))
  }

  /** Graph export (SURVEY S10/§3.3): the fixture game's stint graph as
    * dense-id COO edge frames — NEXT chains between lineup stints and
    * ON_COURT_WITH membership (player-stint → lineup-stint), the
    * PyG-consumable layout. */
  val q64GraphExport: Q = Q.rowsOnly(
    "q64_graph_export",
    "dense-id COO edge export of the fixture game graph") { (s, _) =>
    import graft.graph.GraphExport
    val p = pipeline(s)
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

  val all: Seq[Q] =
    Seq(q60StintPlusMinus, q61ScoreChain, q62PlayerStints, q63SeasonInvariant,
      q64GraphExport)
}
