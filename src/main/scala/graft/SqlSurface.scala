package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first entry point: register the testdata tables as temp views so
  * the whole engine is equally usable via `spark.sql(...)` — the
  * DataFrame programs in `graft.queries` and ANSI SQL over these views
  * are two spellings of the same Catalyst plans (SqlSurfaceSpec asserts
  * result equality on representative queries).
  */
object SqlSurface {

  /** Register every testdata table of `dir` as a temp view named after
    * the table. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }

  /** Register the domain engine's materializations as temp views: the
    * whole game pipeline (periods, stints, attribution, scores,
    * plus-minus, actor edges, PyG export) becomes queryable with plain
    * `spark.sql` — the SQL-first spelling of `graft.nba` / `graft.graph`.
    */
  def registerDomainViews(spark: SparkSession, dir: String): Unit = {
    val p = queries.Domain.pipeline(spark, dir)
    val (pygNodes, pygEdges) = queries.Domain.pyg(spark, dir)
    Seq(
      "game_periods" -> p.periods,
      "lineup_stints" -> p.lineupStints,
      "player_stints" -> p.playerStints,
      "attributed_events" -> p.attributedEvents,
      "score_chain" -> p.scoreChain,
      "stint_plus_minus" -> p.stintPlusMinus,
      "player_plus_minus" -> p.playerPlusMinus,
      "rebound_links" -> p.reboundLinks,
      "game_timeline" -> p.timeline,
      "actor_edges" -> graft.nba.Edges.actorEdges(p.attributedEvents, p.playerStints),
      "pyg_nodes" -> pygNodes,
      "pyg_edges" -> pygEdges
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
