package graft.graph

import graft.nba.{Edges, GamePipeline, Stints}
import graft.ops.TimeKernel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full `to_pyg` parity — the reference exporter's HeteroData
  * (`/root/reference/src/managers/game.py:324-656`): ten node types with
  * feature vectors and the 19 edge relations its tensors carry, as two
  * DataFrames (nodes + COO edges) directly consumable by a PyG loader.
  *
  * Faithful details:
  *   - foul/shot/freethrow node sets are RESTRICTED to actions whose
  *     actor resolved to a `PlayerStint` (the exporter's
  *     `MATCH (ps)-[:COMMITTED_FOUL|TOOK_SHOT]` heads, manager:519-653);
  *     assisted/blocked/drew/caused edges inherit that restriction via
  *     the `in ps_map` / `in foul_uids` guards (manager:545-551,
  *     604-610, 651-653).
  *   - `next` chains are per-ENTITY (same lineup / same player,
  *     game.py:184-205), `on_court_next` is the court-order chain
  *     (game.py:127-129).
  *   - features mirror manager:399-415 + 519-653: period `[n]`, stints
  *     `[global_clock, local_clock, duration]`, foul
  *     `[global_clock, local_clock]`, shot `[global_clock, local_clock,
  *     x, y, dist, is_2pt, is_3pt, is_made]`, freethrow `[global_clock, local_clock,
  *     is_made]`, constant `[1.0]` for game/team/lineup/player.
  *
  * Scale shape: every edge set is an equi-join or a single window; dense
  * ids are zipWithIndex per node type ([[GraphExport.denseIds]]); the
  * final COO translation is two hash joins against the node table.
  */
object PyGExport {

  /** (nodes, edges): nodes = (node_type, node_id, dense_id, feats);
    * edges = (rel_type, src_type, dst_type, src_id, dst_id, src_idx,
    * dst_idx). */
  private def timed[T](label: String)(f: => T): T =
    if (sys.env.contains("GRAFT_PROFILE")) {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile]   pyg.$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    } else f

  def build(p: GamePipeline.Result, gameTeams: DataFrame): (DataFrame, DataFrame) = {
    val stints = p.lineupStints
    val ps = p.playerStints
    val ev = p.attributedEvents

    // materialized eagerly: this frame feeds ~8 relation branches of one
    // final plan — a lazy cache would be recomputed concurrently by each
    // branch before any of them manages to populate it
    val actor = Edges.actorEdges(ev, ps)
      .filter(col("src_kind") === "player_stint")
      .cache()
    timed("actor.count")(actor.count())

    // exported action-node sets: only actions with a resolved PlayerStint
    // actor (manager:519-653 query heads)
    def actedOn(rel: String) = actor.filter(col("rel_type") === rel)
      .select(col("dst_action_id").as("action_id")).distinct()
    val foulNodes = ev.filter(col("action_type") === "foul")
      .join(actedOn("COMMITTED_FOUL"), Seq("action_id"), "left_semi")
    val tookShot = actedOn("TOOK_SHOT")
    val shotNodes = ev.filter(col("is_shot"))
      .join(tookShot, Seq("action_id"), "left_semi")
    val ftNodes = ev.filter(col("is_freethrow"))
      .join(tookShot, Seq("action_id"), "left_semi")

    val one = array(lit(1.0))
    def actionFeats(df: DataFrame, extra: Seq[org.apache.spark.sql.Column]) =
      df.select(col("action_id").cast("string").as("node_id"),
        array(Seq(col("global_clock"), TimeKernel.localClock(col("global_clock"))) ++
          extra: _*).as("feats"),
        col("action_id").as("__ord"))

    // (node_type, node_id, feats, __ord) — __ord keeps numeric key types
    // ordering numerically before ids become strings
    val nodeParts: Seq[(String, DataFrame)] = Seq(
      "game" -> gameTeams.select(col("game_id").cast("string").as("node_id"),
        one.as("feats"), col("game_id").cast("double").as("__ord")),
      "team" -> gameTeams
        .select(explode(array(col("home_team_id"), col("away_team_id"))).as("t"))
        .distinct()
        .select(col("t").cast("string").as("node_id"), one.as("feats"),
          col("t").cast("double").as("__ord")),
      "period" -> p.periods.select(col("period_id").as("node_id"),
        array(col("period").cast("double")).as("feats"), lit(0.0).as("__ord")),
      "lineup" -> stints.select(col("lineup_id")).distinct()
        .select(col("lineup_id").as("node_id"), one.as("feats"), lit(0.0).as("__ord")),
      "player" -> stints
        .select(explode(col("player_ids")).as("person_id")).distinct()
        .select(col("person_id").cast("string").as("node_id"), one.as("feats"),
          col("person_id").cast("double").as("__ord")),
      "lineup_stint" -> stints.select(col("stint_id").as("node_id"),
        array(col("start_clock"), TimeKernel.localClock(col("start_clock")),
          col("end_clock") - col("start_clock")).as("feats"),
        lit(0.0).as("__ord")),
      "player_stint" -> ps.select(col("player_stint_id").as("node_id"),
        array(col("start_clock"), TimeKernel.localClock(col("start_clock")),
          col("end_clock") - col("start_clock")).as("feats"),
        lit(0.0).as("__ord")),
      "foul" -> actionFeats(foulNodes, Nil)
        .select(col("node_id"), col("feats"), col("__ord").cast("double").as("__ord")),
      "shot" -> actionFeats(shotNodes, Seq(col("x"), col("y"), col("dist"),
        when(col("action_type") === "2pt", 1.0).otherwise(0.0),
        when(col("action_type") === "3pt", 1.0).otherwise(0.0),
        when(col("is_made"), 1.0).otherwise(0.0)))
        .select(col("node_id"), col("feats"), col("__ord").cast("double").as("__ord")),
      "freethrow" -> actionFeats(ftNodes,
        Seq(when(col("is_made"), 1.0).otherwise(0.0)))
        .select(col("node_id"), col("feats"), col("__ord").cast("double").as("__ord")))

    // one sort + one zipWithIndex for ALL ten types (not 2 jobs per
    // type); denseIdsByType returns a cached, already-materialized frame
    // (and releases its zipWithIndex intermediate), so the COO
    // translation's two scans (src + dst side) both hit the cache.
    // The unioned input is cached first: the global orderBy inside
    // denseIdsByType evaluates its child TWICE (range-partitioner
    // sampling pass + sort pass), and this child is a 10-branch union
    // with several joins — worth computing once
    val nodeInput = nodeParts
      .map { case (tpe, df) => df.withColumn("node_type", lit(tpe)) }
      .reduce(_ unionByName _).cache()
    val nodes = timed("denseIdsByType")(GraphExport.denseIdsByType(
      nodeInput, "node_type", Seq("__ord", "node_id"))
      .select(col("node_type"), col("node_id"), col("dense_id"), col("feats")))
    nodeInput.unpersist() // denseIdsByType materialized its result above

    // ---- edge relations (natural keys; COO translation below) ----
    // Lean assembly: every branch is map-only over a cached frame where
    // possible; set-semantics dedup happens ONCE on the unioned edge list
    // (all 19 relations are set-shaped); and the exported-node-set
    // restrictions (drew/assisted/blocked/caused only into exported
    // foul/shot/freethrow nodes) are enforced by the final INNER joins
    // against the node table — no per-relation semi-joins.
    def rel(relType: String, srcType: String, dstType: String,
        df: DataFrame): DataFrame =
      df.select(lit(relType).as("rel_type"), lit(srcType).as("src_type"),
        lit(dstType).as("dst_type"),
        col("src").cast("string").as("src_id"), col("dst").cast("string").as("dst_id"))

    def edgeSt(relType: String, srcType: String, dstType: String,
        src: org.apache.spark.sql.Column, dst: org.apache.spark.sql.Column) =
      struct(lit(relType).as("rel_type"), lit(srcType).as("src_type"),
        lit(dstType).as("dst_type"), src.cast("string").as("src_id"),
        dst.cast("string").as("dst_id"))

    // stint-sourced relations split by DEDUP NEED (r11, guide §2.3/§2.4):
    // the four stint_id-keyed relations are duplicate-free by
    // construction (one stint row ⇒ one edge each), so they bypass the
    // set-dedup shuffle entirely; only has_lineup/member_of (repeated
    // across stints of the same lineup) pay a distinct — over their own
    // small key space, not the full 363k-row edge union.
    val wLineup = Window.partitionBy(col("game_id"), col("lineup_id"))
      .orderBy(col("start_clock"))
    val wCourt = Window.partitionBy(col("game_id"), col("team_id"))
      .orderBy(col("stint_index"))
    val periodId = concat_ws("_", col("game_id"),
      TimeKernel.periodOfClock(col("start_clock")))
    val stintEdges = stints
      .withColumn("next_same_lineup", lead(col("stint_id"), 1).over(wLineup))
      .withColumn("next_on_court", lead(col("stint_id"), 1).over(wCourt))
      .select(explode(array(
          edgeSt("on_court", "lineup", "lineup_stint", col("lineup_id"), col("stint_id")),
          edgeSt("in_period", "lineup_stint", "period", col("stint_id"), periodId),
          edgeSt("next", "lineup_stint", "lineup_stint",
            col("stint_id"), col("next_same_lineup")),
          edgeSt("on_court_next", "lineup_stint", "lineup_stint",
            col("stint_id"), col("next_on_court")))).as("e"))
      .select(col("e.*"))
      .filter(col("dst_id").isNotNull)
    val stintMembershipEdges = stints
      .select(explode(concat(
        array(edgeSt("has_lineup", "team", "lineup",
          col("team_id"), col("lineup_id"))),
        transform(col("player_ids"), p =>
          edgeSt("member_of", "player", "lineup", p, col("lineup_id"))))).as("e"))
      .select(col("e.*"))
      .filter(col("dst_id").isNotNull)
      .distinct()

    // player-stint-sourced relations: one window lead + membership explode
    val wPlayer = Window.partitionBy(col("game_id"), col("person_id"))
      .orderBy(col("start_clock"))
    val psEdges = ps
      .withColumn("next_ps", lead(col("player_stint_id"), 1).over(wPlayer))
      .select(explode(concat(
        array(
          edgeSt("on_court", "player", "player_stint",
            col("person_id"), col("player_stint_id")),
          edgeSt("next", "player_stint", "player_stint",
            col("player_stint_id"), col("next_ps"))),
        transform(col("stint_ids"), ls =>
          edgeSt("on_court_with", "player_stint", "lineup_stint",
            col("player_stint_id"), ls)))).as("e"))
      .select(col("e.*"))
      .filter(col("dst_id").isNotNull)

    // actor-sourced relations: rel_type renamed by a when-chain — 4
    // relations, 1 branch (took_shot needs the shot/freethrow split, so
    // it keeps its own small join)
    val actorEdges = actor
      .filter(col("rel_type").isin("COMMITTED_FOUL", "DREW_FOUL", "ASSISTED", "BLOCKED"))
      .select(
        when(col("rel_type") === "COMMITTED_FOUL", "committed_foul")
          .when(col("rel_type") === "DREW_FOUL", "drew_foul")
          .when(col("rel_type") === "ASSISTED", "assisted")
          .otherwise(lit("blocked")).as("rel_type"),
        lit("player_stint").as("src_type"),
        when(col("rel_type").isin("COMMITTED_FOUL", "DREW_FOUL"), "foul")
          .otherwise(lit("shot")).as("dst_type"),
        col("src_id"),
        col("dst_action_id").cast("string").as("dst_id"))

    val tookShotEdges = actor.filter(col("rel_type") === "TOOK_SHOT")
      .join(ev.select(col("action_id").as("dst_action_id"), col("is_freethrow")),
        Seq("dst_action_id"))
      .select(lit("took_shot").as("rel_type"), lit("player_stint").as("src_type"),
        when(col("is_freethrow"), "freethrow").otherwise(lit("shot")).as("dst_type"),
        col("src_id"), col("dst_action_id").cast("string").as("dst_id"))

    // ps -> period: membership routed through the stint's period
    val stintPeriod = stints.select(col("stint_id"), periodId.as("period_id"))
    val psPeriodEdges = rel("in_period", "player_stint", "period", ps
      .select(col("player_stint_id").as("src"), explode(col("stint_ids")).as("stint_id"))
      .join(stintPeriod, Seq("stint_id"))
      .select(col("src"), col("period_id").as("dst")))

    // Branch-level set semantics replace the former GLOBAL distinct over
    // the whole edge union: every (rel_type, src_type, dst_type) combo
    // comes from exactly one branch, so union-all of internally-distinct
    // branches IS the distinct union — and the duplicate-free branches
    // (unique stint_id / player_stint_id / period_id / game row per edge
    // by construction) never enter a dedup shuffle at all. Dup-capable
    // branches (membership fan-outs, action-actor resolutions) keep
    // their own distinct over a far smaller frame.
    val edges: Seq[DataFrame] = Seq(
      gameTeams.select(explode(array(
        edgeSt("played_home", "team", "game", col("home_team_id"), col("game_id")),
        edgeSt("played_away", "team", "game", col("away_team_id"), col("game_id"))))
        .as("e")).select(col("e.*")),
      rel("in_game", "period", "game", p.periods
        .select(col("period_id").as("src"), col("game_id").as("dst"))),
      stintEdges, stintMembershipEdges, psEdges,
      psPeriodEdges.distinct(), actorEdges.distinct(), tookShotEdges.distinct(),
      rel("caused", "foul", "freethrow",
        Edges.caused(ev)
          .select(col("src_action_id").as("src"), col("dst_action_id").as("dst")))
        .distinct())

    val idx = nodes.select(col("node_type"), col("node_id"), col("dense_id"))
    val allEdges = edges.reduce(_ unionByName _)
    if (sys.env.contains("GRAFT_PROFILE")) {
      timed("stintEdges.count")(stintEdges.count())
      timed("psEdges.count")(psEdges.count())
      timed("actorEdges.count")(actorEdges.count())
      timed("tookShotEdges.count")(tookShotEdges.count())
      timed("psPeriodEdges.count")(psPeriodEdges.count())
      timed("allEdges.count")(allEdges.count())
    }
    val src = idx.select(col("node_type").as("src_type"), col("node_id").as("src_id"),
      col("dense_id").as("src_idx"))
    val dst = idx.select(col("node_type").as("dst_type"), col("node_id").as("dst_id"),
      col("dense_id").as("dst_idx"))
    // cached: the COO frame is the product of the whole edge assembly —
    // three consumers (edge export, node-feature query, BFS analytics)
    // each re-deriving it would pay the full union+distinct+join chain
    val coo = allEdges
      .join(src, Seq("src_type", "src_id"))
      .join(dst, Seq("dst_type", "dst_id"))
      .select(col("rel_type"), col("src_type"), col("dst_type"),
        col("src_id"), col("dst_id"), col("src_idx"), col("dst_idx"))
      .cache()
    (nodes, coo)
  }
}
