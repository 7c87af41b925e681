package graft.nba

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Season-shape test: the full pipeline over many generated games in one
  * partitioned plan, with the per-game invariants asserted game by game.
  */
class SeasonSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("20-game season: plus-minus reconciles with margins for every game") {
    val n = 20
    val r = SeasonFixture.pipeline(spark, n)
    val pm = r.stintPlusMinus
      .groupBy("game_id", "team_id").agg(sum("plus_minus").as("pm"))
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val margins = r.scoreChain
      .groupBy(col("game_id"))
      .agg(max_by(col("margin"), struct(col("clock"), col("score_id"))).as("m"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    assert(margins.size == n)
    for (g <- 1 to n) {
      val gid = g.toLong
      assert(pm((gid, SeasonFixture.homeTeam(gid))) == margins(gid),
        s"game $gid home pm != margin")
      assert(pm((gid, SeasonFixture.awayTeam(gid))) == -margins(gid),
        s"game $gid away pm != -margin")
    }
  }

  test("20-game season: stints tile every (game, team) exactly") {
    val r = SeasonFixture.pipeline(spark, 20)
    val bad = r.lineupStints
      .groupBy("game_id", "team_id")
      .agg(
        min("start_clock").as("first"),
        max("end_clock").as("last"),
        sum(col("end_clock") - col("start_clock")).as("covered"))
      .filter(col("first") =!= 0.0 || col("last") =!= SeasonFixture.GameLen ||
        col("covered") =!= SeasonFixture.GameLen)
      .count()
    assert(bad == 0)
  }
}
