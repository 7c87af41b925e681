package graft.nba

import graft.nba.Model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic multi-game season generator: N independent games of
  * legal substitution streams + scoring events, seeded per game. This is
  * the scale-shape of the real workload (SURVEY §4.3: ~1,230 independent
  * games per season — embarrassing parallelism on `game_id`): the
  * pipeline runs all games in one partitioned plan, and the per-game
  * invariants (Σ stint ± = margin, stint tiling) hold for every game.
  */
object SeasonFixture {

  val GameLen = 1440.0

  def homeTeam(gameId: Long): Long = 1000 + gameId * 2
  def awayTeam(gameId: Long): Long = 1001 + gameId * 2

  /** One game's rows: (pbp actions incl. subs, starters). */
  def game(gameId: Long): (Seq[PbpAction], Seq[Starter]) = {
    val rnd = new scala.util.Random(7000 + gameId)
    val teams = Seq(homeTeam(gameId), awayTeam(gameId))
    val starters = teams.flatMap { t =>
      (1L to 5L).map(p => Starter(gameId, t, t * 100 + p))
    }
    var actionId = 0L
    def nextId(): Long = { actionId += 1; actionId }
    val actions = Seq.newBuilder[PbpAction]

    // substitution stream: random legal swaps per team
    for (t <- teams) {
      var onCourt = (1L to 5L).map(p => t * 100 + p).toSet
      var bench = (6L to 9L).map(p => t * 100 + p).toSet
      var clock = 0.0
      while ({ clock += 30.0 + rnd.nextInt(120); clock < GameLen }) {
        val outP = onCourt.toSeq.sorted.apply(rnd.nextInt(5))
        val inP = bench.toSeq.sorted.apply(rnd.nextInt(bench.size))
        onCourt = onCourt - outP + inP
        bench = bench - inP + outP
        val period = (clock / 720.0).toInt + 1
        actions += PbpAction(gameId, nextId(), period, clock, "substitution",
          Some("out"), None, None, Some(t), Some(outP),
          None, None, None, None)
        actions += PbpAction(gameId, nextId(), period, clock, "substitution",
          Some("in"), None, None, Some(t), Some(inP),
          None, None, None, None)
      }
    }

    // scoring stream: alternating-ish shots
    var clock = 0.0
    while ({ clock += 15.0 + rnd.nextInt(30); clock < GameLen }) {
      val t = teams(rnd.nextInt(2))
      val three = rnd.nextInt(3) == 0
      val made = rnd.nextInt(10) < 5
      val period = (clock / 720.0).toInt + 1
      actions += PbpAction(gameId, nextId(), period, clock,
        if (three) "3pt" else "2pt", None, None,
        Some(if (made) "Made" else "Missed"),
        Some(t), Some(t * 100 + 1 + rnd.nextInt(9)),
        None, None, None, None)
    }
    // period bracket rows: two 720 s halves (Periods derives bounds)
    for (p <- 1 to 2) {
      actions += PbpAction(gameId, nextId(), p, (p - 1) * 720.0, "period",
        Some("start"), None, None, None, None, None, None, None, None)
      actions += PbpAction(gameId, nextId(), p, p * 720.0, "period",
        Some("end"), None, None, None, None, None, None, None, None)
    }
    (actions.result(), starters)
  }

  def pbp(spark: SparkSession, nGames: Int): Dataset[PbpAction] = {
    import spark.implicits._
    (1 to nGames).flatMap(g => game(g.toLong)._1).toDS()
  }

  def starters(spark: SparkSession, nGames: Int): Dataset[Starter] = {
    import spark.implicits._
    (1 to nGames).flatMap(g => game(g.toLong)._2).toDS()
  }

  def gameTeams(spark: SparkSession, nGames: Int): DataFrame = {
    import spark.implicits._
    (1 to nGames).map(g => (g.toLong, homeTeam(g.toLong), awayTeam(g.toLong)))
      .toDF("game_id", "home_team_id", "away_team_id")
  }

  def pipeline(spark: SparkSession, nGames: Int): GamePipeline.Result =
    GamePipeline.run(spark, pbp(spark, nGames), starters(spark, nGames),
      gameTeams(spark, nGames))
}
