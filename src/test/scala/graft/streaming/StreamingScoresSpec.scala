package graft.streaming

import graft.SparkTestSession
import graft.nba.{Fixture, GamePipeline}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming score fold equals the batch score chain on the fixture
  * game, including across micro-batch boundaries and the period-partial
  * reset. */
class StreamingScoresSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming running scores converge to the batch score chain") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch = GamePipeline.run(
      spark, Fixture.pbp(spark), Fixture.starters(spark), Fixture.gameTeams(spark))
      .scoreChain
      .select(col("game_id"), col("score_id"), col("period"), col("clock"),
        col("points").cast("long").as("points"),
        col("home_score"), col("away_score"), col("margin"),
        col("period_home_score"), col("period_away_score"))

    // replay the same scoring events as a stream; the side (home/away)
    // is recovered from which running total advanced
    val rows = batch.orderBy("clock", "score_id").collect()
    val sided = rows.zipWithIndex.map { case (r, i) =>
      val prevHome = if (i == 0) 0L else rows(i - 1).getAs[Long]("home_score")
      StreamingScores.ScoringEvent(
        r.getAs[Long]("game_id"), r.getAs[Long]("score_id"),
        r.getAs[Int]("period"), r.getAs[Double]("clock"),
        is_home = r.getAs[Long]("home_score") > prevHome,
        points = r.getAs[Long]("points").toInt)
    }

    val input = MemoryStream[StreamingScores.ScoringEvent]
    val out = StreamingScores.scoreRows(input.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("scores_out").start()
    try {
      // split mid-game AND mid-period so both state carries are exercised
      input.addData(sided.take(4)); q.processAllAvailable()
      input.addData(sided.slice(4, 7)); q.processAllAvailable()
      input.addData(sided.drop(7)); q.processAllAvailable()

      val got = spark.table("scores_out")
        .select("game_id", "score_id", "period", "clock", "points",
          "home_score", "away_score", "margin",
          "period_home_score", "period_away_score")
        .collect().map(_.toSeq).toSet
      val want = batch.collect().map(_.toSeq).toSet
      assert(got == want)
    } finally q.stop()
  }
}
