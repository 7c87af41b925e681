package graft

import graft.sources.{Sink, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jsonActions parses nested action feeds") {
    val doc =
      """{"game": {"actions": [
        |  {"actionNumber": 1, "actionType": "2pt", "clock": "PT11M32.00S"},
        |  {"actionNumber": 2, "actionType": "rebound", "clock": "PT11M30.00S"}
        |]}}""".stripMargin
    val schema = new StructType()
      .add("actionNumber", LongType).add("actionType", StringType)
      .add("clock", StringType)
    val got = Sources.jsonActions(Seq(doc).toDF("json"), "json", schema)
      .select("actionNumber", "actionType").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "2pt"), (2L, "rebound")))
  }

  test("headerZip turns headers x rows into records") {
    val df = Seq(
      (Seq("TEAM_ID", "CITY"), Seq(Seq("100", "Boston"), Seq("200", "Denver")))
    ).toDF("headers", "rows")
    val got = Sources.headerZip(df, "headers", "rows")
      .select(col("record")("CITY")).as[String].collect().toSet
    assert(got == Set("Boston", "Denver"))
  }

  test("selectByPattern prunes columns by regex") {
    val df = Seq((1L, 2L, "x")).toDF("teamId", "personId", "name")
    assert(Sources.selectByPattern(df, "Id$").columns.toSeq == Seq("teamId", "personId"))
  }

  test("partitioned sink is idempotent: rewrite == same content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/stints"
    val stints = graft.nba.GamePipeline.run(
      spark,
      graft.nba.Fixture.pbp(spark),
      graft.nba.Fixture.starters(spark),
      graft.nba.Fixture.gameTeams(spark)).lineupStints
    Sink.writePartitioned(stints, dir, Seq("game_id"))
    val first = Sink.read(spark, dir).select("stint_id", "lineup_id")
      .collect().map(_.toSeq).toSet
    Sink.writePartitioned(stints, dir, Seq("game_id"))
    val second = Sink.read(spark, dir).select("stint_id", "lineup_id")
      .collect().map(_.toSeq).toSet
    assert(first == second && first.nonEmpty)
    // partition layout: one dir per game_id
    val partDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(partDirs.exists(_.startsWith("game_id=")))
  }
}
