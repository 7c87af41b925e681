package graft.streaming

import graft.SparkTestSession
import graft.nba.{Fixture, Model, Stints}
import graft.ops.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming operators tested against their batch twins: feed the same
  * data through MemoryStream micro-batches and assert the streaming
  * output converges to the batch result.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming sessionization converges to the batch operator") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // deterministic event stream: 3 users, gaps around the 60s threshold
    def ts(m: Int, sec: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$sec%02d")
    val events = (0 until 30).map { i =>
      StreamingSessionize.Event(
        user_id = i % 3, event_id = i.toLong,
        ts = ts(i / 2, (i * 7) % 60), value = i.toDouble)
    }.sortBy(e => e.ts.getTime)

    val input = MemoryStream[StreamingSessionize.Event]
    val sessions = StreamingSessionize(input.toDS(), gapMicros = 60L * 1000000,
      watermarkDelay = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // two micro-batches + a far-future heartbeat to advance the watermark
      input.addData(events.take(15)); q.processAllAvailable()
      input.addData(events.drop(15)); q.processAllAvailable()
      input.addData(StreamingSessionize.Event(99L, 999L,
        java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 0.0))
      q.processAllAvailable()

      val got = spark.table("sess_out")
        .filter(col("user_id") =!= 99)
        .select("user_id", "session_id", "n_events", "session_value")
        .as[(Long, Long, Long, Double)].collect().toSet

      val batch = Sessionize(
        events.toDF(), Seq("user_id"), "ts",
        gapMicros = 60L * 1000000, tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .as[(Long, Long, Long, Double)].collect().toSet

      assert(got == batch)
    } finally q.stop()
  }

  test("streaming stint fold matches the batch fold across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val pbp = Fixture.pbp(spark)
    val subs = Stints.subEvents(spark, pbp).collect().toSeq
      .sortBy(s => (s.global_clock, s.person_id))
    val starters = Map(
      (Fixture.gameId, Fixture.home) -> (1L to 5L).toSeq,
      (Fixture.gameId, Fixture.away) -> (11L to 15L).toSeq)

    val input = MemoryStream[Model.SubEvent]
    val snaps = StreamingStints(input.toDS(), starters)
    val q = snaps.writeStream.outputMode("append")
      .format("memory").queryName("stint_out").start()
    try {
      // split mid-game, straddling the double-sub batch at t=300
      val (first, rest) = subs.partition(_.global_clock <= 300.0)
      input.addData(first); q.processAllAvailable()
      input.addData(rest); q.processAllAvailable()
      // sentinel sub far in the future to flush the last pending batch
      input.addData(Model.SubEvent(Fixture.gameId, Fixture.home, 99L, 99999.0, is_in = true))
      input.addData(Model.SubEvent(Fixture.gameId, Fixture.away, 99L, 99999.0, is_in = true))
      q.processAllAvailable()

      val got = spark.table("stint_out")
        .filter(col("global_clock") < 99999.0)
        .select("team_id", "global_clock", "player_ids")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toSet

      val batch = Stints.lineupSnapshots(spark,
          Fixture.starters(spark), Stints.subEvents(spark, pbp))
        .collect().map(s => (s.team_id, s.global_clock, s.player_ids)).toSet

      assert(got == batch)
    } finally q.stop()
  }
}
