package graft

import graft.ops.{AsOf, Chains, Sessionize, TimeKernel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests of the generic operator library on tiny in-memory frames —
  * semantics pinned independently of the oracle gate, including the
  * reference's tie rules (state at T attributes events at T; half-open
  * intervals).
  */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("AsOf.join picks latest state at-or-before, ties go to state") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (1L, 11L, ts("2024-01-01 00:00:10")), // exactly at state change
      (1L, 12L, ts("2023-12-31 23:59:59")), // before any state
      (2L, 20L, ts("2024-01-01 00:00:30"))
    ).toDF("k", "ev_id", "t")
    val state = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 101L, ts("2024-01-01 00:00:10")),
      (2L, 200L, ts("2024-01-01 00:00:31")) // after the event
    ).toDF("k", "st_id", "st_t")

    val got = AsOf.join(events, state, Seq("k"), "t", "st_t",
        payload = Seq("st_id"), tieBreak = Seq("st_id"))
      .select("ev_id", "st_id").as[(Long, Option[Long])].collect().toMap
    assert(got(10L).contains(100L))
    assert(got(11L).contains(101L)) // tie: state at T applies to event at T
    assert(got(12L).isEmpty)        // no prior state -> null
    assert(got(20L).isEmpty)
  }

  test("AsOf.join tolerance nulls out stale state") {
    val events = Seq((1L, 10L, ts("2024-01-01 01:00:00"))).toDF("k", "ev_id", "t")
    val state = Seq((1L, 100L, ts("2024-01-01 00:00:00"))).toDF("k", "st_id", "st_t")
    val got = AsOf.join(events, state, Seq("k"), "t", "st_t",
        payload = Seq("st_id"), tolerance = Some(60.0))
      .select("st_id").as[Option[Long]].collect()
    assert(got.head.isEmpty)
  }

  test("AsOf.join agrees with the equi+range interval join") {
    // state rows tile time per key: as-of == interval containment
    val state = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (1L, 101L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")),
      (2L, 200L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:20:00"))
    ).toDF("k", "st_id", "start_t", "end_t")
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:05:00")),
      (1L, 2L, ts("2024-01-01 00:10:00")),
      (1L, 3L, ts("2024-01-01 00:15:00")),
      (2L, 4L, ts("2024-01-01 00:19:59"))
    ).toDF("k", "ev_id", "t")

    val viaAsOf = AsOf.join(events, state.drop("end_t"), Seq("k"), "t", "start_t",
        payload = Seq("st_id"), tieBreak = Seq("st_id"))
      .select("ev_id", "st_id").as[(Long, Long)].collect().toMap
    val viaInterval = AsOf.intervalJoin(events, state, Seq("k"), "t", "start_t", "end_t")
      .select("ev_id", "st_id").as[(Long, Long)].collect().toMap
    assert(viaAsOf == viaInterval)
    assert(viaAsOf == Map(1L -> 100L, 2L -> 101L, 3L -> 101L, 4L -> 200L))
  }

  test("Sessionize splits on gap strictly greater than threshold") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (1L, 2L, ts("2024-01-01 00:00:30")), // gap 30s == threshold -> same
      (1L, 3L, ts("2024-01-01 00:01:01")), // gap 31s -> new session
      (2L, 4L, ts("2024-01-01 00:00:00"))
    ).toDF("k", "id", "t")
    val got = Sessionize(df, Seq("k"), "t", gapMicros = 30L * 1000000, tieBreak = Seq("id"))
      .select("id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("Chains.next links successors; tail carries nulls") {
    val df = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 9L)).toDF("k", "id")
    val got = Chains.next(df, Seq("k"), Seq("id"), Seq("id"))
      .select("id", "next_id").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(2L), 2L -> Some(3L), 3L -> None, 9L -> None))
  }

  test("Chains.tile closes intervals with the default end") {
    val df = Seq((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:10:00")))
      .toDF("k", "t")
    val got = Chains.tile(df, Seq("k"), "t", lit(ts("2024-01-01 01:00:00")))
      .select("t", "end_time")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect().toMap
    assert(got(ts("2024-01-01 00:00:00")) == ts("2024-01-01 00:10:00"))
    assert(got(ts("2024-01-01 00:10:00")) == ts("2024-01-01 01:00:00"))
  }

  test("TimeKernel parses ISO clocks and OT math") {
    val df = Seq(("PT11M32.00S", 1), ("PT0M05.50S", 5), ("PT12M00.00S", 4))
      .toDF("clock", "period")
    val got = df.select(
      TimeKernel.clockSeconds(col("clock")).as("secs"),
      TimeKernel.periodLength(col("period")).as("len"),
      TimeKernel.globalClock(col("period"), col("clock")).as("g"))
      .as[(Double, Double, Double)].collect()
    assert(got(0) == ((692.0, 720.0, 28.0)))            // Q1: 720-692 elapsed
    assert(got(1) == ((5.5, 300.0, 2880.0 + 294.5)))    // OT1
    assert(got(2) == ((720.0, 720.0, 3 * 720.0 + 0.0))) // Q4 start
  }

  test("TimeKernel composite and set keys") {
    val df = Seq((Seq(5L, 3L, 9L), 7L)).toDF("ids", "n")
    val got = df.select(
      TimeKernel.setKey(col("ids")).as("sk"),
      TimeKernel.compositeKey(col("n"), lit("x")).as("ck"))
      .as[(String, String)].collect().head
    assert(got == (("3_5_9", "7_x")))
  }

  test("TimeKernel sentinel handling") {
    val df = Seq(-1L, 42L).toDF("v")
    val got = df.select(TimeKernel.sentinelToNull(col("v")).as("v"))
      .as[Option[Long]].collect().toSet
    assert(got == Set(None, Some(42L)))
  }
}
