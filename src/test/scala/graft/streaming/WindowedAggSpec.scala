package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked tumbling-window aggregation (the standard Structured
  * Streaming shape, SURVEY §2.9 extension): streaming result over
  * append-mode micro-batches equals the batch groupBy(window) result for
  * windows the watermark has closed.
  */
class WindowedAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming windowed counts converge to batch windowed counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(m: Int, s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    val events = (0 until 40).map(i =>
      (i.toLong, ts(i / 4, (i * 13) % 60), if (i % 3 == 0) "click" else "view", i * 1.0))

    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val agg = input.toDS()
      .toDF("event_id", "ts", "event_type", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(events.take(20)); q.processAllAvailable()
      input.addData(events.drop(20)); q.processAllAvailable()
      // heartbeat far in the future closes all windows
      input.addData((999L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "hb", 0.0))
      q.processAllAvailable()

      val got = spark.table("win_out")
        .filter(col("event_type") =!= "hb")
        .select(col("window.start"), col("event_type"), col("n"), col("v"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF("event_id", "ts", "event_type", "value")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("window.start"), col("event_type"), col("n"), col("v"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming windowed KMV sketches equal batch sketches (q96's shape)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(m: Int, s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    // 90 events over 3 five-minute windows, 30 distinct users cycling —
    // enough that some windows exceed k=16 distinct and engage the
    // estimator, not just the exact-count branch
    val events = (0 until 90).map(i => (i.toLong % 30, ts(i / 30 * 5, i % 60)))

    def kmv(c: org.apache.spark.sql.Column) =
      graft.functions.KmvSketch.estimate(
        graft.ops.Text.baseHash(c.cast("string")), 16)

    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(kmv(col("user_id")).as("e"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("kmv_out").start()
    try {
      // split mid-window so per-window state must merge across batches
      input.addData(events.take(50)); q.processAllAvailable()
      input.addData(events.drop(50)); q.processAllAvailable()
      input.addData((999L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00")))
      q.processAllAvailable()

      val got = spark.table("kmv_out")
        .filter(col("window.start") < ts(30, 0))
        .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getDouble(1))).toSet
      val batch = events.toDF("user_id", "ts")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(kmv(col("user_id")).as("e"))
        .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getDouble(1))).toSet
      assert(got == batch) // bit-exact: KMV state merges deterministically
    } finally q.stop()
  }
}
