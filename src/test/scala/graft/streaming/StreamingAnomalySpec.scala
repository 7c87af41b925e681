package graft.streaming

import graft.SparkTestSession
import graft.streaming.StreamingAnomaly.{AnomState, HistEntry}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming z-score scorer (q145): the ring-buffer fold's exact
  * semantics (score frame, close ordering, strict watermark boundary)
  * plus MemoryStream convergence to the batch q133 spelling under the
  * final-watermark cutoff.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("score matches the oracle expression tree on a known history") {
    val hist = (1 to 24).map(i => HistEntry(i * 3600L, i.toLong))
    // s = 300, sq = 4900 over c = 24
    val (mean, std, z, anom) = StreamingAnomaly.score(40L, hist)
    val m = 300.0 / 24
    val vr = math.max(4900.0 / 24 - m * m, 0.0)
    assert(mean.contains(m) && std.contains(math.sqrt(vr)))
    assert(z.contains((40.0 - m) / math.sqrt(vr)))
    assert(anom == (math.abs((40.0 - m) / math.sqrt(vr)) > 3))
    // fewer than 24 priors: silent
    assert(StreamingAnomaly.score(40L, hist.tail) == (None, None, None, false))
  }

  test("closeEligible closes in bucket order with a strict boundary") {
    // three open buckets at hours 0, 1, 2 (ends at ms 3_600_000, ...)
    val open = Map(0L -> 5L, 3600L -> 6L, 7200L -> 7L)
    val st = AnomState(open, (1 to 23).map(i => HistEntry(-i * 3600L, 1L)))
    // watermark exactly AT hour-0's end must NOT close it (strict <)
    val (out0, st0) = StreamingAnomaly.closeEligible("t", st, 3600L * 1000L)
    assert(out0.isEmpty && st0.open.size == 3)
    // watermark past hour-1's end closes buckets 0 and 1, in order:
    // bucket 0 is the 24th history entry (silent), bucket 1 scores
    val (out1, st1) = StreamingAnomaly.closeEligible("t", st, 3600L * 2000L + 1)
    assert(st1.open.keySet == Set(7200L))
    assert(st1.history.takeRight(2).map(_.bucketStart) == Seq(0L, 3600L))
    assert(out1.map(_.bucket_start) == Seq(3600L))
    // bucket 1's frame = 23 placeholders + bucket 0's count
    val (m, _, _, _) = StreamingAnomaly.score(6L,
      (1 to 23).map(i => HistEntry(-i * 3600L, 1L)) :+ HistEntry(0L, 5L))
    assert(out1.head.mean == m)
  }

  test("streaming scorer converges to the batch q133 spelling") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // 40 hours, per-hour count varying 1..8, one spike hour, two types
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00")
    val events = for {
      h <- 0 until 40
      typ <- Seq("click", "view")
      n = if (h == 30 && typ == "click") 50 else 1 + (h * 7 + typ.length) % 8
      i <- 0 until n
    } yield StreamingFeed.RawEvent(1L, (h * 1000 + i).toLong, typ, 0.0, ts(h, i % 60))

    val input = MemoryStream[StreamingFeed.RawEvent]
    val q = StreamingAnomaly(input.toDS()).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("anom_out").start()
    try {
      events.grouped(200).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      val got = spark.table("anom_out")
        .select("bucket_start", "event_type", "n", "mean", "std", "z",
          "is_anomaly")
      val maxMs = events.map(_.ts.getTime).max
      val wmUs = (maxMs - 600000L) * 1000L
      val tw = Window.partitionBy(col("event_type"))
        .orderBy(col("bucket_start")).rowsBetween(-24, -1)
      val batch = events.toDS().toDF()
        .groupBy((unix_micros(col("ts")).divide(3600000000L)).cast("long")
          .multiply(3600L).as("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("s", sum(col("n")).over(tw))
        .withColumn("c", count(col("n")).over(tw))
        .withColumn("sq", sum(col("n") * col("n")).over(tw))
        .filter(col("c") === 24)
        .filter((col("bucket_start") + 3600L) * 1000000L < wmUs)
        .withColumn("mean", col("s").cast("double") / col("c"))
        .withColumn("vr", greatest(col("sq").cast("double") / col("c")
          - col("mean") * col("mean"), lit(0.0)))
        .withColumn("std", sqrt(col("vr")))
        .withColumn("z", when(col("std") > 0,
          (col("n").cast("double") - col("mean")) / col("std")))
        .select(col("bucket_start"), col("event_type"), col("n"),
          col("mean"), col("std"), col("z"),
          when(col("std") > 0, abs(col("z")) > 3).otherwise(lit(false))
            .as("is_anomaly"))
      assert(got.count() > 0, "no rows emitted")
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
      // the spike hour is flagged once its bucket closes
      assert(spark.table("anom_out")
        .filter(col("event_type") === "click" && col("is_anomaly")).count() >= 1)
    } finally q.stop()
  }
}
