package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (SURVEY §2.9): the watermarked inner join
  * of two streams under a time-range condition, fed micro-batch by
  * micro-batch in chronological order, equals the batch interval join —
  * including pairs whose two sides arrive in DIFFERENT micro-batches
  * (the symmetric-hash state holds each side until the watermark proves
  * no future match, so monotone arrival loses nothing).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming interval join over ordered micro-batches equals batch join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(m: Int, s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")
    // clicks every ~40s per user, purchases sparser — several click⋈purchase
    // pairs straddle the batch split below
    val clicks = (0 until 30).map(i => (100L + i, i.toLong % 3, ts(i * 2 / 3, (i * 40) % 60)))
    val purchases = (0 until 10).map(i => (500L + i, i.toLong % 3, ts(2 + i * 2, 30)))

    val clickIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val c = clickIn.toDS().toDF("c_event_id", "c_user_id", "c_ts")
      .withWatermark("c_ts", "1 minute")
    val p = purchIn.toDS().toDF("p_event_id", "user_id", "p_ts")
      .withWatermark("p_ts", "1 minute")
    val joined = p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_event_id"), col("c_event_id"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("join_out").start()
    try {
      // chronological halves: early clicks land a batch before the
      // purchases that attribute to them
      clickIn.addData(clicks.take(15)); q.processAllAvailable()
      purchIn.addData(purchases.take(5)); q.processAllAvailable()
      clickIn.addData(clicks.drop(15)); q.processAllAvailable()
      purchIn.addData(purchases.drop(5)); q.processAllAvailable()

      val got = spark.table("join_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = purchases.toDF("p_event_id", "user_id", "p_ts")
        .join(clicks.toDF("c_event_id", "c_user_id", "c_ts"),
          col("user_id") === col("c_user_id") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES") &&
            col("c_ts") <= col("p_ts"))
        .select(col("p_event_id"), col("c_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty, "fixture must produce pairs")
      // pairs split across micro-batches must be present: clicks from the
      // FIRST click batch attributed to purchases from the SECOND
      // purchase batch, three micro-batches later
      val straddling = batch.filter { case (pe, ce) => pe >= 505L && ce < 115L }
      assert(straddling.nonEmpty, "fixture must produce cross-batch pairs")
      assert(got == batch)
    } finally q.stop()
  }
}
