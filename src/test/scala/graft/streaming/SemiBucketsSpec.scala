package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import StreamingSemiBuckets.{bandHasClick, closeEligible, OpenRow, SemiState}

/** Pure-kernel pin for the bucket-envelope semi join (q288): the
  * existence decision and the incremental fold are exercised against
  * brute force over thousands of randomized feeds and randomized
  * micro-batch slicings — the claim under test is EXACTNESS of the
  * envelope decomposition (a 2 h band always spans ≥ 2 hour buckets, so
  * per-bucket (min, max) decides membership with no approximation),
  * and slicing-invariance of the watermark-driven fold. The DuckDB
  * gate pins one fixed dataset; this pins the kernel on random ones.
  */
class SemiBucketsSpec extends AnyFunSuite {

  private val HourUs = 3600000000L
  private val BandUs = 7200000000L

  test("bandHasClick == brute force on random click sets") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val clicks = Seq.fill(rnd.nextInt(12))(
        (rnd.nextLong(24L * HourUs / 1000) * 1000).abs)
      val buckets = clicks.groupBy(c => Math.floorDiv(c, HourUs))
        .map { case (b, cs) => b -> (cs.min, cs.max) }
      val p = (rnd.nextLong(24L * HourUs / 1000) * 1000).abs
      val brute = clicks.exists(c => c >= p - BandUs && c <= p)
      assert(bandHasClick(buckets, p) == brute,
        s"p=$p clicks=${clicks.sorted}")
    }
  }

  test("fold == one-shot brute force under random micro-batch slicing") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val n = 2 + rnd.nextInt(40)
      val rows = (1 to n).map { i =>
        OpenRow((rnd.nextLong(12L * HourUs / 1000) * 1000).abs,
          i.toLong, rnd.nextBoolean(), rnd.nextDouble())
      }
      val maxMs = rows.map(_.tsUs / 1000).max
      val wmFinal = maxMs - 600000 // 10 min delay, like the operator
      // brute force: purchases below the final watermark with a click
      // (same key) in the inclusive trailing band
      val expected = rows.filter(r => r.isPurchase &&
        r.tsUs / 1000 < wmFinal &&
        rows.exists(c => !c.isPurchase &&
          c.tsUs >= r.tsUs - BandUs && c.tsUs <= r.tsUs))
        .map(_.eventId).toSet
      // incremental replay with Spark's contract: batches are contiguous
      // in event time (the watermark DROPS late rows before a stateful
      // operator, so the kernel never sees them), each batch's watermark
      // derives from the PREVIOUS batches only, and rows arrive in
      // arbitrary order within a batch
      var st = SemiState(Nil, Nil)
      var emitted = Set.empty[Long]
      val slices = rnd.shuffle(rows).sortBy(_.tsUs)
        .grouped(1 + rnd.nextInt(rows.length)).toSeq
        .map(s => rnd.shuffle(s))
      var wm = Long.MinValue / 2
      var prevMaxMs = Long.MinValue / 2
      slices.foreach { slice =>
        wm = math.max(wm, prevMaxMs - 600000)
        val (hits, st2) = closeEligible(1L, st.copy(
          open = st.open ++ slice), wm)
        st = st2
        hits.foreach(h => assert(!emitted.contains(h.p_event_id),
          "a purchase emitted twice across passes"))
        emitted ++= hits.map(_.p_event_id)
        prevMaxMs = math.max(prevMaxMs, slice.map(_.tsUs / 1000).max)
      }
      // one final timeout-style invocation at the final watermark
      val (hits, _) = closeEligible(1L, st, wmFinal)
      hits.foreach(h => assert(!emitted.contains(h.p_event_id)))
      emitted ++= hits.map(_.p_event_id)
      assert(emitted == expected,
        s"slicing changed the semi result: got $emitted want $expected")
    }
  }

  test("bucket eviction horizon: state drains to empty exactly at " +
      "(bucket+1)·1h + band") {
    val click = OpenRow(5L * HourUs + 123000L, 1L, isPurchase = false, 0.0)
    val bucket = Math.floorDiv(click.tsUs, HourUs)
    val horizonMs = ((bucket + 1) * HourUs + BandUs) / 1000
    // fold the click in (it's below any of the probed watermarks)
    val (_, st) = closeEligible(1L, SemiState(Nil, Seq(click)), horizonMs - 1)
    assert(st.open.isEmpty && st.buckets.nonEmpty,
      "one ms before the horizon the bucket must still be reachable")
    val (_, st2) = closeEligible(1L, st, horizonMs)
    assert(st2.open.isEmpty && st2.buckets.isEmpty,
      "at the horizon the bucket must evict — the operator's reap " +
        "timeout fires here and drops the key's state entry")
  }

  test("quiescent keys are reaped from the state store (no per-key leak)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val in = MemoryStream[StreamingFeed.RawEvent]
    val q = StreamingSemiBuckets(in.toDS()).writeStream
      .outputMode("append").format("memory").queryName("semi_reap_out")
      .start()
    try {
      // key 1: an in-band (click, purchase) pair, then nothing ever again
      in.addData(StreamingFeed.RawEvent(1L, 10L, "click", 0.0, ts(1)),
        StreamingFeed.RawEvent(1L, 11L, "purchase", 5.0, ts(2)))
      q.processAllAvailable()
      // key 2 far in the future: the watermark sails past key 1's last
      // reachable bucket horizon; a second batch lets key 1's registered
      // event-time timeout fire under the advanced watermark
      in.addData(StreamingFeed.RawEvent(2L, 20L, "click", 0.0, ts(20)))
      q.processAllAvailable()
      in.addData(StreamingFeed.RawEvent(2L, 21L, "click", 0.0, ts(21)))
      q.processAllAvailable()
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal)
      assert(stateRows.contains(1L),
        s"state must hold ONLY the live key after the reap: $stateRows")
      // the reap must not have raced the emission: key 1's purchase is out
      val got = spark.table("semi_reap_out")
        .collect().map(_.getAs[Long]("p_event_id")).toSet
      assert(got.contains(11L), s"purchase must emit before the reap: $got")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS semi_reap_out")
    }
  }
}
