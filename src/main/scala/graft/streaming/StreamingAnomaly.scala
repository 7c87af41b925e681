package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window z-score anomaly detection — the incremental
  * twin of the batch q133: per event_type, each CLOSED hourly bucket's
  * count is scored against the mean/population-std of the previous 24
  * closed buckets, held in a bounded ring buffer.
  *
  * State per key is O(1): the open buckets still inside the watermark
  * horizon (at most delay/1h + 1 of them) plus exactly 24 closed
  * (bucket, count) history entries — the state a 1000-executor cluster
  * can shard to any key cardinality. A bucket closes when the watermark
  * passes its end STRICTLY (`end_ms < watermark_ms` — the same strict
  * comparison Spark applies when firing event-time timeouts, so the
  * no-data flush batch and the oracle cutoff agree exactly); closes
  * happen in bucket order, each scored against the history BEFORE being
  * appended to it, matching the batch `ROWS BETWEEN 24 PRECEDING AND 1
  * PRECEDING` frame over observed buckets.
  *
  * Determinism across engines: the score derives from exact integer
  * sums (s, sq over 24 counts) through the IDENTICAL double expression
  * tree as q133's oracle — s/c, sq/c − mean², clamped at 0, sqrt, then
  * (n − mean)/std — every step an IEEE-correctly-rounded operation, so
  * the JVM and DuckDB produce bit-identical doubles.
  */
object StreamingAnomaly {

  /** One closed bucket in the trailing history. */
  case class HistEntry(bucketStart: Long, n: Long)

  /** Per-type state: open bucket counts + the last 24 closed buckets. */
  case class AnomState(open: Map[Long, Long], history: Seq[HistEntry])

  case class Scored(
      bucket_start: Long, event_type: String, n: Long,
      mean: Option[Double], std: Option[Double], z: Option[Double],
      is_anomaly: Boolean)

  private val BucketUs = 3600L * 1000000L
  private val HistLen = 24

  private def us(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Score one bucket against the trailing history — the exact operation
    * order of the q133 oracle's expression tree (see scaladoc). Returns
    * (mean, std, z, is_anomaly); all None when fewer than 24 priors. */
  private[streaming] def score(
      n: Long, history: Seq[HistEntry]): (Option[Double], Option[Double], Option[Double], Boolean) =
    if (history.length < HistLen) (None, None, None, false)
    else {
      val tail = history.takeRight(HistLen)
      val c = HistLen.toLong
      var s = 0L; var sq = 0L
      tail.foreach { h => s += h.n; sq += h.n * h.n }
      val mean = s.toDouble / c
      val vr = math.max(sq.toDouble / c - mean * mean, 0.0)
      val std = math.sqrt(vr)
      val z = if (std > 0) Some((n.toDouble - mean) / std) else None
      (Some(mean), Some(std), z, z.exists(v => math.abs(v) > 3))
    }

  /** Close every open bucket strictly below the watermark, in bucket
    * order, scoring each against the history as it stood before the
    * bucket joined it. Returns (emitted rows, next state). Buckets with
    * fewer than 24 priors close silently into the history — exactly the
    * batch oracle's `c = 24` filter. */
  private[streaming] def closeEligible(
      key: String, st: AnomState, watermarkMs: Long): (Seq[Scored], AnomState) = {
    val (toClose, stillOpen) =
      st.open.partition { case (b, _) => (b + 3600L) * 1000L < watermarkMs }
    var hist = st.history
    val out = Seq.newBuilder[Scored]
    toClose.toSeq.sortBy(_._1).foreach { case (b, n) =>
      val (mean, std, z, anom) = score(n, hist)
      if (mean.isDefined) out += Scored(b, key, n, mean, std, z, anom)
      hist = (hist :+ HistEntry(b, n)).takeRight(HistLen)
    }
    (out.result(), AnomState(stillOpen, hist))
  }

  def apply(events: Dataset[StreamingFeed.RawEvent],
      watermarkDelay: String = "10 minutes"): Dataset[Scored] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, Scored](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[StreamingFeed.RawEvent],
            state: GroupState[AnomState]) =>
          val st0 = state.getOption.getOrElse(AnomState(Map.empty, Nil))
          val wm = state.getCurrentWatermarkMs()
          val st1 =
            if (it.isEmpty) st0
            else {
              var open = st0.open
              it.foreach { e =>
                val b = us(e.ts) / BucketUs * 3600L
                open = open.updated(b, open.getOrElse(b, 0L) + 1L)
              }
              st0.copy(open = open)
            }
          val (emitted, st2) = closeEligible(key, st1, wm)
          state.update(st2)
          // re-arm on the earliest open bucket's end: the timeout fires
          // when the watermark strictly passes it, mirroring the close
          // comparison (setTimeoutTimestamp allows == watermark)
          if (st2.open.nonEmpty)
            state.setTimeoutTimestamp((st2.open.keys.min + 3600L) * 1000L)
          emitted.iterator
      }
  }
}
