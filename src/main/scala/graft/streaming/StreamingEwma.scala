package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming INFINITE-HISTORY dyadic EWMA — the stateful twin of the
  * batch q187: where the batch spelling must truncate at 32 terms to be
  * windowable at all (EWMA is a sequential recurrence no batch engine
  * parallelizes), a per-key stream computes the exact untruncated
  * recurrence e₁ = x₁, e_t = (x_t + e_{t−1}) / 2 with O(1) folded state
  * — the class of operator that is structurally EASIER streaming than
  * batch, which is why it closes the family.
  *
  * Event-time correctness: per-event order is load-bearing (the fold is
  * a recurrence), so events buffer in state until the watermark passes
  * their timestamp STRICTLY (`ts_ms < watermark_ms` — the same strict
  * comparison every other gate in this repo uses), then fold in
  * (ts, event_id) order. Buffered state is bounded by the watermark
  * horizon (one delay window of events per key), exactly the bound every
  * watermarked aggregation carries; the folded history itself is TWO
  * numbers (count, previous EWMA) however long the stream runs.
  *
  * Determinism across engines: each step is one IEEE addition and one
  * exact halving, in chronological order; DuckDB replays the identical
  * recurrence with a recursive CTE, so every emitted double is
  * bit-identical — no truncation error to tolerate, because BOTH sides
  * compute the same exact recurrence.
  */
object StreamingEwma {

  case class OpenEv(tsUs: Long, eventId: Long, value: Double)

  /** Folded prefix (count + last EWMA) plus the open in-horizon buffer. */
  case class EwmaState(count: Long, prev: Double, open: Seq[OpenEv])

  case class Smoothed(
      user_id: Long, event_id: Long, rn: Long, value: Double, ewma: Double)

  private def us(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Fold every open event strictly below the watermark, in (ts, id)
    * order. Returns (emitted rows, next state). */
  private[streaming] def closeEligible(
      key: Long, st: EwmaState, watermarkMs: Long): (Seq[Smoothed], EwmaState) = {
    val (toClose, stillOpen) = st.open.partition(_.tsUs / 1000 < watermarkMs)
    var n = st.count
    var prev = st.prev
    val out = Seq.newBuilder[Smoothed]
    toClose.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      n += 1
      prev = if (n == 1) e.value else (e.value + prev) / 2
      out += Smoothed(key, e.eventId, n, e.value, prev)
    }
    (out.result(), EwmaState(n, prev, stillOpen))
  }

  def apply(events: Dataset[StreamingFeed.RawEvent],
      watermarkDelay: String = "10 minutes"): Dataset[Smoothed] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, Smoothed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[StreamingFeed.RawEvent],
            state: GroupState[EwmaState]) =>
          val st0 = state.getOption.getOrElse(EwmaState(0L, 0.0, Nil))
          val st1 =
            if (it.isEmpty) st0
            else st0.copy(open = st0.open ++
              it.map(e => OpenEv(us(e.ts), e.event_id, e.value)))
          val wm = state.getCurrentWatermarkMs()
          val (emitted, st2) = closeEligible(key, st1, wm)
          state.update(st2)
          // re-arm on the earliest open event: after the strict close,
          // every remaining ts_ms >= wm, and == watermark is allowed
          if (st2.open.nonEmpty)
            state.setTimeoutTimestamp(st2.open.map(_.tsUs / 1000).min)
          emitted.iterator
      }
  }
}
