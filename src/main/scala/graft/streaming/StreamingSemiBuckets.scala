package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Skew-safe EXACT spelling of the stream-stream interval LEFT SEMI
  * join (q279's semantics): "emit each purchase once iff some click of
  * the same user falls in its trailing 2 h band".
  *
  * Why it exists (round-8 zipf finding, BASELINE.md): the built-in
  * stream-stream semi join bounds its OUTPUT on a hot key (one row per
  * purchase) but not its PROBE — every arriving hot-key row value-scans
  * that key's buffered opposite-side state, measured ~223× over uniform
  * on the 10× zipf fixture (5.2 s → 1,162.5 s). But semi semantics need
  * far less than the click ROWS: existence of a click in `[p−2h, p]` is
  * decidable from per-(user, hour-bucket) click (min_ts, max_ts) ALONE,
  * because a 2 h band always spans ≥ 2 hour buckets —
  *
  *   - every interior bucket lies fully inside the band, so its mere
  *     non-emptiness is a witness;
  *   - the left edge bucket (containing p−2h) only needs `max ≥ p−2h`;
  *   - the right edge bucket (containing p) only needs `min ≤ p`.
  *
  * So the state is O(live buckets) LONGS per key — two per bucket, no
  * cap, no approximation — and the hot key costs O(buckets) per
  * purchase instead of a state scan. This is the q201 discipline taken
  * to its limit for the semi case: the operator is EXACT at any skew.
  *
  * Event-time correctness is [[StreamingTokenBucket]]'s buffered-fold
  * discipline verbatim: rows buffer until the watermark passes their
  * ts, then fold in (ts, click-before-purchase, event_id) order — a
  * purchase probes only after every click with `c_ts ≤ p_ts` has
  * folded, so the decision is exact by construction. Buckets evict once
  * no future (≥ watermark) purchase's band can reach them. A purchase
  * past the final watermark stays undecided (never emits) — the
  * closed-form cutoff the oracle states explicitly, q99's discipline
  * on a single-feed watermark.
  */
object StreamingSemiBuckets {

  private val HourUs = 3600000000L
  private val BandUs = 7200000000L

  case class OpenRow(tsUs: Long, eventId: Long, isPurchase: Boolean,
      value: Double)

  /** Per-bucket click envelope; buckets keyed by floor(ts / 1h). */
  case class BucketEnv(bucket: Long, minUs: Long, maxUs: Long)

  case class SemiState(buckets: Seq[BucketEnv], open: Seq[OpenRow])

  case class SemiHit(user_id: Long, p_event_id: Long, p_ts_us: Long,
      p_value: Double)

  private def us(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Exact existence test from bucket envelopes (see object doc). */
  private[streaming] def bandHasClick(
      buckets: Map[Long, (Long, Long)], pTsUs: Long): Boolean = {
    val lo = pTsUs - BandUs
    val left = Math.floorDiv(lo, HourUs)
    val right = Math.floorDiv(pTsUs, HourUs)
    buckets.exists { case (b, (mn, mx)) =>
      if (b < left || b > right) false
      else if (b == left) mx >= lo && (b < right || mn <= pTsUs)
      else if (b == right) mn <= pTsUs
      else true // interior: fully inside the band
    }
  }

  /** Fold every open row strictly below the watermark in event-time
    * order (clicks before purchases on ts ties — the band is inclusive
    * of `c_ts = p_ts`), then evict buckets no future purchase can
    * reach. */
  private[streaming] def closeEligible(
      key: Long, st: SemiState, watermarkMs: Long)
      : (Seq[SemiHit], SemiState) = {
    val (toClose, stillOpen) = st.open.partition(_.tsUs / 1000 < watermarkMs)
    var buckets = st.buckets.map(e => e.bucket -> (e.minUs, e.maxUs)).toMap
    val out = Seq.newBuilder[SemiHit]
    toClose.sortBy(r => (r.tsUs, r.isPurchase, r.eventId)).foreach { r =>
      if (!r.isPurchase) {
        val b = Math.floorDiv(r.tsUs, HourUs)
        val (mn, mx) =
          buckets.getOrElse(b, (Long.MaxValue, Long.MinValue))
        buckets = buckets.updated(b,
          (math.min(mn, r.tsUs), math.max(mx, r.tsUs)))
      } else if (bandHasClick(buckets, r.tsUs)) {
        out += SemiHit(key, r.eventId, r.tsUs, r.value)
      }
    }
    // future purchases have p_ts ≥ wm: bucket B is still reachable iff
    // its end (B+1)·1h can sit inside some band [p−2h, p] with p ≥ wm
    val wmUs = watermarkMs * 1000
    val kept = buckets.filter { case (b, _) => (b + 1) * HourUs > wmUs - BandUs }
    (out.result(),
      SemiState(kept.toSeq.map { case (b, (mn, mx)) => BucketEnv(b, mn, mx) },
        stillOpen))
  }

  def apply(events: Dataset[StreamingFeed.RawEvent],
      watermarkDelay: String = "10 minutes"): Dataset[SemiHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(e => e.event_type == "purchase" || e.event_type == "click")
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SemiState, SemiHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[StreamingFeed.RawEvent],
            state: GroupState[SemiState]) =>
          val st0 = state.getOption.getOrElse(SemiState(Nil, Nil))
          val st1 =
            if (it.isEmpty) st0
            else st0.copy(open = st0.open ++ it.map(e =>
              OpenRow(us(e.ts), e.event_id,
                e.event_type == "purchase", e.value)))
          val wm = state.getCurrentWatermarkMs()
          val (emitted, st2) = closeEligible(key, st1, wm)
          if (st2.open.isEmpty && st2.buckets.isEmpty) {
            // quiescent key: nothing buffered and no reachable bucket —
            // drop the map entry, or distinct-key count bounds state
            // growth forever on an unbounded stream
            state.remove()
          } else {
            state.update(st2)
            if (st2.open.nonEmpty)
              state.setTimeoutTimestamp(st2.open.map(_.tsUs / 1000).min)
            else {
              // only envelopes left: wake when the LAST bucket exits its
              // reachable horizon ((b+1)·1h + band), so closeEligible
              // evicts it and the branch above reaps the key. Strictly
              // above the current watermark by the keep condition.
              state.setTimeoutTimestamp(st2.buckets.map(e =>
                ((e.bucket + 1) * HourUs + BandUs) / 1000).max)
            }
          }
          emitted.iterator
      }
  }
}
