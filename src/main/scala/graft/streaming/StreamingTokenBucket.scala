package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-bucket rate limiter — the classic admission-control
  * state machine (API quotas, abuse throttling, crawl politeness) run
  * per user over the event stream: a bucket of capacity 2 tokens
  * refills at 1 token per 12 hours; each event spends one token or is marked
  * throttled. This is the third member of the custom-state family
  * beside the ring-buffer scorer ([[StreamingAnomaly]]) and the
  * buffered fold ([[StreamingEwma]]): a genuine SEQUENTIAL state
  * machine whose transition depends on the inter-arrival GAP, so no
  * batch window can spell it (the q188 argument, with state = two
  * integers).
  *
  * Exactness: the bucket is tracked in MICRO-TOKEN units where one
  * token = 60,000,000 units, i.e. one unit per microsecond of refill —
  * the whole recurrence is integer min/add/subtract, so the DuckDB
  * recursive-CTE replay is exact with no float anywhere:
  *
  *   tokens'  = min(cap, tokens + Δt_us)
  *   allowed  = tokens' ≥ COST;  tokens'' = tokens' − (allowed ? COST : 0)
  *
  * Event-time correctness is [[StreamingEwma]]'s discipline verbatim:
  * order is load-bearing, so events buffer until the watermark strictly
  * passes their ts, then fold in (ts, event_id) order; buffered state
  * is bounded by the watermark horizon, permanent state is two longs.
  */
object StreamingTokenBucket {

  /** One token = this many units (= µs of refill at 1 token/12h —
    * sized so the fixture's per-user arrival rate actually exercises
    * BOTH branches: a too-generous bucket never throttles and the
    * deny path goes untested). */
  val Cost = 43200000000L

  /** Bucket capacity: 2 tokens. */
  val Cap = 2L * Cost

  case class OpenEv(tsUs: Long, eventId: Long)

  case class BucketState(
      count: Long, prevTsUs: Long, tokens: Long, open: Seq[OpenEv])

  case class Decision(
      user_id: Long, event_id: Long, rn: Long, allowed: Boolean,
      tokens_after: Long)

  private def us(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Fold every open event strictly below the watermark, in (ts, id)
    * order; the first event of a key starts from a FULL bucket. */
  private[streaming] def closeEligible(
      key: Long, st: BucketState, watermarkMs: Long)
      : (Seq[Decision], BucketState) = {
    val (toClose, stillOpen) = st.open.partition(_.tsUs / 1000 < watermarkMs)
    var n = st.count
    var prevTs = st.prevTsUs
    var tokens = st.tokens
    val out = Seq.newBuilder[Decision]
    toClose.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
      n += 1
      val refilled =
        if (n == 1) Cap else math.min(Cap, tokens + (e.tsUs - prevTs))
      val allowed = refilled >= Cost
      tokens = if (allowed) refilled - Cost else refilled
      prevTs = e.tsUs
      out += Decision(key, e.eventId, n, allowed, tokens)
    }
    (out.result(), BucketState(n, prevTs, tokens, stillOpen))
  }

  def apply(events: Dataset[StreamingFeed.RawEvent],
      watermarkDelay: String = "10 minutes"): Dataset[Decision] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, Decision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[StreamingFeed.RawEvent],
            state: GroupState[BucketState]) =>
          val st0 = state.getOption.getOrElse(BucketState(0L, 0L, 0L, Nil))
          val st1 =
            if (it.isEmpty) st0
            else st0.copy(open = st0.open ++
              it.map(e => OpenEv(us(e.ts), e.event_id)))
          val wm = state.getCurrentWatermarkMs()
          val (emitted, st2) = closeEligible(key, st1, wm)
          state.update(st2)
          if (st2.open.nonEmpty)
            state.setTimeoutTimestamp(st2.open.map(_.tsUs / 1000).min)
          emitted.iterator
      }
  }
}
