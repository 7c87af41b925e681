package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Skew-safe spelling of the q100 stream-stream interval join: a
  * per-(user, hour) cap of [[CapPerHour]] rows on EACH input before any
  * matching, implemented as one `flatMapGroupsWithState` keyed by user.
  *
  * Why it exists (round-7 zipf finding, BASELINE.md): the banded
  * full-outer join's OUTPUT is quadratic in a hot key's rate — a key
  * carrying 25% of a 100 TB corpus emits ~(0.25·n)² interval pairs and
  * no join algorithm shrinks its own result. The production discipline
  * for skewed corpora is to bound the fan-out at the operator: keep the
  * K deterministically-chosen representatives per (key, hour) per side
  * and join those, so state AND output per (key, hour) are O(K²)
  * regardless of the key's mass — the whole query is then linear in the
  * input at any skew. The uncapped q100 remains the exact-semantics
  * spelling for uniform corpora.
  *
  * Determinism (the oracle contract): the kept set is the K SMALLEST
  * event ids of each (user, hour, side) — order-independent, so batch
  * slicing can't change it — and a bucket's kept set is only ever
  * emitted once the watermark proves it complete. Per hour bucket B:
  *
  *  - purchases of B finalize when `wm ≥ end(B)` (no more bucket-B
  *    arrivals can be on time, and every click a bucket-B purchase can
  *    match — `c_ts ∈ [p_ts − 2h, p_ts]` — is in a bucket whose kept
  *    set is also complete). Each kept purchase emits its interval
  *    matches against the kept clicks, or one null-click row.
  *  - clicks of B finalize when `wm ≥ end(B) + 2h` (the last purchase
  *    bucket that can reference them, B+2, has finalized by then —
  *    equality holds, and purchases are processed first within a pass).
  *    A kept click no finalized purchase matched emits one null-purchase
  *    row; matched flags persist in state across passes.
  *
  * Both cutoffs are closed-form in the final watermark, so a DuckDB
  * oracle reproduces the exact row set with two QUALIFY row_number
  * caps and the two finalization predicates (q201's gate).
  *
  * Scale shape: state per key is O(K · live buckets), inserts are O(K)
  * via a per-(side, bucket) index built once per invocation, and the
  * emitted rows are read straight out of bounded buffers — the hot key
  * costs one task linear scan time, never a quadratic join.
  */
object StreamingCappedJoin {

  /** Kept rows per (user, hour, side) — the K of the K²-bounded join. */
  val CapPerHour = 8

  private val HourUs = 3600000000L
  private val IntervalUs = 7200000000L

  case class SideEvent(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double, is_purchase: Boolean)

  /** One buffered representative; `matched` persists across passes so a
    * click matched by an earlier-finalizing purchase bucket never
    * null-emits at its own finalization. */
  case class Stored(isPurchase: Boolean, bucket: Long, eventId: Long,
      tsUs: Long, value: Double, matched: Boolean)

  case class CapState(rows: List[Stored])

  case class Joined(
      user_id: Long,
      p_event_id: Option[Long], c_event_id: Option[Long],
      p_ts_us: Option[Long], c_ts_us: Option[Long],
      p_value: Option[Double], c_value: Option[Double])

  private def us(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def pDeadlineUs(b: Long): Long = (b + 1) * HourUs
  private def cDeadlineUs(b: Long): Long = (b + 1) * HourUs + IntervalUs

  /** Fold one key's invocation: insert new arrivals under the cap, then
    * finalize every bucket the watermark has released. Exposed for the
    * direct unit spec; the streaming operator is a thin shell around it. */
  private[streaming] def step(
      key: Long,
      arrivals: Iterator[SideEvent],
      prior: List[Stored],
      wmUs: Long): (Seq[Joined], List[Stored]) = {
    // per-(side, bucket) index: O(state) once, O(K) per insert — a flat
    // list scan per arrival would be quadratic on a zipf hot key
    val byBucket = mutable.LinkedHashMap.empty[(Boolean, Long), mutable.ArrayBuffer[Stored]]
    for (r <- prior)
      byBucket.getOrElseUpdate((r.isPurchase, r.bucket), mutable.ArrayBuffer.empty) += r

    for (e <- arrivals) {
      val tUs = us(e.ts)
      val b = tUs / HourUs
      // a bucket whose kept set the watermark already sealed can't
      // reopen — wm ≥ end(B) makes any bucket-B arrival late on BOTH
      // sides (clicks' later cDeadline is their emission deadline, not
      // an acceptance window: purchase bucket B already matched against
      // click bucket B's kept set at wm ≥ end(B)). One-shot feeds never
      // hit this; incremental armor.
      if (pDeadlineUs(b) > wmUs) {
        val buf = byBucket.getOrElseUpdate((e.is_purchase, b), mutable.ArrayBuffer.empty)
        if (!buf.exists(_.eventId == e.event_id)) {
          if (buf.size < CapPerHour)
            buf += Stored(e.is_purchase, b, e.event_id, tUs, e.value, matched = false)
          else {
            val mi = buf.indices.maxBy(buf(_).eventId)
            if (e.event_id < buf(mi).eventId)
              buf(mi) = Stored(e.is_purchase, b, e.event_id, tUs, e.value, matched = false)
          }
        }
      }
    }

    val out = Seq.newBuilder[Joined]
    // purchases first: click bucket B's drop deadline equals purchase
    // bucket B+2's finalization, and those purchases must see B's clicks
    val duePB = byBucket.keysIterator
      .collect { case (true, b) if pDeadlineUs(b) <= wmUs => b }
      .toSeq.sorted
    for (b <- duePB) {
      val ps = byBucket((true, b)).sortBy(_.eventId)
      for (p <- ps) {
        var any = false
        for (cb <- (b - 2) to b; buf <- byBucket.get((false, cb)); i <- buf.indices) {
          val c = buf(i)
          if (c.tsUs >= p.tsUs - IntervalUs && c.tsUs <= p.tsUs) {
            any = true
            buf(i) = c.copy(matched = true)
            out += Joined(key, Some(p.eventId), Some(c.eventId),
              Some(p.tsUs), Some(c.tsUs), Some(p.value), Some(c.value))
          }
        }
        if (!any)
          out += Joined(key, Some(p.eventId), None, Some(p.tsUs), None,
            Some(p.value), None)
      }
      byBucket.remove((true, b))
    }
    val dueCB = byBucket.keysIterator
      .collect { case (false, b) if cDeadlineUs(b) <= wmUs => b }
      .toSeq.sorted
    for (b <- dueCB) {
      for (c <- byBucket((false, b)).sortBy(_.eventId) if !c.matched)
        out += Joined(key, None, Some(c.eventId), None, Some(c.tsUs),
          None, Some(c.value))
      byBucket.remove((false, b))
    }
    (out.result(), byBucket.valuesIterator.flatten.toList)
  }

  /** Next event-time deadline still pending in `rows` (µs), if any. */
  private[streaming] def nextDeadlineUs(rows: List[Stored]): Option[Long] =
    rows.iterator
      .map(r => if (r.isPurchase) pDeadlineUs(r.bucket) else cDeadlineUs(r.bucket))
      .minOption

  /** The operator: events filtered to the two sides, watermarked, and
    * folded per user through [[step]]. */
  def apply(events: Dataset[StreamingFeed.RawEvent]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF()
      .filter(col("event_type").isin("purchase", "click"))
      .withColumn("is_purchase", col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value", "is_purchase")
      .as[SideEvent]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CapState, Joined](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[SideEvent], state: GroupState[CapState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption.map(_.rows).getOrElse(Nil)
          val (emitted, rest) = step(key, it, prior, wmUs)
          nextDeadlineUs(rest) match {
            case Some(d) =>
              state.update(CapState(rest))
              state.setTimeoutTimestamp(
                math.max(d / 1000L, state.getCurrentWatermarkMs() + 1L))
            case None => state.remove()
          }
          emitted.iterator
      }
      .toDF()
      .select(col("user_id"), col("p_event_id"), col("c_event_id"),
        col("p_ts_us"), col("c_ts_us"), col("p_value"), col("c_value"))
  }
}
