package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import StreamingCappedJoin.{CapPerHour, Joined, SideEvent, Stored, step}

/** Pure-kernel pin for the capped stream-stream join (q201): [[step]] is
  * exercised directly against a closed-form model over randomized feeds
  * split into randomized micro-batch passes with a really-advancing
  * watermark — the places an incremental stateful operator can diverge
  * from its one-shot oracle (kept-set determinism under slicing, matched
  * flags surviving across passes, emission exactly once per row, late
  * arrivals into sealed buckets). The DuckDB gate pins the one fixed
  * dataset; this pins the state machine on thousands of random ones.
  */
class CappedJoinSpec extends AnyFunSuite {

  private val HourUs = 3600000000L
  private val IntervalUs = 7200000000L
  private val DelayUs = 600000000L
  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  private def ev(user: Long, id: Long, tsUs: Long, p: Boolean): SideEvent =
    SideEvent(user, id, new Timestamp(tsUs / 1000), id * 0.5, p)

  /** The oracle formula, in Scala: QUALIFY-capped sides, purchase rows
    * finalized at wm ≥ end(B), click null rows at wm ≥ end(B) + 2h. */
  private def model(events: Seq[SideEvent], wmUs: Long): Seq[Joined] = {
    def kept(p: Boolean): Seq[SideEvent] = events
      .filter(_.is_purchase == p)
      .groupBy(e => (e.user_id, e.ts.getTime * 1000 / HourUs))
      .values.flatMap(_.sortBy(_.event_id).take(CapPerHour)).toSeq
    def tUs(e: SideEvent): Long = e.ts.getTime * 1000
    def bucket(e: SideEvent): Long = tUs(e) / HourUs
    val (pk, ck) = (kept(true), kept(false))
    val prf = pk.filter(e => (bucket(e) + 1) * HourUs <= wmUs)
    val clf = ck.filter(e => (bucket(e) + 1) * HourUs + IntervalUs <= wmUs)
    def hits(p: SideEvent, c: SideEvent): Boolean =
      c.user_id == p.user_id &&
        tUs(c) >= tUs(p) - IntervalUs && tUs(c) <= tUs(p)
    prf.flatMap { p =>
      val cs = ck.filter(c => hits(p, c))
      if (cs.isEmpty)
        Seq(Joined(p.user_id, Some(p.event_id), None, Some(tUs(p)), None,
          Some(p.value), None))
      else cs.map(c => Joined(p.user_id, Some(p.event_id), Some(c.event_id),
        Some(tUs(p)), Some(tUs(c)), Some(p.value), Some(c.value)))
    } ++ clf.filterNot(c => prf.exists(p => hits(p, c)))
      .map(c => Joined(c.user_id, None, Some(c.event_id), None, Some(tUs(c)),
        None, Some(c.value)))
  }

  /** Drive [[step]] over ts-ordered chunks with the real watermark rule
    * (max seen ts − delay), then a final drain pass; returns every
    * emitted row plus the final watermark. */
  private def drive(events: Seq[SideEvent], chunks: Int): (Seq[Joined], Long) = {
    val ordered = events.sortBy(e => (e.ts.getTime, e.event_id))
    val byUser = ordered.groupBy(_.user_id)
    val out = Seq.newBuilder[Joined]
    val states = collection.mutable.Map.empty[Long, List[Stored]]
    var maxSeenUs = Long.MinValue
    var wmUs = Long.MinValue // pre-first-batch: no watermark yet
    val slices = if (ordered.isEmpty) Seq.empty
      else ordered.grouped(math.max(1, ordered.size / chunks)).toSeq
    for (slice <- slices) {
      for (u <- byUser.keys.toSeq.sorted) {
        val arr = slice.filter(_.user_id == u)
        if (arr.nonEmpty || states.contains(u)) {
          val (emitted, rest) =
            step(u, arr.iterator, states.getOrElse(u, Nil), wmUs)
          out ++= emitted
          if (rest.isEmpty) states.remove(u) else states(u) = rest
        }
      }
      maxSeenUs = math.max(maxSeenUs, slice.map(_.ts.getTime * 1000).max)
      wmUs = maxSeenUs - DelayUs // watermark advances AFTER the batch
    }
    for (u <- states.keys.toSeq.sorted) {
      val (emitted, rest) = step(u, Iterator.empty, states(u), wmUs)
      out ++= emitted
      if (rest.isEmpty) states.remove(u) else states(u) = rest
    }
    (out.result(), wmUs)
  }

  test("randomized feeds, sliced arbitrarily, equal the closed-form oracle") {
    val rnd = new scala.util.Random(20260814L)
    for (iter <- 1 to 200) {
      val nUsers = 1 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(60)
      val events = (1 to n).map { i =>
        ev(rnd.nextInt(nUsers).toLong, i.toLong,
          // ~8 hours of feed => several buckets straddle every deadline
          BaseUs + rnd.nextLong(8L * HourUs) / 1000 * 1000,
          rnd.nextBoolean())
      }
      val (got, wmUs) = drive(events, 1 + rnd.nextInt(5))
      val want = model(events, wmUs)
      assert(got.sortBy(_.toString) == want.sortBy(_.toString),
        s"iter $iter: engine ${got.size} rows vs model ${want.size}")
    }
  }

  test("cap keeps the K smallest event ids of a hot (user, hour)") {
    // 50 purchases + 50 clicks in ONE (user, hour): output must pair the
    // 8 smallest of each side, never the 2500 raw combinations. The
    // sentinel event pushes the final watermark past every deadline.
    val events =
      (1 to 50).map(i => ev(7, 100 + i, BaseUs + i * 1000000L, p = true)) ++
        (1 to 50).map(i => ev(7, 200 + i, BaseUs + i * 1000000L, p = false)) :+
        ev(99, 999, BaseUs + 10 * HourUs, p = true)
    val (got, wmUs) = drive(events, 3)
    val hot = got.filter(_.user_id == 7)
    // kept sides are (101..108) x (201..208); c_ts <= p_ts pairs j <= i
    assert(hot.size == CapPerHour * (CapPerHour + 1) / 2,
      s"expected K(K+1)/2 capped pairs, got ${hot.size}")
    assert(hot.flatMap(_.p_event_id).distinct.sorted == (101 to 108).map(_.toLong))
    assert(hot.flatMap(_.c_event_id).distinct.sorted == (201 to 208).map(_.toLong))
    assert(got.sortBy(_.toString) == model(events, wmUs).sortBy(_.toString))
  }

  test("late arrival into a sealed bucket is dropped, not resurrected") {
    val early = ev(1, 1, BaseUs, p = true)
    // pass 1: bucket 0 purchase arrives, no watermark yet
    val (out1, st1) = step(1, Iterator(early), Nil, Long.MinValue)
    assert(out1.isEmpty && st1.size == 1)
    // watermark passes end(bucket 0): the purchase null-emits
    val wm = (BaseUs / HourUs + 1) * HourUs
    val (out2, st2) = step(1, Iterator.empty, st1, wm)
    assert(out2.map(_.p_event_id) == Seq(Some(1L)) && st2.isEmpty)
    // a straggler click for the sealed bucket must NOT enter state or
    // emit a row the one-shot oracle wouldn't have
    val straggler = ev(1, 2, BaseUs + 1000000L, p = false)
    val (out3, st3) = step(1, Iterator(straggler), st2, wm)
    assert(out3.isEmpty && st3.isEmpty)
  }
}
