package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property pin for the stream-join ORACLE MODEL (q90/q99/q100): over
  * random event streams fed as chronological micro-batches, the drained
  * inner/left/full watermarked interval join must equal the closed-form
  * formula the DuckDB oracles encode —
  *
  *  - pairs: all same-user (purchase, click) with
  *    `p_ts − 2h ≤ c_ts ≤ p_ts`;
  *  - global watermark: `min(max p_ts, max c_ts)` ms-truncated − 10 min,
  *    and NO watermark (⇒ no eviction rows) when EITHER side is empty —
  *    each input's watermark comes only from its own events;
  *  - left eviction: unmatched purchases with `p_ts < wm` (strict);
  *  - right eviction: unmatched clicks with `c_ts + 2h < wm` — click
  *    state lives the interval OFFSET past its event time.
  *
  * The min-of-both-streams subtlety, the ms truncation, both strict
  * cutoffs, and the empty-side edge are exactly the places a feed change
  * could silently diverge from the hand-derived oracle SQL; random
  * streams keep them pinned from the Spark side (the CORRECTNESS gate
  * pins them from the DuckDB side on the one fixed dataset).
  */
object StreamJoinProperties extends Properties("graft.streaming.joins") {

  // each case drives a real streaming query to completion — keep counts low
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkTestSession.spark
  private val nameSeq = new AtomicInteger(0)

  private val BandUs = 7200000000L // 2h interval band
  private val DelayUs = 600000000L // 10 min watermark delay
  private val BaseUs = 1704067200000000L // 2024-01-01T00:00:00Z

  private case class Ev(id: Long, user: Long, tsUs: Long)

  /** (events per side, batch counts) — MICROsecond-granularity offsets
    * so the watermark's ms truncation is a real truncation, not a no-op;
    * sides may be EMPTY (the LEAST-NULL oracle edge). */
  private val streamsGen: Gen[(List[Ev], List[Ev], Int, Int)] = for {
    nP <- Gen.choose(0, 6)
    nC <- Gen.choose(0, 12)
    users <- Gen.choose(1, 3)
    pOffs <- Gen.listOfN(nP, Gen.choose(0L, 6L * 3600 * 1000000))
    cOffs <- Gen.listOfN(nC, Gen.choose(0L, 6L * 3600 * 1000000))
    pUsers <- Gen.listOfN(nP, Gen.choose(0L, users.toLong - 1))
    cUsers <- Gen.listOfN(nC, Gen.choose(0L, users.toLong - 1))
    pBatches <- Gen.choose(1, 3)
    cBatches <- Gen.choose(1, 3)
  } yield {
    val ps = pOffs.zip(pUsers).zipWithIndex.map { case ((off, u), i) =>
      Ev(500L + i, u, BaseUs + off)
    }.sortBy(e => (e.tsUs, e.id))
    val cs = cOffs.zip(cUsers).zipWithIndex.map { case ((off, u), i) =>
      Ev(100L + i, u, BaseUs + off)
    }.sortBy(e => (e.tsUs, e.id))
    (ps, cs, pBatches, cBatches)
  }

  private def inBand(p: Ev, c: Ev): Boolean =
    c.user == p.user && c.tsUs >= p.tsUs - BandUs && c.tsUs <= p.tsUs

  /** The oracle formula, in Scala: (matched pairs, left nulls, right nulls). */
  private def expected(ps: List[Ev], cs: List[Ev])
      : Set[(Option[Long], Option[Long])] = {
    val pairs = for { p <- ps; c <- cs if inBand(p, c) }
      yield (Some(p.id): Option[Long], Some(c.id): Option[Long])
    val wm: Option[Long] =
      if (ps.isEmpty || cs.isEmpty) None
      else Some(math.min(ps.map(_.tsUs).max / 1000 * 1000,
        cs.map(_.tsUs).max / 1000 * 1000) - DelayUs)
    val leftNulls = ps.filter(p => !cs.exists(c => inBand(p, c)))
      .filter(p => wm.exists(p.tsUs < _))
      .map(p => (Some(p.id): Option[Long], None: Option[Long]))
    val rightNulls = cs.filter(c => !ps.exists(p => inBand(p, c)))
      .filter(c => wm.exists(c.tsUs + BandUs < _))
      .map(c => (None: Option[Long], Some(c.id): Option[Long]))
    (pairs ++ leftNulls ++ rightNulls).toSet
  }

  private def keep(joinType: String,
      rows: Set[(Option[Long], Option[Long])]): Set[(Option[Long], Option[Long])] =
    joinType match {
      case "inner" => rows.filter(r => r._1.isDefined && r._2.isDefined)
      case "leftOuter" => rows.filter(_._1.isDefined)
      case _ => rows
    }

  /** Feed each stream in chronological order, split into `nb` batches,
    * alternating sides; a trailing EMPTY batch per side forces the final
    * watermark-advance eviction micro-batch deterministically. */
  private def drain(joinType: String, ps: List[Ev], cs: List[Ev],
      pBatches: Int, cBatches: Int): Set[(Option[Long], Option[Long])] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def toTs(us: Long) = // keep the microsecond component intact
      java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000, (us % 1000000) * 1000))
    val purchIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clickIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val p = purchIn.toDS().toDF("p_event_id", "user_id", "p_ts")
      .withWatermark("p_ts", "10 minutes")
    val c = clickIn.toDS().toDF("c_event_id", "c_user_id", "c_ts")
      .withWatermark("c_ts", "10 minutes")
    val joined = p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS") &&
        col("c_ts") <= col("p_ts"),
      joinType)
      .select(col("p_event_id"), col("c_event_id"))
    val sink = s"join_prop_${nameSeq.incrementAndGet()}"
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(sink).start()
    try {
      def slices(evs: List[Ev], nb: Int): List[List[Ev]] = {
        val size = math.max(1, (evs.length + nb - 1) / math.max(1, nb))
        evs.grouped(size).toList
      }
      val pSlices = slices(ps, pBatches).iterator
      val cSlices = slices(cs, cBatches).iterator
      while (pSlices.hasNext || cSlices.hasNext) {
        if (pSlices.hasNext) {
          purchIn.addData(pSlices.next().map(e => (e.id, e.user, toTs(e.tsUs))))
          q.processAllAvailable()
        }
        if (cSlices.hasNext) {
          clickIn.addData(cSlices.next().map(e => (e.id, e.user, toTs(e.tsUs))))
          q.processAllAvailable()
        }
      }
      // trailing empty batches: the last data batch's watermark update
      // only takes effect in a SUBSEQUENT micro-batch
      purchIn.addData(Seq.empty)
      clickIn.addData(Seq.empty)
      q.processAllAvailable()
      spark.table(sink).collect().map { r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }.toSet
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $sink")
    }
  }

  for (joinType <- Seq("inner", "leftOuter", "fullOuter"))
    property(s"$joinType drain equals the closed-form watermark model") =
      Prop.forAll(streamsGen) { case (ps, cs, pb, cb) =>
        val got = drain(joinType, ps, cs, pb, cb)
        val want = keep(joinType, expected(ps, cs))
        if (got != want)
          println(s"[$joinType] got-want=${got.diff(want)} want-got=${want.diff(got)}")
        got == want
      }
}
