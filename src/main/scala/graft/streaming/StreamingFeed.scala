package graft.streaming

import graft.nba.GameFeed
import graft.nba.Model.PbpAction

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming feed ingestion — the reference's poll-fetch-normalize loop
  * (`/root/reference/src/fetcher.py:12,100-115`) as a real Structured
  * Streaming source: event files land in a directory, `readStream` picks
  * them up, and a stateful per-game fold assigns each event its ordinal
  * clock and expands it into typed play-by-play actions — the incremental
  * twin of [[graft.nba.GameFeed.pbp]] (period bracket rows excluded: they
  * need end-of-game knowledge a live stream doesn't have).
  *
  * State per game is O(1) — the event ordinal plus one substitution
  * counter per side — so the operator shards to any game cardinality the
  * state store holds. Ordering contract (same as the reference's append-
  * only poll loop): files must arrive so that each game's events are
  * monotone in (ts, event_id) across micro-batches; within a batch the
  * group iterator is sorted before folding.
  */
object StreamingFeed {

  /** One raw feed event (the driver `events` schema, ts normalized). */
  case class RawEvent(
      user_id: Long, event_id: Long, event_type: String,
      value: Double, ts: java.sql.Timestamp)

  /** Per-game fold state: events seen, substitutions per side. */
  case class FeedState(n: Long, kHome: Long, kAway: Long)

  private def us(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  private def periodOf(clock: Double): Int =
    if (clock < 2880.0) (clock / 720.0).toInt + 1
    else 5 + ((clock - 2880.0) / 300.0).toInt

  /** Expand one event into its pbp actions — the row form of the column
    * mapping in [[GameFeed.pbp]] (change both or neither). `n` is the
    * 1-based event ordinal within the game, `k` the 1-based substitution
    * ordinal within (game, team) when the event is a signup. */
  private[streaming] def actionsOf(e: RawEvent, n: Long, k: Long): Seq[PbpAction] = {
    val g = e.user_id
    val home = g % 4 + 1
    val away = (g + 1) % 4 + 1
    val isHome = e.event_id % 2 == 0
    val team = if (isHome) home else away
    val opp = if (isHome) away else home
    val ev = e.event_id
    val aid = ev * 4
    val clock = n * 45.0 -
      (if (e.event_type == "error" && e.value < 100.0) 40.0 else 0.0)
    val p = periodOf(clock)

    def pa(a: Long, typ: String, sub: Option[String], desc: Option[String],
        res: Option[String], tm: Option[Long], person: Option[Long],
        assist: Option[Long] = None, block: Option[Long] = None,
        steal: Option[Long] = None, drawn: Option[Long] = None,
        jbWon: Option[Long] = None, jbLost: Option[Long] = None,
        jbRec: Option[Long] = None, x: Option[Double] = None,
        y: Option[Double] = None): PbpAction =
      PbpAction(g, a, p, clock, typ, sub, desc, res, tm, person,
        assist, block, steal, drawn, jbWon, jbLost, jbRec,
        x, y, x.map(xv => math.sqrt(xv * xv + y.get * y.get)))

    e.event_type match {
      case "signup" =>
        Seq(
          pa(aid, "substitution", Some("out"), None, None, Some(team),
            Some(team * 100 + (k - 1) % 10)),
          pa(aid + 1, "substitution", Some("in"), None, None, Some(team),
            Some(team * 100 + (k + 4) % 10)))
      case "click" | "purchase" =>
        val made = e.value >= 100.0
        Seq(pa(aid, if (e.event_type == "click") "2pt" else "3pt", None,
          Some(GameFeed.shotStyles((ev % 14).toInt)),
          Some(if (made) "Made" else "Missed"),
          Some(team), Some(team * 100 + ev % 10),
          assist = if (made && ev % 3 == 0) Some(team * 100 + (ev + 1) % 10) else None,
          block = if (!made && ev % 5 == 0) Some(opp * 100 + (ev + 2) % 10) else None,
          x = Some((ev % 50 - 25).toDouble), y = Some((ev % 35).toDouble)))
      case "error" =>
        if (e.value < 100.0)
          Seq(pa(aid, "rebound",
            Some(if (ev % 2 == 0) "defensive" else "offensive"), None, None,
            Some(team), Some(team * 100 + ev % 10)))
        else if (e.value < 180.0)
          Seq(pa(aid, "violation",
            Some(GameFeed.violationSubs((ev % 7).toInt)), None, None,
            Some(team), Some(team * 100 + ev % 10)))
        else
          Seq(pa(aid, "jumpball", Some("recovered"),
            Some(GameFeed.jumpballDescs((ev % 3).toInt)), None,
            Some(team), Some(team * 100 + ev % 10),
            jbWon = Some(team * 100 + ev % 10),
            jbLost = Some(opp * 100 + (ev + 1) % 10),
            jbRec = Some(team * 100 + (ev + 7) % 10)))
      case _ =>
        if (e.value < 80.0) {
          val drawn = opp * 100 + (ev + 3) % 10
          pa(aid, "foul",
            Some(GameFeed.foulSubs((ev % 4).toInt)),
            Some(GameFeed.foulDescs((ev % 5).toInt)), None,
            Some(team), Some(team * 100 + ev % 10), drawn = Some(drawn)) +:
            (1 to 2).map(a => pa(aid + a, "freethrow", Some(s"$a of 2"), None,
              Some(if ((ev + a) % 2 == 0) "Made" else "Missed"),
              Some(opp), Some(drawn)))
        } else if (e.value < 160.0)
          Seq(pa(aid, "turnover",
            Some(GameFeed.turnoverSubs((ev % 6).toInt)),
            Some(GameFeed.turnoverDescs((ev % 3).toInt)), None,
            Some(team), Some(team * 100 + ev % 10),
            steal = if (ev % 4 == 0) Some(opp * 100 + (ev + 5) % 10) else None))
        else
          Seq(pa(aid, "timeout",
            Some(if (ev % 2 == 0) "full" else "short"), None, None,
            Some(team), None))
    }
  }

  /** Streaming entry: raw events in, typed pbp actions out. */
  def actions(events: Dataset[RawEvent]): Dataset[PbpAction] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FeedState, PbpAction](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (gameId: Long, it: Iterator[RawEvent], state: GroupState[FeedState]) =>
          var st = state.getOption.getOrElse(FeedState(0L, 0L, 0L))
          val out = Seq.newBuilder[PbpAction]
          for (e <- it.toSeq.sortBy(e => (us(e.ts), e.event_id))) {
            val n = st.n + 1
            val isSub = e.event_type == "signup"
            val isHome = e.event_id % 2 == 0
            val k =
              if (!isSub) 0L
              else if (isHome) st.kHome + 1
              else st.kAway + 1
            st = FeedState(n,
              if (isSub && isHome) k else st.kHome,
              if (isSub && !isHome) k else st.kAway)
            out ++= actionsOf(e, n, k)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming scan of a directory of driver-schema event parquet files —
    * same ts normalization as the batch reader [[graft.Tables]]. The
    * reference schema is probed from the files already present; `glob`
    * restricts which files count as feed input (e.g. `events.parquet`
    * when the watched directory holds other tables too). */
  def eventsStream(
      spark: SparkSession, dir: String,
      glob: String = "*.parquet"): Dataset[RawEvent] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.Tables.normalizeTs(fileSource(spark, dir, glob))
      .select("user_id", "event_id", "event_type", "value", "ts")
      .as[RawEvent]
  }

  /** Schema-probed file-source stream over one parquet table of the sf
    * directory (`readStream` requires an explicit schema; the batch read
    * supplies it) — the single source-construction path every streaming
    * query shares. */
  def fileSource(spark: SparkSession, dir: String,
      glob: String): org.apache.spark.sql.DataFrame = {
    // footer probe memoized per (session, dir, glob): ~40 drains share a
    // handful of (dir, glob) shapes, and each probe is a driver-side
    // file listing + footer read that never changes within a session
    val refSchema = graft.SessionCache.onceStrong(
      spark, s"streamschema#$dir#$glob") {
      spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    }
    spark.readStream.schema(refSchema)
      .option("pathGlobFilter", glob).parquet(dir)
  }
}
