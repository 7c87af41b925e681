package graft

import java.nio.file.Files

import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

/** Independent O(n²)/O(n log n) in-memory references for the event-time
  * window operators (q137 nearest as-of, q139 longest streak, q143
  * interval union), driven through the REAL query code over a generated
  * events.parquet — the DuckDB oracle re-spells the same window algebra,
  * so these brute-force twins are the genuinely independent check. The
  * generator grids timestamps to seconds so same-instant ties (click vs
  * purchase, click vs click) actually occur.
  */
object BruteForceSpec {
  case class Ev(id: Long, tsUs: Long, user: Long, typ: String, value: Double)
}

class BruteForceSpec extends AnyFunSuite {
  import BruteForceSpec.Ev
  private lazy val spark = SparkTestSession.spark

  private lazy val (dir, events) = {
    val rnd = new scala.util.Random(42)
    val types = Seq("click", "purchase", "view", "error")
    val evs = (0 until 400).map { i =>
      Ev(i.toLong, rnd.nextInt(3000) * 1000000L, rnd.nextInt(8).toLong,
        types(rnd.nextInt(types.size)), rnd.nextInt(6).toDouble)
    }
    val tmp = Files.createTempDirectory("graft-brute-").toString
    import spark.implicits._
    import org.apache.spark.sql.functions._
    evs.toDF("id", "tsUs", "user", "typ", "value")
      .select(col("id").as("event_id"), expr("timestamp_micros(tsUs)").as("ts"),
        col("user").as("user_id"), col("typ").as("event_type"), col("value"),
        lit("{}").as("props"))
      .coalesce(1).write.parquet(s"$tmp/events.parquet")
    (tmp, evs)
  }

  test("q137 nearest as-of == brute-force nearest click with tie rules") {
    val tol = 3600L * 1000000L
    val expected = events.filter(_.typ == "purchase").map { p =>
      val clicks = events.filter(c => c.typ == "click" && c.user == p.user)
      // backward candidate: the click latest in (ts, id) order at-or-before
      val back = clicks.filter(c => c.tsUs < p.tsUs ||
        (c.tsUs == p.tsUs)).sortBy(c => (c.tsUs, c.id)).lastOption
      val fwd = clicks.filter(_.tsUs > p.tsUs).sortBy(c => (c.tsUs, c.id)).headOption
      val gb = back.map(c => p.tsUs - c.tsUs)
      val gf = fwd.map(c => c.tsUs - p.tsUs)
      val backWins = gb.exists(g => g <= tol &&
        (gf.isEmpty || gf.get > tol || g <= gf.get))
      val (cid, gap) =
        if (backWins) (back.map(_.id), gb)
        else if (gf.exists(_ <= tol)) (fwd.map(_.id), gf.map(-_))
        else (None, None)
      (p.id, (p.user, cid, gap))
    }.toMap
    val got = Relational.q137AsOfNearest.run(spark, dir).collect().map { r =>
      (r.getLong(0), (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got == expected)
  }

  test("q139 longest streak == brute-force run scan") {
    val expected = events.groupBy(_.user).map { case (u, es) =>
      val sorted = es.sortBy(e => (e.tsUs, e.id))
      // maximal strictly-increasing runs
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[Ev]]
      sorted.foreach { e =>
        if (runs.nonEmpty && e.value > runs.last.last.value) runs(runs.size - 1) = runs.last :+ e
        else runs += Seq(e)
      }
      val best = runs.maxBy(r => (r.length, -r.head.tsUs))
      (u, (best.length.toLong, best.head.tsUs, best.last.tsUs))
    }
    val got = Relational.q139LongestStreak.run(spark, dir).collect().map { r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toMap
    assert(got == expected)
  }

  test("q143 interval union == brute-force sweep") {
    val expected = events.groupBy(_.user).map { case (u, es) =>
      val iv = es.map(e => (e.tsUs, e.tsUs + (1L + e.value.toLong) * 60000000L))
        .sortBy(identity)
      var blocks = 0L; var covered = 0L
      var curS = -1L; var curE = -1L
      iv.foreach { case (s, e) =>
        if (blocks == 0 || s > curE) {
          if (blocks > 0) covered += curE - curS
          blocks += 1; curS = s; curE = e
        } else curE = math.max(curE, e)
      }
      covered += curE - curS
      (u, (blocks, covered))
    }
    val got = Relational.q143IntervalUnion.run(spark, dir).collect().map { r =>
      (r.getLong(0), (r.getLong(1), r.getLong(2)))
    }.toMap
    assert(got == expected)
  }
}
