package graft

import graft.ops.{AsOf, Sessionize, TimeKernel}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property tests: operator semantics against straightforward
  * in-memory reference implementations over generated inputs (SURVEY
  * §5.2.3). Run by sbt's native ScalaCheck framework; Spark work is kept
  * small per case (tiny frames, local[4]).
  */
object OpsProperties extends Properties("graft.ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  property("clockSeconds parses any well-formed ISO game clock") = {
    val gen = for {
      m <- Gen.choose(0, 12)
      s <- Gen.choose(0, 59)
      cs <- Gen.choose(0, 99)
    } yield (m, s, cs)
    Prop.forAll(gen) { case (m, s, cs) =>
      import spark.implicits._
      val clock = f"PT${m}M$s%02d.$cs%02dS"
      val got = Seq(clock).toDF("c")
        .select(TimeKernel.clockSeconds(col("c"))).as[Double].head()
      math.abs(got - (m * 60 + s + cs / 100.0)) < 1e-9
    }
  }

  property("sessionize == in-memory fold on random event streams") = {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 5000L)))
    Prop.forAll(gen) { events0 =>
      import spark.implicits._
      events0.isEmpty || {
        val events = events0.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
        val gap = 300L
        val got = Sessionize(
            events.toDF("k", "id", "t"), Seq("k"), "t", gap, tieBreak = Seq("id"))
          .select("id", "session_id").as[(Long, Long)].collect().toMap
        val expected = events.groupBy(_._1).flatMap { case (_, es) =>
          val sorted = es.sortBy(e => (e._3, e._2))
          var sid = 0L
          var prev = Long.MinValue
          sorted.map { case (_, id, t) =>
            if (prev == Long.MinValue || t - prev > gap) sid += 1
            prev = t
            id -> sid
          }
        }.toMap
        got == expected
      }
    }
  }

  property("as-of join == in-memory scan on random state/event sets") = {
    val gen = for {
      evs <- Gen.listOfN(12, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 1000L)))
      sts <- Gen.listOfN(6, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 1000L)))
    } yield (evs, sts)
    Prop.forAll(gen) { case (evs0, sts0) =>
      import spark.implicits._
      evs0.isEmpty || sts0.isEmpty || {
        val evs = evs0.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
        val sts = sts0.zipWithIndex.map { case ((k, t), i) => (k, 100L + i, t) }
        val got = AsOf.join(
            evs.toDF("k", "ev_id", "t"), sts.toDF("k", "st_id", "st_t"),
            Seq("k"), "t", "st_t", payload = Seq("st_id"), tieBreak = Seq("st_id"))
          .select("ev_id", "st_id").as[(Long, Option[Long])].collect().toMap
        val expected = evs.map { case (k, id, t) =>
          val cands = sts.filter(s => s._1 == k && s._3 <= t)
          id -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(s => (s._3, s._2))._2))
        }.toMap
        got == expected
      }
    }
  }

  property("signatureKey fold == naive minhash reference on random docs") = {
    // small vocabulary so generated docs collide, repeat, and share grams
    val word = Gen.oneOf("a", "b", "c", "ab", "ba", "the")
    val gen = Gen.listOfN(4, Gen.choose(3, 10).flatMap(Gen.listOfN(_, word)))
    val P = ops.Text.MinhashP
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def refKey(toks: List[String]): String = {
      val hashes = toks.sliding(3).map(_.mkString(" ")).toSet
        .map((g: String) => java.lang.Long.parseLong(md5Hex(g).take(15), 16) % P)
      val sig = (0 until 12).map(s =>
        hashes.map(h => ((s * 2 + 1) * h + (s * 1000003L + 12345)) % P).min)
      md5Hex(sig.mkString("|"))
    }
    Prop.forAll(gen) { docs =>
      import spark.implicits._
      val got = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"), ops.Text.signatureKey(col("t"), 3, 12).as("key"))
        .as[(Long, String)].collect().toMap
      val expected = docs.zipWithIndex
        .map { case (t, i) => i.toLong -> refKey(t) }.toMap
      got == expected
    }
  }
}
