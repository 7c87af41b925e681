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

  // ------------------------------------------------------- q132 FastSS
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** The 0/1/2-deletion neighborhood q132's variant generation spells
    * with its (i, j) position pairs. */
  private def del2(w: String): Set[String] = {
    val one = (0 until w.length).map(i => w.take(i) + w.drop(i + 1))
    val two = for {
      i <- 0 until w.length
      j <- i + 1 until w.length
    } yield w.take(i) + w.substring(i + 1, j) + w.drop(j + 1)
    Set(w) ++ one ++ two
  }

  /** The theorem q132's candidate join RELIES on (FastSS, Bocek '07):
    * any two strings within edit distance 2 share at least one string
    * in their delete-2 neighborhoods — so the equi-join on variants
    * misses no qualifying pair and the levenshtein filter only ever
    * removes, never needs to add. Exercised over random words with 0-2
    * random insert/delete/substitute edits applied (a 3-letter alphabet
    * keeps coincidental collisions common, which stresses the dedup
    * rather than the theorem). */
  property("q132 FastSS: dist<=2 pairs always share a delete-2 variant") = {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val word = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    def applyOp(w: String): Gen[String] = {
      val insert = for {
        i <- Gen.choose(0, w.length); c <- alpha
      } yield w.take(i) + c + w.drop(i)
      val delete =
        if (w.isEmpty) Gen.const(w)
        else Gen.choose(0, w.length - 1).map(i => w.take(i) + w.drop(i + 1))
      val subst =
        if (w.isEmpty) Gen.const(w)
        else for {
          i <- Gen.choose(0, w.length - 1); c <- alpha
        } yield w.updated(i, c)
      Gen.oneOf(insert, delete, subst)
    }
    val gen = for {
      w <- word
      k <- Gen.choose(0, 2)
      w1 <- if (k >= 1) applyOp(w) else Gen.const(w)
      w2 <- if (k >= 2) applyOp(w1) else Gen.const(w1)
    } yield (w, w2)
    Prop.forAll(gen) { case (w, w2) =>
      lev(w, w2) > 2 || (del2(w) intersect del2(w2)).nonEmpty
    }
  }

  property("HLL registers: merge of any split == sketch of the union") = {
    // the mergeability theorem q171's pane design rests on, over random
    // hash sets and random split points — in-memory, via the aggregate's
    // own update/merge (partition-shape independence is HllSpec's job)
    val gen = for {
      hs <- Gen.listOfN(200, Gen.choose(0L, (1L << 60) - 1))
      cut <- Gen.choose(0, 200)
    } yield (hs, cut)
    Prop.forAll(gen) { case (hs, cut) =>
      import org.apache.spark.sql.GraftBridge
      val agg = graft.functions.HllRegisters(
        GraftBridge.expression(lit(0L)), 10)
      def fold(xs: Seq[Long]) = xs.foldLeft(agg.createAggregationBuffer()) {
        (b, h) =>
          val idx = (h >>> 50).toInt & 1023
          val low = h & ((1L << 50) - 1)
          val rho = if (low == 0L) 51
            else 51 - (64 - java.lang.Long.numberOfLeadingZeros(low))
          if (rho > b(idx)) b(idx) = rho.toByte
          b
      }
      val (l, r) = hs.splitAt(cut)
      val merged = agg.merge(fold(l), fold(r))
      merged.toSeq == fold(hs).toSeq
    }
  }

  property("fused dot product == left-fold reference on random vectors") = {
    // the value identity FuseVectorOps relies on, over random lengths
    // and contents (including the length-mismatch NULL contract); the
    // reference is an IN-MEMORY strict left fold — comparing two Spark
    // spellings would be trivialized by the rewrite rule itself
    val vec = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100, 100).map(_ / 7.0f)))
    Prop.forAll(Gen.zip(vec, vec)) { case (a, b) =>
      import spark.implicits._
      val row = spark.createDataset(Seq((a.toArray, b.toArray)))
        .toDF("a", "b")
        .select(graft.ops.Vectors.dot(col("a"), col("b")).as("fused"))
        .head()
      if (a.length != b.length) row.isNullAt(0)
      else {
        val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + x.toDouble * y.toDouble
        }
        row.getDouble(0) == expected
      }
    }
  }
}
