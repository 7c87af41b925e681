package graft

import graft.queries.{Graphs, Relational, StreamingQ, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-8 curation/agreement batch that the
  * oracle hash can't state on its own: the bag-dedup key must be a
  * coarsening of the exact key (q273), contamination fractions must be
  * well-formed ratios (q274), the classifier's eval ledger must cover
  * exactly the held-out split (q275), novelty counts must reconcile with
  * the distinct-gram universe (q276), DBSCAN labels must be core ids and
  * respect the min-label rule (q277), the coincidence matrix must be
  * symmetric with alpha in range (q278), the stream semi join must be
  * duplicate-free and exactly the batch EXISTS (q279), the quantile cut
  * must keep at least the top quarter (q280), and containment must
  * dominate Jaccard so q23's pairs are a subset (q281).
  */
class Round8dSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val dir01 = "/root/testdata/sf0.01"

  test("q273: bag dedup keeps a subset of exact-dedup keepers") {
    val r = TextPipeline.q273BagDedup.run(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, bag, exact, extra) = (row.getAs[Long]("n_docs"),
        row.getAs[Long]("bag_kept"), row.getAs[Long]("exact_kept"),
        row.getAs[Long]("extra_caught"))
      assert(bag <= exact && exact <= n, s"ledger order broke: $row")
      // same text => same bag, so a bag keeper is always a text keeper
      // and the extra catch is exactly the keeper-count difference
      assert(extra == exact - bag, s"extra_caught mismatch: $row")
    }
  }

  test("q274: contamination fractions are well-formed ratios") {
    val r = TextPipeline.q274ContaminationFrac.run(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (g, h, f) = (row.getAs[Long]("n_grams"), row.getAs[Long]("n_hit"),
        row.getAs[Double]("frac"))
      assert(g > 0 && h >= 0 && h <= g)
      assert(f == h.toDouble / g)
    }
  }

  test("q275: eval ledger covers exactly the held-out split") {
    val r = TextPipeline.q275QualityClassifier.run(spark, dir).collect()
    assert(r.nonEmpty)
    val evalDocs = Tables(spark, dir, "documents")
      .filter(graft.ops.Text.baseHash(
        concat(lit("qf|"), col("doc_id").cast("string"))) % 100 >= 80)
      .count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == evalDocs,
      "confusion ledger row counts must sum to the eval split size")
  }

  test("q276: novelty counts reconcile with the distinct-gram universe") {
    val r = TextPipeline.q276NoveltyCurve.run(spark, dir)
      .orderBy(col("decile")).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (p, n) = (row.getAs[Long]("n_postings"), row.getAs[Long]("n_novel"))
      assert(n >= 0 && n <= p, s"novel grams exceeded postings: $row")
      assert(row.getAs[Double]("novelty_rate") == n.toDouble / p)
    }
    val cum = r.map(_.getAs[Long]("cum_novel"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    val distinctGrams = {
      val toks = graft.ops.Text.tokens(col("text"))
      Tables(spark, dir, "documents")
        .filter(size(toks) >= 8)
        .select(explode(graft.ops.Text.wordShingles(toks, 8)).as("g"))
        .agg(countDistinct(col("g"))).head.getLong(0)
    }
    assert(cum.last == distinctGrams,
      "cumulative novel grams must equal the distinct gram universe")
  }

  test("q277: DBSCAN labels are min-rule core ids (sf0.01)") {
    val r = Graphs.q277GridDbscan.run(spark, dir01).collect()
    assert(r.nonEmpty)
    val cores = r.filter(_.getAs[Boolean]("is_core"))
    assert(cores.nonEmpty, "sf0.01 fixture must produce cores")
    val coreIds = cores.map(_.getAs[Long]("user_id")).toSet
    cores.foreach { row =>
      val c = row.getAs[Long]("cluster")
      assert(c <= row.getAs[Long]("user_id"),
        "component label must be the component's min core id")
      assert(coreIds.contains(c), "core cluster label must be a core id")
    }
    r.filterNot(_.getAs[Boolean]("is_core")).foreach { row =>
      if (!row.isNullAt(row.fieldIndex("cluster")))
        assert(coreIds.contains(row.getAs[Long]("cluster")),
          "border cluster label must be a core id")
    }
    val noise = r.count(r0 => r0.isNullAt(r0.fieldIndex("cluster")))
    assert(cores.length + (r.length - cores.length - noise) + noise
      == r.length)
  }

  test("q278: coincidence matrix is symmetric, alpha in range") {
    val r = Relational.q278KrippendorffAlpha.run(spark, dir).collect()
    assert(r.nonEmpty)
    val alpha = r.head.getAs[Double]("alpha")
    assert(r.forall(_.getAs[Double]("alpha") == alpha))
    assert(alpha >= -1.0 && alpha <= 1.0, s"alpha $alpha out of range")
    val m = r.map(row => (row.getAs[Long]("c"), row.getAs[Long]("k")) ->
      row.getAs[Long]("o2")).toMap
    m.foreach { case ((c, k), v) =>
      assert(m.getOrElse((k, c), 0L) == v, s"asymmetric O[$c,$k]")
    }
    val nUnits = r.head.getAs[Long]("n_units")
    val nRatings = r.head.getAs[Long]("n_ratings")
    assert(nRatings >= 2 * nUnits && nRatings <= 3 * nUnits,
      "every unit has 2 or 3 ratings")
  }

  test("q279: stream semi join = batch EXISTS, duplicate-free") {
    val r = StreamingQ.q279StreamSemiJoin.run(spark, dir).collect()
    assert(r.nonEmpty)
    val ids = r.map(_.getAs[Long]("p_event_id"))
    assert(ids.distinct.length == ids.length,
      "semi join emitted a purchase more than once")
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
    val clicks = ev.filter(_.getAs[String]("event_type") == "click")
      .map(e => (e.getAs[Long]("user_id"), e.getAs[Long]("us")))
    val expected = ev.filter(_.getAs[String]("event_type") == "purchase")
      .filter { p =>
        val (u, t) = (p.getAs[Long]("user_id"), p.getAs[Long]("us"))
        clicks.exists { case (cu, ct) =>
          cu == u && ct >= t - 7200000000L && ct <= t }
      }.map(_.getAs[Long]("event_id")).toSet
    assert(ids.toSet == expected, "semi join != batch EXISTS")
  }

  test("q280: the cut keeps at least the strict top quarter per lang") {
    val r = TextPipeline.q280QuantileCut.run(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, kept) = (row.getAs[Long]("n_docs"), row.getAs[Long]("n_kept"))
      val rank = (3 * n + 3) / 4 // ceil(0.75 n)
      assert(kept >= n - rank + 1, s"cut kept too few: $row")
      assert(kept <= n)
    }
  }

  test("q283: S-curve rates are probabilities; collisions never exceed pairs") {
    val r = TextPipeline.q283LshScurve.run(spark, dir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_collide") <= row.getAs[Long]("n_pairs"))
      val rate = row.getAs[Double]("collide_rate")
      val th = row.getAs[Double]("theory")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(th > 0.0 && th < 1.0)
    }
  }

  test("q284: ROI sweep is monotone in the threshold") {
    val roi = TextPipeline.q284DedupRoi.run(spark, dir)
      .orderBy(col("threshold_pct")).collect()
    assert(roi.length == 5)
    val drops = roi.map(_.getAs[Long]("n_droppable"))
    val toks = roi.map(_.getAs[Long]("tokens_saved"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      "raising the threshold must never drop MORE docs")
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
    roi.foreach { row =>
      val share = row.getAs[Double]("token_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q285: coverage is monotone and exact at full vocabulary") {
    val r = TextPipeline.q285VocabCoverage.run(spark, dir)
      .orderBy(col("vocab_size")).collect()
    assert(r.length == 7)
    val cov = r.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    r.foreach { row =>
      assert(row.getAs[Long]("covered") <= row.getAs[Long]("total"))
      if (row.getAs[Long]("vocab_size") >= row.getAs[Long]("n_types"))
        assert(row.getAs[Long]("covered") == row.getAs[Long]("total"),
          "a vocab covering every type must cover every occurrence")
    }
  }

  test("q286: manifest reconciles with the corpus") {
    val m = TextPipeline.q286IndexManifest.run(spark, dir).collect()
    assert(m.nonEmpty)
    val nDocs = Tables(spark, dir, "documents").count()
    assert(m.map(_.getAs[Long]("n_docs")).sum == nDocs)
    m.foreach { row =>
      assert(row.getAs[Long]("n_chunks") >= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("n_terms") <= row.getAs[Long]("n_postings"))
    }
  }

  test("q287: DiD reconciles with its own four cells") {
    val r = Relational.q287DiffInDiff.run(spark, dir).collect()
    assert(r.length == 4, "all four (arm, period) cells must be present")
    val did = r.head.getAs[Double]("did")
    assert(r.forall(_.getAs[Double]("did") == did))
    def rate(arm: Long, period: Long): Double = r.find(row =>
      row.getAs[Long]("arm") == arm && row.getAs[Long]("period") == period)
      .get.getAs[Double]("rate")
    assert(did == (rate(1, 1) - rate(1, 0)) - (rate(0, 1) - rate(0, 0)),
      "did must equal the cell-rate double difference")
    r.foreach { row =>
      val rt = row.getAs[Double]("rate")
      assert(rt >= 0.0 && rt <= 1.0)
      assert(row.getAs[Long]("n_conv") <= row.getAs[Long]("n_users"))
    }
  }

  test("q281: containment dominates Jaccard; q23 pairs are a subset") {
    val cont = TextPipeline.q281ContainmentPairs.run(spark, dir).collect()
    assert(cont.nonEmpty)
    cont.foreach { row =>
      val (i, sa, sb) = (row.getAs[Long]("i"), row.getAs[Long]("sza"),
        row.getAs[Long]("szb"))
      assert(i <= math.min(sa, sb), "intersection exceeded a set size")
      val (ca, cb) = (row.getAs[Double]("cont_a"), row.getAs[Double]("cont_b"))
      assert(math.max(ca, cb) >= 0.5)
      val jac = i.toDouble / (sa + sb - i)
      assert(ca >= jac && cb >= jac, "containment must dominate Jaccard")
    }
    val contPairs = cont.map(row =>
      (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))).toSet
    val jacPairs = TextPipeline.q23NgramJaccard.run(spark, dir).collect()
      .map(row => (row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b")))
    jacPairs.foreach(p => assert(contPairs.contains(p),
      s"q23 pair $p missing from the containment surface"))
  }
}
