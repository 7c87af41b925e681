package graft

import graft.queries.{Graphs, StreamingQ, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-3 analytics additions: the
  * fixed-point PageRank (q78), TF-IDF top-k (q79), and the watermarked
  * streaming window aggregation (q80). Value-level correctness is the
  * DuckDB oracle gate; these pin the invariants the oracle can't see.
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q78: source-only vertices keep the teleport rank exactly") {
    val ranks = Graphs.q78PageRank.run(spark, dir).cache()
    // customers (1e12+) and suppliers (2e12+) have no in-edges: their
    // rank is exactly the teleport term 150_000 after every iteration
    val sources = ranks.filter(col("node_id") >= 1000000000000L)
    assert(sources.filter(col("rank_micro") =!= 150000L).count() == 0)
    // every rank carries at least the teleport mass
    assert(ranks.filter(col("rank_micro") < 150000L).count() == 0)
    // regions (1000..1004) accumulate more than any single nation feeding
    // them: rank flows down the customer→nation→region hierarchy
    val minRegion = ranks.filter(col("node_id").between(1000L, 1004L))
      .agg(min("rank_micro")).head.getLong(0)
    assert(minRegion > 150000L)
    ranks.unpersist()
  }

  test("q78: vertex set is complete and ranks are deterministic") {
    val a = Graphs.q78PageRank.run(spark, dir)
    val b = Graphs.q78PageRank.run(spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val nVerts = Tables(spark, dir, "customer").count() +
      Tables(spark, dir, "supplier").count() +
      Tables(spark, dir, "nation").count() +
      Tables(spark, dir, "region").count()
    assert(a.count() == nVerts)
  }

  test("q79: top-3 per doc, rank bounds, and the score identity") {
    val t = TextPipeline.q79Tfidf.run(spark, dir).cache()
    assert(t.groupBy("doc_id").count().filter(col("count") > 3).count() == 0)
    assert(t.filter(col("rnk") < 1 || col("rnk") > 3).count() == 0)
    val nDocs = Tables(spark, dir, "documents").count()
    // tfidf column is exactly tf * N / df in that operation order
    val broken = t.filter(
      col("tfidf") =!= col("tf").cast("double") * lit(nDocs) / col("df"))
    assert(broken.count() == 0)
    // df counts documents, so never exceeds N and never undercuts 1
    assert(t.filter(col("df") < 1 || col("df") > nDocs).count() == 0)
    t.unpersist()
  }

  test("q84: triangles through a nation = C(regionSize-1, 2)") {
    val got = Graphs.q84Triangles.run(spark, dir)
    val expect = Tables(spark, dir, "nation")
      .withColumn("k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("n_regionkey"))))
      .select(col("n_nationkey").cast("long").as("nationkey"),
        ((col("k") - 1) * (col("k") - 2) / 2).cast("long").as("triangles"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("q85: distances layer monotonically down the DAG") {
    val d = Graphs.q85ShortestPath.run(spark, dir).cache()
    def layerMin(lo: Long, hi: Long) = d
      .filter(col("node_id") >= lo && col("node_id") < hi)
      .agg(min("dist")).head.getLong(0)
    // customers are the 0-distance source set
    assert(d.filter(col("node_id") >= 1000000000000L &&
      col("node_id") < 2000000000000L && col("dist") =!= 0L).count() == 0)
    // every order is exactly one hop from its customer
    assert(d.filter(col("node_id") >= 2000000000000L &&
      col("node_id") < 3000000000000L && col("dist") =!= 1L).count() == 0)
    // suppliers sit at 1 + min quantity (>= 2), nations/regions one more hop
    assert(layerMin(3000000000000L, 4000000000000L) >= 2L)
    assert(layerMin(0L, 1000L) >= 3L)
    assert(layerMin(1000L, 2000L) >= 4L)
    d.unpersist()
  }

  test("q81: streaming dedup emits exactly the batch-distinct hash set") {
    val got = StreamingQ.q81StreamDedup.run(spark, dir)
    val batch = Tables(spark, dir, "documents")
      .select(md5(col("text")).as("content_hash")).distinct()
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // no duplicate emissions across micro-batches
    assert(got.count() == got.distinct().count())
  }

  test("q87: token spans tile each language shard without gaps") {
    val t = graft.queries.TextPipeline.q87SeqPack.run(spark, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
    val broken = t
      .withColumn("prev_end", lag(col("end_tok"), 1, 0L).over(w))
      .filter(col("start_tok") =!= col("prev_end"))
    assert(broken.count() == 0)
    // chunk ids are consistent with the spans
    assert(t.filter(col("start_chunk") =!= expr("start_tok div 4096") ||
      col("end_chunk") =!= expr("(end_tok - 1) div 4096")).count() == 0)
  }

  test("q89: near-dup pairs straddling the split surface as contamination") {
    // a planted near-duplicate with one side in the 5% test split and the
    // other in train shares many RARE 8-grams — the decontamination query
    // must report exactly that pair (one such pair exists at sf0.001)
    val isTest = graft.ops.Text.baseHash(
      concat(lit("smp|"), col("doc_id").cast("string"))) % 100 < 5
    val split = Tables(spark, dir, "documents")
      .select(col("doc_id"), isTest.as("is_test"))
    val dup = graft.queries.TextPipeline.q25MinhashDedup.run(spark, dir)
    val straddling = dup
      .join(split.select(col("doc_id").as("doc_a"), col("is_test").as("ta")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("is_test").as("tb")), "doc_b")
      .filter(col("ta") =!= col("tb"))
      .select(
        when(col("ta"), col("doc_a")).otherwise(col("doc_b")).as("test_doc"),
        when(col("ta"), col("doc_b")).otherwise(col("doc_a")).as("train_doc"))
    assert(straddling.count() > 0, "fixture lost its straddling near-dup pair")
    val flagged = graft.queries.TextPipeline.q89Contamination.run(spark, dir)
      .select(col("test_doc"), col("train_doc"))
    assert(straddling.exceptAll(flagged).isEmpty,
      "a straddling near-dup pair was not reported as contamination")
  }

  test("q80: streaming windowed agg equals the batch cutoff computation") {
    val got = StreamingQ.q80StreamWindow.run(spark, dir)
    val ev = Tables(spark, dir, "events")
    // Spark's event-time watermark is MILLISECOND-truncated (max event
    // time is accumulated in ms), so the batch twin truncates too
    val wmUs =
      (ev.agg(max(expr("unix_micros(ts)"))).head.getLong(0) / 1000L - 600000L) * 1000L
    val batch = ev
      .withColumn("bucket_start", expr("unix_micros(ts) div 3600000000") * 3600)
      .filter((col("bucket_start") + lit(3600L)) * lit(1000000L) <= wmUs)
      .groupBy("bucket_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(col("bucket_start"), col("event_type"), col("n_events"),
        col("sum_value"))
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("q95b: trained IVF beats the label quantizer's recall@5") {
    import graft.queries.Embeddings
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall"))).head.getDouble(0)
    val trained = meanRecall(Embeddings.q95bIvfRecall.run(spark, dir))
    val label = meanRecall(Embeddings.q95AnnRecall.run(spark, dir))
    // measured 0.59 vs 0.13 on this corpus; the bound leaves slack for
    // fixture regeneration but pins the ordering and a real margin
    assert(trained >= 0.4, s"trained-IVF recall $trained fell below 0.4")
    assert(trained > label + 0.1,
      s"trained-IVF recall $trained does not clear label-IVF $label")
  }

  test("q137: nearest-as-of gaps stay inside ±1h and pair with a click") {
    import graft.queries.Relational
    val r = Relational.q137AsOfNearest.run(spark, dir).cache()
    val tol = 3600L * 1000000L
    assert(r.filter(abs(col("gap_us")) > tol).count() == 0,
      "a matched click fell outside the tolerance")
    // click_id and gap_us are set or null together
    assert(r.filter(col("click_id").isNull =!= col("gap_us").isNull).count() == 0)
    // q04's backward match bounds the nearest match: whenever q04 found a
    // click at gap g, the nearest |gap| can only be <= g
    val back = Relational.q04AsOfAttribution.run(spark, dir)
      .filter(col("gap_us") <= tol)
      .select(col("event_id"), col("gap_us").as("back_gap"))
    val worse = r.join(back, Seq("event_id"))
      .filter(col("gap_us").isNull || abs(col("gap_us")) > col("back_gap"))
    assert(worse.count() == 0, "nearest match is worse than the backward match")
    r.unpersist()
  }

  test("q138: region cliques have coefficient exactly 1") {
    val c = Graphs.q138ClusteringCoeff.run(spark, dir).cache()
    // every region in the fixture holds >= 3 nations -> every
    // neighbourhood is itself a clique
    assert(c.filter(col("degree") >= 2 && col("coeff") =!= 1.0).count() == 0)
    // triangles = C(degree, 2) on a clique
    val broken = c.filter(col("degree") >= 2 &&
      col("triangles") =!= col("degree") * (col("degree") - 1) / 2)
    assert(broken.count() == 0, "triangle count is not C(deg,2) on a clique")
    c.unpersist()
  }

  test("q141: diversity measures respect their exact-rational bounds") {
    val d = TextPipeline.q141LexicalStats.run(spark, dir).cache()
    assert(d.filter(col("n_types") > col("n_tokens")).count() == 0)
    assert(d.filter(col("ttr") <= 0.0 || col("ttr") > 1.0).count() == 0)
    // the top token's share can never undercut the uniform share 1/types
    assert(d.filter(col("top_share") * col("n_types") < 1.0).count() == 0)
    assert(d.filter(col("gini") < 0.0 || col("gini") >= 1.0).count() == 0)
    d.unpersist()
  }

  test("q143: interval union covers at least the longest single interval") {
    import graft.queries.Relational
    val u = Relational.q143IntervalUnion.run(spark, dir)
    val perUser = Tables(spark, dir, "events")
      .select(col("user_id"),
        ((lit(1L) + floor(col("value")).cast("long")) * 60000000L).as("dur"))
      .groupBy("user_id")
      .agg(max(col("dur")).as("max_dur"), count(lit(1)).as("n_ev"),
        sum(col("dur")).as("sum_dur"))
    val j = u.join(perUser, Seq("user_id")).cache()
    // union length is sandwiched: one interval <= covered <= sum of all
    assert(j.filter(col("covered_us") < col("max_dur")).count() == 0)
    assert(j.filter(col("covered_us") > col("sum_dur")).count() == 0)
    assert(j.filter(col("n_blocks") < 1 || col("n_blocks") > col("n_ev")).count() == 0)
    j.unpersist()
  }

  test("q149: no near-dup pair straddles the split; naive doc-hash would") {
    import graft.ops.Text
    // sf0.01: the sf0.001 corpus has too few near-dup pairs for the
    // naive-split counterfactual to be non-vacuous
    val d01 = "/root/testdata/sf0.01"
    val split = TextPipeline.q149LeakageSplit.run(spark, d01).cache()
    val pairs = TextPipeline.q25MinhashDedup.run(spark, d01)
      .select(col("doc_a"), col("doc_b"))
    val sa = split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val sb = split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val straddling = pairs.join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() == 0, "a near-dup pair crossed the split")
    // the counterfactual: per-DOC hash bucketing strands some pair across
    // the boundary on this corpus — the leak q89 measures and q149 fixes
    val naive = split.select(col("doc_id"),
      (Text.baseHash(concat(lit("spl|"), col("doc_id").cast("string"))) % 100)
        .as("bucket"))
      .select(col("doc_id"), when(col("bucket") < 90, "train")
        .when(col("bucket") < 95, "val").otherwise("test").as("nsplit"))
    val na = naive.select(col("doc_id").as("doc_a"), col("nsplit").as("split_a"))
    val nb = naive.select(col("doc_id").as("doc_b"), col("nsplit").as("split_b"))
    val naiveStraddle = pairs.join(na, Seq("doc_a")).join(nb, Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b")).count()
    assert(naiveStraddle > 0,
      "fixture lost its cross-split near-dups; the counterfactual is vacuous")
    // 90/5/5 draw lands near its targets at cluster granularity
    val shares = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shares("train") > shares.values.sum * 7 / 10)
    split.unpersist()
  }

  test("q153: every aligned z-range confines both dimensions to 2^4") {
    import graft.queries.Relational
    // Morton guarantee: an aligned z-range of size 2^(2k) pins each
    // dimension inside an aligned 2^k window — the property that makes
    // the layout prunable on EITHER dimension
    val b = Relational.q153ZorderLayout.run(spark, dir).cache()
    assert(b.count() > 1, "degenerate layout: one bucket")
    assert(b.filter(col("x_max") - col("x_min") > 15).count() == 0)
    assert(b.filter(col("y_max") - col("y_min") > 15).count() == 0)
    // and the windows are aligned, not just narrow
    assert(b.filter(expr("x_min div 16") =!= expr("x_max div 16")).count() == 0)
    b.unpersist()
  }

  test("q161: MERGE semantics — last op decides carry/replace/drop") {
    import graft.queries.Relational
    val ev = Tables(spark, dir, "events")
    val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
    val r = Relational.q161CdcApply.run(spark, dir).cache()
    // one row per key, src is a closed enum
    assert(r.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(r.filter(!col("src").isin("base", "changelog")).count() == 0)
    // a key whose LAST post-cutoff op is a delete is absent; every other
    // key with any event survives
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastOp = ev.filter(col("ts") >= cutoff)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"),
        (col("event_type") === "error").as("deleted"))
    val allUsers = ev.select("user_id").distinct()
    val expected = allUsers.join(lastOp, Seq("user_id"), "left")
      .filter(col("deleted").isNull || !col("deleted"))
    assert(r.select("user_id").exceptAll(expected.select("user_id")).isEmpty)
    assert(expected.select("user_id").exceptAll(r.select("user_id")).isEmpty)
    // keys untouched by the changelog carry the base row (src = base)
    val untouched = allUsers.join(
      ev.filter(col("ts") >= cutoff).select("user_id").distinct(),
      Seq("user_id"), "left_anti")
    assert(r.join(untouched, Seq("user_id"), "left_semi")
      .filter(col("src") =!= "base").count() == 0)
    r.unpersist()
  }

  test("q162: SCD2 versions tile each user's timeline exactly") {
    import graft.queries.Relational
    val d = Relational.q162Scd2.run(spark, dir).cache()
    // exactly one open (current) version per user
    val openPerUser = d.groupBy("user_id")
      .agg(sum(col("is_current")).as("n_open"))
    assert(openPerUser.filter(col("n_open") =!= 1).count() == 0)
    // versions are 1..k dense and ordered by valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from_us", "version")
    val seq = d.withColumn("rk", row_number().over(w).cast("long"))
    assert(seq.filter(col("rk") =!= col("version")).count() == 0)
    // adjacent versions tile: valid_to == next valid_from, no gaps/overlap
    val tiled = d.withColumn("nxt", lead(col("valid_from_us"), 1).over(w))
    assert(tiled.filter(col("nxt").isNotNull &&
      col("valid_to_us") =!= col("nxt")).count() == 0)
    assert(tiled.filter(col("nxt").isNull &&
      col("valid_to_us").isNotNull).count() == 0)
    // no version repeats its predecessor's state (duplicates collapsed)
    val rep = d.withColumn("pstate", lag(col("state"), 1).over(w))
      .filter(col("pstate") === col("state"))
    assert(rep.count() == 0)
    d.unpersist()
  }

  test("q163: drift cells reconcile with the raw event counts") {
    import graft.queries.Relational
    val d = Relational.q163DriftChisq.run(spark, dir).cache()
    val total = Tables(spark, dir, "events").count()
    val sums = d.agg(sum("ref_n").as("r"), sum("live_n").as("l")).head
    assert(sums.getLong(0) + sums.getLong(1) == total)
    // chi-square contributions are non-negative wherever defined, and
    // expected counts redistribute exactly the live total
    assert(d.filter(col("chi_contrib") < 0).count() == 0)
    val eSum = d.agg(sum("expected")).head.getDouble(0)
    assert(math.abs(eSum - sums.getLong(1)) < 1e-6)
    d.unpersist()
  }

  test("q165: r bounded, pair counts match the hour span") {
    import graft.queries.Relational
    val a = Relational.q165Autocorr.run(spark, dir).cache()
    assert(a.filter(col("r_lag24") < -1.0 || col("r_lag24") > 1.0).count() == 0)
    // n_pairs = span - 24: the lag drops exactly the first 24 grid hours
    val spans = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg((max(expr("unix_micros(ts) div 3600000000"))
        - min(expr("unix_micros(ts) div 3600000000")) + 1).as("span"))
    val bad = a.join(spans, "event_type")
      .filter(col("n_pairs") =!= col("span") - 24)
    assert(bad.count() == 0)
    a.unpersist()
  }

  test("q168: point-in-time lookup is a bijection on purchases") {
    import graft.queries.Relational
    val r = Relational.q168PitJoin.run(spark, dir).cache()
    val nPurchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    // exactly one version matches each purchase — no loss, no fan-out
    assert(r.count() == nPurchases)
    assert(r.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    // the matched version was indeed open at the purchase time
    val ts = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
    val stale = r.join(ts, "event_id")
      .filter(col("tus") < col("valid_from_us"))
    assert(stale.count() == 0)
    // and a purchase's state is by construction 'purchase': the purchase
    // event itself opens or extends the version covering its timestamp
    assert(r.filter(col("state") =!= "purchase").count() == 0)
    r.unpersist()
  }

  test("q169: transition mass conserves and rows normalize per source") {
    import graft.queries.Relational
    val m = Relational.q169Transitions.run(spark, dir).cache()
    // total transitions = Σ (session length − 1)
    val sessLens = graft.ops.Sessionize(
        Tables(spark, dir, "events"), Seq("user_id"), "ts",
        gapMicros = 30L * 60 * 1000000, tieBreak = Seq("event_id"))
      .groupBy("user_id", "session_id").count()
    val expectedSteps = sessLens.agg(sum(col("count") - 1)).head.getLong(0)
    assert(m.agg(sum("n")).head.getLong(0) == expectedSteps)
    // each row of the matrix sums to probability 1
    val rows = m.groupBy("from_type").agg(sum("p").as("psum"))
    assert(rows.filter(abs(col("psum") - 1.0) > 1e-9).count() == 0)
    m.unpersist()
  }

  test("q170: incremental refresh equals the full recompute") {
    import graft.queries.Relational
    val r = Relational.q170IvmRefresh.run(spark, dir)
      .select("user_id", "event_type", "n", "value_sum")
    val direct = Tables(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,2)")).cast("double")
          .as("value_sum"))
    assert(r.exceptAll(direct).isEmpty && direct.exceptAll(r).isEmpty)
  }

  test("q171: merged panes equal the sketch of the raw 6-hour union") {
    import graft.queries.Relational
    import graft.functions.Hll
    import graft.ops.Text
    val r = Relational.q171HllPaneMerge.run(spark, dir).cache()
    val last = r.agg(max("bucket_start")).head.getLong(0)
    val hrEnd = last / 3600
    val direct = Tables(spark, dir, "events")
      .filter(expr(
        s"unix_micros(ts) div 3600000000 between ${hrEnd - 5} and $hrEnd"))
      .agg(Hll.registers(Text.baseHash(col("user_id").cast("string")), 10)
        .as("m"))
      .select(expr("aggregate(m, cast(0 as bigint)," +
        " (acc, r) -> acc + shiftleft(cast(1 as bigint), 51 - r))")
        .as("s_sum"))
      .head.getLong(0)
    val merged = r.filter(col("bucket_start") === last)
      .head.getAs[Long]("s_sum")
    assert(merged == direct,
      s"pane merge diverged from the union sketch: $merged vs $direct")
    r.unpersist()
  }

  test("q173: the histogram draw lands on the true lower median") {
    import graft.queries.Relational
    val r = Relational.q173MadOutliers.run(spark, dir).cache()
    // per type: at least half the mass sits at-or-below med_bk, and
    // strictly less than half sits strictly below — the lower-median
    // property the cumsum threshold must reproduce exactly
    val chk = r.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("bk") <= col("med_bk"), 1L).otherwise(0L)).as("le"),
        sum(when(col("bk") < col("med_bk"), 1L).otherwise(0L)).as("lt"))
    assert(chk.filter(col("le") * 2 < col("n")).count() == 0)
    assert(chk.filter(col("lt") * 2 >= col("n") + 1).count() == 0)
    // outliers are exactly the |mz| > 3.5 rows
    assert(r.filter(col("is_outlier") =!= (abs(col("mz")) > 3.5))
      .count() == 0)
    r.unpersist()
  }

  test("q174: arm counts reconcile with the user population") {
    import graft.queries.Relational
    val row = Relational.q174AbTest.run(spark, dir).head
    val users = Tables(spark, dir, "events").select("user_id").distinct()
    assert(row.getLong(0) + row.getLong(2) == users.count())
    assert(row.getLong(1) <= row.getLong(0) && row.getLong(3) <= row.getLong(2))
    // parity split: arm sizes derive from the actual user-id parities
    val odd = users.filter(col("user_id") % 2 === 1).count()
    assert(row.getLong(2) == odd)
  }

  test("q175: hold durations tile each user's span exactly") {
    import graft.queries.Relational
    val r = Relational.q175Twap.run(spark, dir)
    val span = Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
        .as("span"),
        count(lit(1)).as("n_ev"))
      .filter(col("n_ev") > 1)
    val bad = r.join(span, "user_id")
      .filter(col("held_us") =!= col("span") ||
        col("n_holds") =!= col("n_ev") - 1)
    assert(bad.count() == 0)
  }

  test("q176: histogram Gini equals the textbook sorted-rank Gini") {
    import graft.queries.Relational
    import org.apache.spark.sql.expressions.Window
    val g = Relational.q176Gini.run(spark, dir)
    // brute-force recompute: explicit per-doc ranks (ties broken by
    // doc_id — rank sums within a tie group are order-invariant, which
    // is exactly what the closed form exploits)
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val ranked = Tables(spark, dir, "documents")
      .select(col("source"), col("n_chars"), col("doc_id"))
      .withColumn("i", row_number().over(w).cast("long"))
    val tb = ranked.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("t"),
        sum(col("i") * col("n_chars")).as("s1"))
      .select(col("source"),
        ((lit(2) * col("s1") - (col("n") + 1) * col("t")).cast("double")
          / (col("n").cast("double") * col("t").cast("double")))
          .as("gini_tb"))
    val diff = g.join(tb, "source").filter(col("gini") =!= col("gini_tb"))
    assert(diff.count() == 0, "closed-form Gini diverged from sorted ranks")
    assert(g.filter(col("gini") < 0.0 || col("gini") >= 1.0).count() == 0)
  }

  test("q178: skyline equals the brute-force dominance anti-join") {
    import graft.queries.Relational
    val pts = Tables(spark, dir, "orders").select(col("o_orderkey"),
      floor(col("o_totalprice") * 100).cast("long").as("pc"),
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("d"))
    // brute force: a point survives iff NO other point is >= on both
    // axes and strictly better on one
    val dominated = pts.as("p").join(pts.as("q"),
      col("q.pc") >= col("p.pc") && col("q.d") >= col("p.d") &&
        (col("q.pc") > col("p.pc") || col("q.d") > col("p.d")),
      "left_semi")
    val expected = pts.exceptAll(dominated)
    val got = Relational.q178Skyline.run(spark, dir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("q179: R² bounded and the fit passes through the mean point") {
    import graft.queries.Relational
    val r = Relational.q179TrendOls.run(spark, dir).cache()
    assert(r.filter(col("r2") < 0.0 || col("r2") > 1.0 + 1e-12).count() == 0)
    // OLS identity: ȳ = intercept + slope·t̄ (recomputed from raw data)
    val daily = Tables(spark, dir, "events")
      .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("yc"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val means = daily
      .select(col("user_id"),
        (col("day") - min(col("day")).over(w)).as("t"), col("yc"))
      .groupBy("user_id")
      .agg((sum("t").cast("double") / count(lit(1))).as("tbar"),
        (sum("yc").cast("double") / count(lit(1)) / 100).as("ybar"))
    val broken = r.filter(col("slope_per_day").isNotNull).join(means, "user_id")
      .filter(abs(col("intercept") + col("slope_per_day") * col("tbar")
        - col("ybar")) > 1e-6)
    assert(broken.count() == 0)
    r.unpersist()
  }

  test("q181: window arithmetic agrees with the brute-force interval test") {
    import graft.queries.Relational
    val r = Relational.q181PatternNegation.run(spark, dir).cache()
    val nPurch = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(r.count() == nPurch)
    // brute force: an error strictly inside (view_ts, purchase_ts] by the
    // (ts, event_id) total order flips clean_path — recompute via a band
    // join and compare the boolean per purchase
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("tus").as("e_tus"),
        col("event_id").as("e_id"))
    val withView = r.filter(col("view_us").isNotNull)
      .join(ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("event_id").as("p_id")), "event_id")
    // closed band [view, purchase] is a superset of the window's strict
    // (ts, event_id)-ordered interval, so flagged ⇒ error-in-band holds
    val dirty = withView.join(errs,
        col("e_user") === col("user_id") &&
          col("e_tus") >= col("view_us") &&
          col("e_tus") <= col("purchase_us"), "left_semi")
    // spot-consistency: every purchase the window calls dirty has at
    // least one error in its [view, purchase] closed band, and clean
    // ones have errs_between = 0
    assert(r.filter(col("clean_path") && col("errs_between") =!= 0)
      .count() == 0)
    assert(r.filter(!col("clean_path") && col("errs_between") <= 0)
      .count() == 0)
    val flagged = r.filter(col("view_us").isNotNull && !col("clean_path"))
    assert(flagged.join(dirty.select("event_id"), Seq("event_id"), "left_anti")
      .count() == 0, "window-flagged purchase has no error in its band")
    r.unpersist()
  }

  test("q144: the PPS draw includes exactly the under-threshold hashes") {
    val p = TextPipeline.q144PpsSample.run(spark, dir).cache()
    assert(p.filter(col("p_incl") <= 0.0 || col("p_incl") > 1.0).count() == 0)
    // heavier docs never get a smaller threshold than lighter ones
    val inverted = p.as("a").join(p.as("b"),
      col("a.weight") > col("b.weight") && col("a.thr") < col("b.thr"))
    assert(inverted.count() == 0, "threshold is not monotone in weight")
    p.unpersist()
  }
}
