package graft

import graft.queries.{Embeddings, Relational, TextPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 additions the oracle hash can't
  * see: link-prediction pairs must be genuinely non-adjacent (q194),
  * sorted-neighborhood candidates bounded by n·w (q195), LOO encodings
  * must exclude the row's own label (q196), the prefix filter must be
  * lossless against the unfiltered spelling (q197), the seasonal
  * backtest's scaled error must reconcile (q198), and Benford terms must
  * roll up to the priority totals (q199).
  */
class Round7Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q194: every predicted link is absent from the symmetrized kNN graph") {
    val pred = Embeddings.q194LinkPrediction.run(spark, dir).cache()
    assert(pred.count() > 0)
    // rebuild the adjacency exactly as the query does and anti-check
    import graft.ops.Vectors
    val e = Tables(spark, dir, "embeddings")
    val a = e.select(col("label"), col("vec_id").as("src"), col("embedding").as("ea"))
    val b = e.select(col("label"), col("vec_id").as("dst"), col("embedding").as("eb"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cosine").desc, col("dst"))
    val knn = a.join(b, Seq("label")).filter(col("dst") =!= col("src"))
      .select(col("src"), col("dst"), Vectors.cosine(col("ea"), col("eb")).as("cosine"))
      .withColumn("rn", row_number().over(wk)).filter(col("rn") <= 5)
      .select(col("src"), col("dst"))
    val adj = knn.union(knn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val leaked = pred.select(col("a").as("src"), col("c").as("dst"))
      .join(adj, Seq("src", "dst"), "left_semi")
    assert(leaked.count() == 0, "a predicted link already exists in the graph")
    // scores are sane: jaccard in (0, 1], common >= 2, <= 5 rows per node
    assert(pred.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
    assert(pred.filter(col("common") < 2).count() == 0)
    assert(pred.groupBy(col("a")).count().filter(col("count") > 5).count() == 0)
    pred.unpersist()
  }

  test("q195: candidates are n·w-bounded, same-block, ordered, verified") {
    val cand = TextPipeline.q195SortedNeighborhood.run(spark, dir).cache()
    val n = Tables(spark, dir, "documents").count()
    assert(cand.count() > 0 && cand.count() <= 3 * n)
    assert(cand.filter(col("gap") < 1 || col("gap") > 3).count() == 0)
    assert(cand.filter(col("dist") > 20 || col("dist") < 0).count() == 0)
    // the pair's docs really share the blocking key
    val blocks = Tables(spark, dir, "documents").select(col("doc_id"),
      element_at(split(trim(col("text")), "\\s+"), 1).as("bk"))
    val wrong = cand
      .join(blocks.select(col("doc_id").as("doc_a"), col("bk").as("ba")), Seq("doc_a"))
      .join(blocks.select(col("doc_id").as("doc_b"), col("bk").as("bb")), Seq("doc_b"))
      .filter(col("ba") =!= col("block") || col("bb") =!= col("block"))
    assert(wrong.count() == 0)
    cand.unpersist()
  }

  test("q196: LOO encoding differs by label within a segment and stays in (0,1)") {
    val enc = Relational.q196TargetEncoding.run(spark, dir).cache()
    assert(enc.filter(col("loo_encoding") <= 0 || col("loo_encoding") >= 1).count() == 0)
    // within a segment the encoding takes EXACTLY two values (y=0 vs
    // y=1), and the y=1 rows see the SMALLER encoding (their own
    // positive held out)
    val perSeg = enc.groupBy(col("segment"), col("y"))
      .agg(min("loo_encoding").as("lo"), max("loo_encoding").as("hi"))
    assert(perSeg.filter(col("lo") =!= col("hi")).count() == 0,
      "encoding not constant given (segment, y)")
    val pivot = perSeg.groupBy(col("segment"))
      .agg(min(when(col("y") === 1, col("lo"))).as("enc1"),
        min(when(col("y") === 0, col("lo"))).as("enc0"))
      .filter(col("enc1").isNotNull && col("enc0").isNotNull)
    assert(pivot.filter(col("enc1") >= col("enc0")).count() == 0,
      "held-out positive must lower the encoding")
    enc.unpersist()
  }

  test("q197: prefix filter is lossless — equals the unfiltered inverted-index join") {
    val pp = TextPipeline.q197PrefixJaccard.run(spark, dir)
    // unfiltered spelling: full index self-join, no prefix cut — same
    // tokenizer and base hash as the engine's shingle index
    import graft.ops.Text
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val idx = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), lead(col("tok"), 2).over(w).as("t2"),
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w),
          lead(col("tok"), 2).over(w)).as("shingle"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), Text.baseHash(col("shingle")).as("h"))
      .distinct()
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val withSz = idx.join(sizes, Seq("doc_id"))
    val brute = withSz.as("a").join(withSz.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"), first(col("a.sz")).as("sza"),
        first(col("b.sz")).as("szb"))
      .filter(col("i").cast("double") / (col("sza") + col("szb") - col("i")) >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val got = pp.select(col("doc_a"), col("doc_b"))
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "prefix filter dropped or invented a qualifying pair")
  }

  test("q198: scaled error reconciles and the split is 80/20 on hour indexes") {
    val bt = Relational.q198SeasonalBaseline.run(spark, dir).cache()
    assert(bt.count() > 0)
    val bad = bt.filter(col("abs_err_scaled") =!=
      abs(col("actual") * col("f_den") - col("f_num")))
    assert(bad.count() == 0)
    assert(bt.filter(col("f_den") <= 0 || col("f_num") < 0).count() == 0)
    // every test hour index sits in the last fifth of the span
    val hourly = Tables(spark, dir, "events")
      .select(expr("unix_micros(date_trunc('HOUR', ts)) div 3600000000").as("hidx"))
    val (h0, h1) = {
      val r = hourly.agg(min("hidx"), max("hidx")).head
      (r.getLong(0), r.getLong(1))
    }
    val trainH = 8 * (h1 - h0 + 1) / 10
    assert(bt.filter(col("hidx") - h0 < trainH).count() == 0,
      "a train hour leaked into the backtest")
    bt.unpersist()
  }

  test("q199: chi2 terms are non-negative and observed rolls up to n per priority") {
    val bf = Relational.q199BenfordAudit.run(spark, dir).cache()
    assert(bf.filter(col("chi2_term") < 0).count() == 0)
    assert(bf.filter(col("digit") < 1 || col("digit") > 9).count() == 0)
    val totals = bf.groupBy(col("priority")).agg(sum("observed").as("tot"))
    val orders = Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority")).count()
    val off = totals.join(orders, Seq("priority"))
      .filter(col("tot") =!= col("count"))
    assert(off.count() == 0, "digit histogram lost rows")
    bf.unpersist()
  }
}
