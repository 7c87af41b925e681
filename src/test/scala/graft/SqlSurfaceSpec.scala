package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL spelling of representative queries equals the DataFrame
  * spelling — users can drive the engine entirely through
  * `spark.sql(...)` over the registered views.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("spark.sql over registered views matches the DataFrame programs") {
    SqlSurface.registerViews(spark, dir)

    val sqlAgg = SqlSurface.sql(spark,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP_NTZ'1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val dfAgg = queries.Relational.q01PricingSummary.run(spark, dir)
    assert(canon(sqlAgg) == canon(dfAgg))

    val sqlSemi = SqlSurface.sql(spark,
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
    val dfSemi = queries.Relational.q09SemiJoin.run(spark, dir)
    assert(canon(sqlSemi) == canon(dfSemi))

    val sqlWin = SqlSurface.sql(spark,
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3""".stripMargin)
    val dfWin = queries.Relational.q08TopKPerGroup.run(spark, dir)
    assert(canon(sqlWin) == canon(dfWin))
  }

  test("domain views: the game engine is queryable with plain SQL") {
    SqlSurface.registerDomainViews(spark, dir)

    // plus-minus reconciliation written as SQL over the domain views
    val sqlPm = SqlSurface.sql(spark,
      """SELECT s.game_id, s.team_id, SUM(s.plus_minus) AS pm
        |FROM stint_plus_minus s GROUP BY s.game_id, s.team_id""".stripMargin)
    val dfPm = queries.Domain.pipeline(spark, dir).stintPlusMinus
      .groupBy("game_id", "team_id")
      .agg(org.apache.spark.sql.functions.sum("plus_minus").as("pm"))
    assert(canon(sqlPm) == canon(dfPm))

    // actor edges joined back to stints via SQL
    val n = SqlSurface.sql(spark,
      """SELECT COUNT(*) FROM actor_edges e
        |JOIN player_stints ps ON e.src_id = ps.player_stint_id
        |WHERE e.src_kind = 'player_stint'""".stripMargin)
      .head().getLong(0)
    assert(n > 0)

    // PyG COO indices are valid dense ids for their node types
    val bad = SqlSurface.sql(spark,
      """SELECT COUNT(*) FROM pyg_edges e
        |LEFT JOIN pyg_nodes s
        |  ON s.node_type = e.src_type AND s.dense_id = e.src_idx
        |WHERE s.node_id IS NULL""".stripMargin)
      .head().getLong(0)
    assert(bad == 0)
  }

  test("native expressions are SQL functions via SparkSessionExtensions") {
    SqlSurface.registerViews(spark, dir)
    import org.apache.spark.sql.functions._

    // dot_product: SQL spelling equals the Column spelling
    val sqlDot = SqlSurface.sql(spark,
      """SELECT vec_id, dot_product(embedding, embedding) AS d
        |FROM embeddings WHERE vec_id < 10""".stripMargin)
    val dfDot = Tables(spark, dir, "embeddings").filter(col("vec_id") < 10)
      .select(col("vec_id"),
        graft.ops.Vectors.dot(col("embedding"), col("embedding")).as("d"))
    assert(canon(sqlDot) == canon(dfDot))

    // kmv_estimate: SQL aggregate equals the Column aggregate
    val sqlKmv = SqlSurface.sql(spark,
      """SELECT lang, kmv_estimate(
        |  CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT), 16) AS e
        |FROM documents GROUP BY lang""".stripMargin)
    val dfKmv = Tables(spark, dir, "documents")
      .groupBy("lang")
      .agg(graft.functions.KmvSketch.estimate(
        graft.ops.Text.baseHash(col("text")), 16).as("e"))
    assert(canon(sqlKmv) == canon(dfKmv))

    // mg_candidates: SQL aggregate equals the Column aggregate. k = 16
    // exceeds the distinct-lang count, so the buffer never truncates and
    // both spellings are exactly the distinct hash set — deterministic
    // regardless of partial-merge order.
    val sqlMg = SqlSurface.sql(spark,
      """SELECT mg_candidates(
        |  CAST(conv(substring(md5(lang), 1, 15), 16, 10) AS BIGINT), 16) AS c
        |FROM documents""".stripMargin)
    val dfMg = Tables(spark, dir, "documents")
      .agg(graft.functions.MgCandidates.candidates(
        graft.ops.Text.baseHash(col("lang")), 16).as("c"))
    assert(canon(sqlMg) == canon(dfMg))

    // cms_counts: SQL aggregate equals the Column aggregate (the sketch
    // is a deterministic function of the multiset, so exact equality)
    val sqlCms = SqlSurface.sql(spark,
      "SELECT cms_counts(user_id, 4, 64) AS cms FROM events")
    val dfCms = Tables(spark, dir, "events")
      .agg(graft.functions.CmsCounts.counts(col("user_id"), 4, 64).as("cms"))
    assert(canon(sqlCms) == canon(dfCms))

    // hll_registers: SQL aggregate equals the Column aggregate (register
    // max is a deterministic function of the input SET)
    val sqlHll = SqlSurface.sql(spark,
      """SELECT lang, hll_registers(
        |  CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT), 10) AS r
        |FROM documents GROUP BY lang""".stripMargin)
    val dfHll = Tables(spark, dir, "documents")
      .groupBy("lang")
      .agg(graft.functions.Hll.registers(
        graft.ops.Text.baseHash(col("text")), 10).as("r"))
    assert(canon(sqlHll) == canon(dfHll))

    // bottom_k_sample: SQL aggregate equals the Column aggregate (the
    // sample is a deterministic function of the (hash, value) set)
    val sqlBk = SqlSurface.sql(spark,
      """SELECT event_type, bottom_k_sample(
        |  CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT),
        |  value, 32) AS s
        |FROM events GROUP BY event_type""".stripMargin)
    val dfBk = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(graft.functions.BottomKSample.sample(
        graft.ops.Text.baseHash(col("event_id").cast("string")),
        col("value"), 32).as("s"))
    assert(canon(sqlBk) == canon(dfBk))
  }
}
