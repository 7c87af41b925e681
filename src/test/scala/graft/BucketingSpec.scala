package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the pre-shuffled layout for repeated fact-fact joins
  * (builder-prompt scale tool: "bucketing for co-located joins"). Both
  * sides bucketed on the join key with the same bucket count ⇒ the join
  * plans with NO Exchange on either side — at 100 TB that's the
  * difference between re-shuffling a fact table per query and never
  * shuffling it at all.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans with zero shuffles") {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")

    // force a shuffle-join decision (no broadcast, no AQE re-plan)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)

      // contrast: the same join on raw parquet shuffles both sides
      val rawPlan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.explainString(FormattedMode)
      assert(rawPlan.contains("Exchange"), s"raw join should shuffle:\n$rawPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
