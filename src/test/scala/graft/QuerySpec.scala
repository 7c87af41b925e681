package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // JobCountPinSpec reads statusTracker.getJobIdsForGroup(null),
      // which is backed by the UI status store and evicts beyond
      // spark.ui.retainedJobs (default 1000). The shared session runs
      // the whole suite's jobs first, so at the default the store can
      // saturate and the pins' deltas under-read — raise it far above
      // any suite's job count so a delta of hundreds stays visible
      .config("spark.ui.retainedJobs", "100000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.local.dir", Scratch.root)
      .config("spark.sql.warehouse.dir",
        Scratch.tempDir("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Smoke-level checks on every registered query: runs at sf0.001, asserts
  * schema sanity and (where cheap) semantic invariants. Deep value
  * correctness is the driver's DuckDB oracle gate (tools/check_oracle.py
  * replays it locally).
  */
class QuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("registry names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  for (q <- Registry.all) {
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, dir)
      val n = df.count()
      assert(n > 0, s"${q.name} returned no rows at sf0.001")
      // Columns must be explicitly named (no auto-generated agg names) so
      // the driver's column-name-sorted hash compare lines up with the
      // oracle.
      assert(df.columns.forall(c => !c.contains("(")),
        s"${q.name} leaks an unaliased column: ${df.columns.mkString(",")}")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
