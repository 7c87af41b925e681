package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first entry point: register the testdata tables as temp views so
  * the whole engine is equally usable via `spark.sql(...)` — the
  * DataFrame programs in `graft.queries` and ANSI SQL over these views
  * are two spellings of the same Catalyst plans (SqlSurfaceSpec asserts
  * result equality on representative queries).
  */
object SqlSurface {

  /** Register every testdata table of `dir` as a temp view named after
    * the table. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { name =>
      Tables(spark, dir, name).createOrReplaceTempView(name)
    }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
