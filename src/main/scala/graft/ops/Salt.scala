package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-stage aggregation: when a handful of hot keys would
  * overload single reducers at 100 TB (the builder-prompt skew concern),
  * aggregate first on (keys, salt) — spreading each hot key over
  * `buckets` reducers — then combine partials on the keys alone.
  *
  * Only algebraic aggregates (sum/count/min/max) compose this way; the
  * helper takes the partial and final expressions explicitly so the
  * pairing is visible at the call site. Results are identical to the
  * direct groupBy (asserted in SaltSpec); the cost is one extra, much
  * smaller shuffle. AQE's skew-join handling covers joins; this covers
  * aggregations.
  */
object Salt {

  /** Deterministic salt from a uniqueifying column (e.g. a row id):
    * hash-mod rather than rand() so re-runs reproduce. */
  def saltCol(uniqueCol: Column, buckets: Int): Column =
    pmod(xxhash64(uniqueCol), lit(buckets.toLong))

  /** Two-stage sum/count over possibly-skewed keys. */
  def skewedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      uniqueCol: String,
      buckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(col(uniqueCol), buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
