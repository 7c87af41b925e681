package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed ranking — the two-level prefix-sum that replaces a
  * corpus-wide `Window.orderBy(...)` (ONE task regardless of cluster
  * size) with (a) a per-bucket partial agg, (b) a cumsum over the
  * bucket frame — the only remaining global window, O(|bucket domain|)
  * rows, bounded by the VALUE DOMAIN rather than the corpus — and
  * (c) a bucket-partitioned window for the within-bucket residue. The
  * classic distributed prefix-sum / order-statistics shape (Blelloch
  * scan at the plan level; TeraSort's ranking step uses the same
  * bucket-prefix decomposition).
  *
  * Exactness: identical to the single-reducer spelling row for row —
  * the round-9 bounded-frame lint's growth gate flagged the single-
  * reducer ntile/cumsum sites (q216/q226/q230/q271 measured ~10× frame
  * growth per corpus decade) and the respellings are gated against the
  * UNCHANGED DuckDB oracles, which is the proof the decomposition is
  * lossless.
  *
  * Requirements on `bucket`: non-null, and a MONOTONE non-decreasing
  * function of the leading `order` column (so bucket order refines row
  * order). All callers bucket by a domain-bounded quantization of the
  * leading sort key (epoch-day, centi-unit band, small-int count).
  */
object Ranks {

  /** Adds `out` = exact strictly-before running sum of `value` under the
    * total order `order` — equal to
    * `sum(value).over(Window.orderBy(order).rowsBetween(unboundedPreceding, -1))`
    * (with NULL→0) but with no corpus-sized single-partition window. */
  def withGlobalPrefixSum(df: DataFrame, out: String, value: Column,
      bucket: Column, order: Seq[Column]): DataFrame = {
    val tagged = df.withColumn("__pfx_b", bucket)
      .withColumn("__pfx_v", value.cast("long"))
    // bucket totals: a partial agg to the bounded bucket frame; its
    // cumsum is the only global window (O(buckets) rows)
    val wb = Window.orderBy(col("__pfx_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = tagged.groupBy(col("__pfx_b"))
      .agg(sum(col("__pfx_v")).as("__pfx_n"))
      .withColumn("__pfx_p", coalesce(sum(col("__pfx_n")).over(wb), lit(0L)))
      .select(col("__pfx_b"), col("__pfx_p"))
    // within-bucket strictly-before cumsum rides a PARTITIONED window
    val wIn = Window.partitionBy(col("__pfx_b")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged.join(broadcast(pre), Seq("__pfx_b"))
      .withColumn(out,
        col("__pfx_p") + coalesce(sum(col("__pfx_v")).over(wIn), lit(0L)))
      .drop("__pfx_b", "__pfx_v", "__pfx_p")
  }

  /** Adds `out` = exact `row_number()` under the total order `order`
    * (which must be a total order — callers carry a unique tiebreak),
    * without a corpus-sized single-partition sort. */
  def withGlobalRowNumber(df: DataFrame, out: String, bucket: Column,
      order: Seq[Column]): DataFrame = {
    val tagged = df.withColumn("__rk_b", bucket)
    val wb = Window.orderBy(col("__rk_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = tagged.groupBy(col("__rk_b"))
      .agg(count(lit(1)).as("__rk_n"))
      .withColumn("__rk_p", coalesce(sum(col("__rk_n")).over(wb), lit(0L)))
      .select(col("__rk_b"), col("__rk_p"))
    val wIn = Window.partitionBy(col("__rk_b")).orderBy(order: _*)
    tagged.join(broadcast(pre), Seq("__rk_b"))
      .withColumn(out, col("__rk_p") + row_number().over(wIn))
      .drop("__rk_b", "__rk_p")
  }

  /** Closed-form NTILE(k) from an exact 1-based rank `rn` and total row
    * count `n` — the ANSI tile function both engines implement: with
    * base = n div k and rem = n mod k, the first rem tiles hold base+1
    * rows. Double-precision ceil is exact below 2^52 rows — far past
    * any corpus this engine addresses row counts for. CaseWhen
    * evaluates branches lazily, so the base=0 (n < k) division never
    * executes for rows the first branch catches — and with base = 0
    * every row IS caught by the first branch (cutoff = n). */
  def ntileFromRank(rn: Column, n: Column, k: Int): Column = {
    val kL = lit(k.toLong)
    val base = floor(n / kL).cast("long")
    val rem = n - base * kL
    val cutoff = rem * (base + lit(1L))
    when(rn <= cutoff, ceil(rn / (base + lit(1L))).cast("long"))
      .otherwise(rem + ceil((rn - cutoff) / base).cast("long"))
  }
}
