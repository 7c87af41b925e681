package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's own Bloom-filter expressions — the pair
  * Catalyst itself injects for runtime row-level filtering
  * (InjectRuntimeFilter). Exposed here so a query can build the filter
  * over an explicitly chosen SMALL side (e.g. the test-set grams of a
  * decontamination run, q106) and apply it map-side to the huge side,
  * instead of hoping the optimizer picks the same rewrite.
  *
  * `might_contain` requires the filter operand to be foldable or a
  * scalar subquery — pass `df.agg(filterAgg(...)).scalar()`, which also
  * keeps the whole pipeline one lazy plan (no driver-side collect of the
  * sketch; Spark broadcasts the subquery result exactly like a broadcast
  * join side).
  */
object Bloom {

  /** Aggregate a LongType hash column into a serialized Bloom filter.
    * `numBits` fixes the filter size (bits) independent of cardinality:
    * size the filter for the expected DISTINCT count of the small side
    * (~8 bits/item ≈ 2% false-positive rate — FPs only cost shuffled
    * bytes when, as in q106, an exact confirm join follows). */
  def filterAgg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(
        GraftBridge.expression(hash),
        Literal(estimatedItems),
        Literal(numBits)).toAggregateExpression())

  /** True when `hash` may be in `bloom`; false is exact (no false
    * negatives). Evaluates map-side inside whole-stage codegen. */
  def mightContain(bloom: Column, hash: Column): Column =
    GraftBridge.column(
      BloomFilterMightContain(
        GraftBridge.expression(bloom),
        GraftBridge.expression(hash)))
}
