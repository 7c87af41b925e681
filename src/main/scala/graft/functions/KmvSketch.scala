package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared buffer mechanics of the KMV (K-minimum-values) sketch family:
  * a BOUNDED TreeSet of the k smallest DISTINCT hash values seen, with
  * an associative, commutative merge and a compact flat serialization —
  * so partial aggregation, AQE re-planning, and Structured Streaming
  * state all work exactly as for a built-in sketch. Two evals share it:
  * [[KmvSketch]] returns the distinct-count estimate, [[KmvValues]]
  * returns the k-min hash array itself — the form KMV set algebra
  * (union/intersection/Jaccard across corpora, q102) needs.
  */
private[functions] trait KmvAggregate
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  def child: Expression
  def k: Int

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  protected final def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    buf.add(h) // TreeSet dedups; KMV is over DISTINCT hash values
    if (buf.size > k) buf.pollLast() // keep the k smallest
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b2.forEach(h => add(b1, h))
    b1
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def nullable: Boolean = false
}

/** Native Catalyst KMV distinct-count sketch over 60-bit hashes
  * ([[graft.ops.Text.baseHash]]'s range): keeps the k smallest DISTINCT
  * hash values seen, estimates the distinct count from the k-th smallest
  * as `(k-1) * 2^60 / h_k`, and returns the exact distinct count while
  * fewer than k values have been seen.
  *
  * Why a native `TypedImperativeAggregate` (SURVEY §7.3's escape-hatch
  * ladder: compose > custom expression > UDF): unlike HLL
  * (`approx_count_distinct`) the result is a deterministic function of
  * the input hash SET: identical in any partitioning, re-computable
  * closed-form by the DuckDB oracle (q44's window spelling), and
  * therefore hash-gateable. The q44 batch query keeps the window+groupBy
  * spelling as the cross-check; this expression is the mergeable form
  * that streaming (q96) and 100 TB partial aggregation need — O(k) state
  * per group instead of a per-group sort.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggregate {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** 2^60 — exactly representable as a Double; the same literal the q44
    * oracle uses (`CAST(1152921504606846976 AS DOUBLE)`). */
  private val hashRange = 1.152921504606846976e18

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size >= k) (k - 1).toDouble * hashRange / buf.last().toDouble
    else buf.size.toDouble

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_estimate"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** KMV distinct estimate of a 60-bit-hash column, as an aggregate
    * Column. */
  def estimate(hash: Column, k: Int): Column =
    GraftBridge.column(
      KmvSketch(GraftBridge.expression(hash), k).toAggregateExpression())
}

/** The KMV sketch VALUES — the k smallest distinct hashes, ascending —
  * instead of the folded estimate. This is the composable form: two
  * groups' value arrays support the Beyer et al. (SIGMOD'07) multiset
  * estimators with plain array functions — `K_∪ = slice(sort(union), k)`
  * gives the union sketch, `|K_∪ ∩ K_A ∩ K_B| / k` the Jaccard, their
  * product the intersection — so corpus-overlap estimation needs NO join
  * between the corpora, only between the per-group O(k) sketches (q102).
  * Deterministic function of the input hash set, hence oracle-checkable.
  */
case class KmvValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends KmvAggregate {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_values"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvValues =
    copy(child = newChild)
}

object KmvValues {
  /** The k-min hash array of a 60-bit-hash column, as an aggregate
    * Column. */
  def values(hash: Column, k: Int): Column =
    GraftBridge.column(
      KmvValues(GraftBridge.expression(hash), k).toAggregateExpression())
}
