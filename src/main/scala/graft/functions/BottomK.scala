package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Deterministic bottom-k-by-hash uniform sample of a VALUE column — the
  * mergeable building block behind distributed quantile estimation
  * (q204). Keeps the k (hash, value) pairs with lexicographically
  * smallest (hash, value); because the hash is a 60-bit md5 of a unique
  * row key, the retained set is a uniform random-but-deterministic
  * sample of the group, identical under ANY partitioning and replayable
  * closed-form by the DuckDB oracle (`ORDER BY h, v LIMIT k`).
  *
  * Why this over `approx_percentile`/KLL/GK: those summaries are
  * order-dependent (their compactions depend on arrival order), so two
  * runs with different partitionings return different answers — not
  * hash-gateable, and subtly non-reproducible in production re-runs.
  * The bottom-k sample trades a slightly worse accuracy-per-byte
  * constant for exact determinism, O(k) mergeable state (map-side
  * partial aggregation works, AQE re-planning works, streaming state
  * works), and an oracle-checkable contract. At 100 TB the per-group
  * state is still k pairs — scan-bound map work plus one O(k) merge
  * per partition, no sort of the data anywhere.
  *
  * Eval returns the sampled VALUES ordered by (hash, value) ascending;
  * callers sort by value to read quantiles (q204's nearest-rank rule).
  */
case class BottomKSample(
    left: Expression, // 60-bit hash of a unique row key (LongType)
    right: Expression, // sampled value (DoubleType)
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]]
    with BinaryLike[Expression] {

  require(k >= 2, s"bottom-k sample needs k >= 2, got $k")

  // lexicographic (hash, value) — the oracle's ORDER BY h, v
  private implicit val ord: Ordering[(Long, Double)] =
    Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  private def add(buf: java.util.TreeSet[(Long, Double)], p: (Long, Double)): Unit = {
    buf.add(p)
    if (buf.size > k) buf.pollLast()
  }

  override def update(
      buf: java.util.TreeSet[(Long, Double)],
      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(
      b1: java.util.TreeSet[(Long, Double)],
      b2: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    b2.forEach(p => add(b1, p))
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val out = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { p => bb.putLong(p._1); bb.putDouble(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}

object BottomKSample {
  /** The deterministic bottom-k-by-hash value sample, as an aggregate
    * Column: `hash` a 60-bit hash of a unique row key
    * ([[graft.ops.Text.baseHash]]), `value` the sampled measure. */
  def sample(hash: Column, value: Column, k: Int): Column =
    GraftBridge.column(
      BottomKSample(
        GraftBridge.expression(hash),
        GraftBridge.expression(value), k).toAggregateExpression())
}
