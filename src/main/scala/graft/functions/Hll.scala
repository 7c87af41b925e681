package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog register array over the house 60-bit md5 hash
  * ([[graft.ops.Text.baseHash]]) — the industry-standard distinct-count
  * sketch (Flajolet et al. '07) as a mergeable bounded-state aggregate,
  * complementing the KMV family (q44/q102): KMV keeps the k smallest
  * hash VALUES (supports set algebra), HLL keeps 2^p one-byte registers
  * (4× smaller state per unit of accuracy, elementwise-max mergeable —
  * the shape every warehouse's APPROX_COUNT_DISTINCT ships).
  *
  * Register assignment from a 60-bit hash h: index = the top p bits
  * (h >>> (60−p)); rho = the position of the highest set bit in the
  * remaining 60−p bits, counted from the MSB side (all-zero remainder →
  * 60−p+1). Each register keeps the max rho seen. The aggregate is
  * DETERMINISTIC in the input SET — duplicates are absorbed by max, so
  * no DISTINCT pass is needed upstream, any partitioning merges to the
  * same registers, and the whole register array is oracle-checkable
  * (DuckDB recomputes it from the same md5 hashes; q166).
  *
  * The estimate is derived OUTSIDE the aggregate by plain Column
  * arithmetic over the bounded array — see q166 for the exact-integer
  * spelling (Σ 2^(51−M) as a bigint, the raw estimate as one fixed-order
  * double expression) that keeps the number engine-portable. Unbounded
  * state never exists at any corpus size: p=10 is 1 KiB per group.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"HllRegisters p must be in [4,16], got $p")

  private val m = 1 << p
  private val lowBits = 60 - p
  private val lowMask = (1L << lowBits) - 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> lowBits).toInt & (m - 1)
      val low = h & lowMask
      // rho ∈ [1, lowBits+1]: 1 when the top remainder bit is set,
      // lowBits+1 when the remainder is all zeros
      val rho =
        if (low == 0L) lowBits + 1
        else lowBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

object Hll {

  /** The 2^p HLL registers of a 60-bit-hash column as an aggregate
    * Column (`array<int>` of max-rho values, all-partitioning
    * deterministic). */
  def registers(hash: Column, p: Int): Column =
    GraftBridge.column(
      HllRegisters(GraftBridge.expression(hash), p).toAggregateExpression())
}
