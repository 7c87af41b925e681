package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer Gram/covariance statistics of a quantized-vector column
  * in ONE aggregate pass: the buffer holds the d(d+1)/2 upper-triangle
  * product sums, the d per-dimension sums, and the row count — all exact
  * longs, so the aggregate is mergeable under any partitioning and the
  * result is independent of row order (the q44/q105/q108 house-sketch
  * discipline, here with exact rather than approximate state).
  *
  * This is the 100 TB shape q148's scaladoc promised: where the
  * explode-the-triangle spelling materializes d(d+1)/2 ROWS per input
  * row through Generate + HashAggregate, this update() runs the same
  * multiply-adds as a tight in-place loop over a flat long buffer —
  * nothing is materialized, the shuffle carries exactly ONE buffer per
  * partition. Measured at the 100× blow-up (BASELINE.md): 9.9 s → see
  * table vs the explode spelling's 93 s.
  *
  * Buffer layout (row-major triangle): pair (i ≤ j) lives at
  * `i·d − i(i−1)/2 + (j − i)`; per-dim sums follow at [T, T+d); the row
  * count sits last. [[GramSums.sums]] exposes the raw array; the query
  * slices it apart with plain Column arithmetic.
  */
case class GramSums(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(dim >= 1 && dim <= 512, s"GramSums dim must be in [1,512], got $dim")

  private val tri = dim * (dim + 1) / 2

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](tri + dim + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"GramSums expects $dim-dim vectors, got ${arr.numElements()}")
      var i = 0
      var pos = 0
      while (i < dim) {
        val qi = arr.getLong(i)
        buf(tri + i) += qi
        var j = i
        while (j < dim) {
          buf(pos) += qi * arr.getLong(j)
          pos += 1
          j += 1
        }
        i += 1
      }
      buf(tri + dim) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](tri + dim + 1)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_sums"

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSums =
    copy(child = newChild)
}

object GramSums {

  /** The flat Gram buffer (`array<long>` of d(d+1)/2 pair sums ++ d dim
    * sums ++ count) of a `array<long>` vector column, as an aggregate
    * Column. */
  def sums(qv: Column, dim: Int): Column =
    GraftBridge.column(
      GramSums(GraftBridge.expression(qv), dim).toAggregateExpression())
}
