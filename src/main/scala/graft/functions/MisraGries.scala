package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra–Gries heavy-hitter CANDIDATE sketch over a long-hash column:
  * at most k counters, returning the surviving keys (ascending). The MG
  * guarantee — any item with true count > n/(k+1) holds a live counter —
  * survives the mergeable-summaries merge (Agarwal et al., PODS'12:
  * combine counts, then subtract the (k+1)-th largest and drop non-
  * positive), so the candidate set from ANY partitioning is a superset
  * of the true φ-heavy hitters whenever k + 1 ≥ 1/φ.
  *
  * This is deliberately a CANDIDATE generator, not an estimator: which
  * non-heavy keys survive depends on partition order, so the sketch
  * output itself is not oracle-stable. The q105 pattern restores
  * exactness — and determinism — with a second pass that broadcast-joins
  * the ≤ k candidates back to the token stream and counts exactly: the
  * classic two-pass exact heavy-hitters, whose only full-data costs are
  * two scans with O(k) aggregation state, no wide shuffle of the token
  * universe. That second pass is also why the result is hash-gateable
  * against a plain GROUP BY/HAVING DuckDB oracle.
  *
  * Reference analogue: the reference counts event/action frequencies by
  * materializing full GROUP BYs client-side (services/game.py:142-171);
  * at 100 TB a full token GROUP BY is the shuffle this sketch avoids.
  */
case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[java.lang.Long, java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  private type Buf = java.util.HashMap[java.lang.Long, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = java.lang.Long.valueOf(v.asInstanceOf[Long])
      val c = buf.get(h)
      if (c != null) buf.put(h, c + 1L)
      else if (buf.size < k) buf.put(h, 1L)
      else decrementAll(buf, 1L) // amortized O(1): decrements <= increments
    }
    buf
  }

  /** Subtract `by` from every counter, dropping non-positive ones. */
  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.forEach { (h, c) =>
      val prev = b1.get(h)
      b1.put(h, if (prev == null) c else java.lang.Long.valueOf(prev + c))
    }
    if (b1.size > k) {
      // (k+1)-th largest count, subtracted from all: the PODS'12 merge
      val counts = new Array[Long](b1.size)
      var i = 0
      val it = b1.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(b1.size - (k + 1))) // leaves <= k survivors
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach { (h, c) => bb.putLong(h); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mg_candidates"

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgCandidates =
    copy(child = newChild)
}

object MgCandidates {
  /** Heavy-hitter candidate hashes (ascending `array<long>`, at most k)
    * of a long-hash column, as an aggregate Column. Guaranteed superset
    * of every item with count > n/(k+1). */
  def candidates(hash: Column, k: Int): Column =
    GraftBridge.column(
      MgCandidates(GraftBridge.expression(hash), k).toAggregateExpression())
}
