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

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms '05) over a
  * nonnegative long key column: a depth × width counter matrix where each
  * input increments one counter per row, chosen by a Carter–Wegman
  * universal hash `h_i(v) = ((2i+1)·v + (i·1000003 + 12345)) mod P mod
  * width` with P = 2^31 − 1 — the SAME hash family as
  * [[graft.ops.Text.minhashSignature]], so the whole sketch stack shares
  * one arithmetic that both engines can evaluate exactly. The point
  * estimate for a key is the MIN of its depth counters: never an
  * underestimate, over by at most ε·n (ε ≈ e/width) with probability
  * 1 − δ (δ ≈ e^−depth).
  *
  * Unlike Spark's built-in `count_min_sketch` (random-seeded hashes,
  * opaque binary output), every counter here is a deterministic function
  * of the input MULTISET — identical under any partitioning, and
  * recomputable closed-form by the DuckDB oracle as a (i, bucket)
  * GROUP BY (q108) — so the sketch itself is hash-gateable, the house
  * sketch discipline (q44/q96 KMV, q105 Misra–Gries).
  *
  * The merge is element-wise addition: partial aggregation, AQE
  * re-planning, and streaming state all compose. Sketch family roles:
  * KMV answers "how many distinct", Misra–Gries "which keys are heavy",
  * Count-Min "how often is THIS key" — point frequency under a fixed
  * O(depth × width) budget with no per-key state at all, the shape that
  * holds when the key universe itself (100 TB of token ids) cannot be
  * enumerated, let alone grouped.
  *
  * Reference analogue: frequency tables are materialized client-side per
  * game (services/game.py:142-171); this is the fixed-memory corpus form.
  */
case class CmsCounts(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"CMS depth must be in [1,16], got $depth")
  require(width >= 2, s"CMS width must be >= 2, got $width")

  private val P = 2147483647L // 2^31 − 1, the MinHash family modulus

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // floorMod (not %) so a negative key still lands in [0, P) — a plain
      // `%` would go negative and index into a NEIGHBORING depth row's
      // counter segment. Mirrored by pmod in [[CmsCounts.estimate]].
      val vm = java.lang.Math.floorMod(v.asInstanceOf[Long], P) // a·vm < 2^62: no overflow
      var i = 0
      while (i < depth) {
        val bucket = (((2 * i + 1) * vm + (i * 1000003L + 12345L)) % P) % width
        buf(i * width + bucket.toInt) += 1L
        i += 1
      }
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
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_counts"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsCounts =
    copy(child = newChild)
}

object CmsCounts {
  import org.apache.spark.sql.functions.{element_at, least, lit, pmod}

  /** The flattened depth × width counter matrix (row-major
    * `array<long>`) of a nonnegative long key column, as an aggregate
    * Column. */
  def counts(key: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsCounts(GraftBridge.expression(key), depth, width).toAggregateExpression())

  /** Point-frequency estimate of `key` read from a sketch column
    * produced by [[counts]] with the same depth/width: the min of the
    * key's depth counters. Plain Column arithmetic (1-based
    * `element_at`), so it composes with a broadcast of the one-row
    * sketch. */
  def estimate(cms: Column, key: Column, depth: Int, width: Int): Column = {
    // pmod mirrors update()'s floorMod so negative keys read the same
    // counters they incremented.
    val vm = pmod(key, lit(2147483647L))
    least((0 until depth).map { i =>
      val bucket = ((lit(2 * i + 1) * vm + lit(i * 1000003L + 12345L)) % 2147483647L) % width
      element_at(cms, (lit(i * width) + bucket + 1).cast("int"))
    }: _*)
  }
}
