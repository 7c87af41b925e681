package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing (MOSS) fingerprint kernel shared by the interpreted and
  * codegen'd paths of [[WinnowFingerprints]] — one implementation, zero
  * risk of eval/codegen divergence.
  *
  * Hash: polynomial (Rabin–Karp) over code points,
  * `H(i) = Σ_j cp(i+j) · B^(7−j) mod M` with `B = 131`,
  * `M = 2³¹ − 1` (Mersenne prime), computed as a TRUE rolling update —
  * O(1) per position after the first window. This replaced the r4
  * md5-per-position spelling (kept cross-engine parity but paid a full
  * digest per character); the polynomial is computable bit-for-bit in
  * DuckDB as vectorized window `lead`s, measured ~11× faster there and
  * removes the per-position digest from the Spark scan entirely. Code
  * POINTS (not UTF-16 units) are hashed and positions count code points,
  * so parity with DuckDB's character semantics holds for all of Unicode,
  * not just the BMP.
  *
  * Selection: per 5-hash window, the minimum hash wins, leftmost on
  * ties; result rows are packed `fp · 2³¹ + pos` (fp < 2³¹, pos ≤ doc
  * length < 2³¹) — a single `array<long>` per doc, so the whole
  * winnowing is ONE expression over the scan. The leftmost tie-break
  * falls out of packing: for equal `fp` the smaller `pos` gives the
  * smaller packed value, so a sliding MIN over packed values IS the
  * winnowing rule (the same trick the DuckDB oracle uses with
  * `MIN(hv · 2³¹ + i)`).
  */
object WinnowKernel {
  val Base = 131L
  val Mod = 2147483647L // 2^31 - 1, prime
  val Gram = 8
  val Win = 5
  /** B^(Gram-1) mod M: the coefficient retired by each rolling step. */
  val BTop: Long = {
    var x = 1L
    var i = 0
    while (i < Gram - 1) { x = x * Base % Mod; i += 1 }
    x
  }

  private val Empty = new GenericArrayData(Array.empty[Long])

  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray()
    val n = cps.length
    if (n < Gram) return Empty
    val m = n - (Gram - 1)
    val hs = new Array[Long](m)
    // first window: direct Horner fold; then rolling updates
    var h = 0L
    var j = 0
    while (j < Gram) { h = (h * Base + cps(j)) % Mod; j += 1 }
    hs(0) = h
    var i = 1
    while (i < m) {
      // retire cp(i-1), admit cp(i+Gram-1); +Mod keeps the difference
      // non-negative ((Mod-1)*Base + cp fits a long with room to spare)
      h = ((h - cps(i - 1) * BTop % Mod + Mod) % Mod * Base +
        cps(i + Gram - 1)) % Mod
      hs(i) = h
      i += 1
    }
    if (m < Win) return Empty
    val out = new Array[Long](m - (Win - 1))
    var p = 0
    while (p < out.length) {
      // packed argmin over the 5-hash window: fp*2^31 + (1-based pos)
      var best = hs(p) * 2147483648L + (p + 1)
      var k = p + 1
      while (k < p + Win) {
        val cand = hs(k) * 2147483648L + (k + 1)
        if (cand < best) best = cand
        k += 1
      }
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** `winnow_fingerprints(text)` → `array<long>` of packed
  * `fp · 2³¹ + pos` winnowing fingerprints (one per 5-hash window;
  * DISTINCT them downstream). See [[WinnowKernel]] for the algorithm and
  * the oracle-parity contract. */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints expects a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WinnowKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // per-ROW call into the shared kernel: stays inside the whole-stage
    // codegen span (like the regexp/digest built-ins that call helpers)
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  /** Packed winnowing fingerprints as a Column. */
  def fingerprints(text: Column): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text)))
}
