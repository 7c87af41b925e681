package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native HLL aggregate: q166 rests on (a) register values matching
  * an in-memory recomputation from the same hashes, (b) partitioning
  * invariance (merge = elementwise max ⇒ registers are a function of
  * the input SET), (c) duplicate absorption (no DISTINCT pre-pass
  * needed), and (d) the estimate landing inside HLL's theoretical error
  * envelope against the exact count.
  */
class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val p = 10
  private val m = 1 << p

  private def refRegisters(hs: Seq[Long]): Seq[Int] = {
    val regs = new Array[Int](m)
    hs.foreach { h =>
      val idx = (h >>> 50).toInt & (m - 1)
      val low = h & ((1L << 50) - 1)
      val rho =
        if (low == 0L) 51
        else 51 - (64 - java.lang.Long.numberOfLeadingZeros(low))
      if (rho > regs(idx)) regs(idx) = rho
    }
    regs.toSeq
  }

  private def sparkRegisters(hs: Seq[Long], parts: Int): Seq[Int] = {
    import spark.implicits._
    hs.toDF("h").repartition(parts)
      .agg(Hll.registers(col("h"), p).as("r"))
      .head().getSeq[Int](0)
  }

  test("registers match the reference fold under any partitioning") {
    val rnd = new scala.util.Random(13L)
    val hs = Seq.fill(5000)(rnd.nextLong() & ((1L << 60) - 1))
    val expected = refRegisters(hs)
    assert(sparkRegisters(hs, 1) == expected)
    for (parts <- Seq(4, 32)) {
      assert(sparkRegisters(hs, parts) == expected, s"parts=$parts diverged")
    }
  }

  test("duplicates are absorbed: set semantics without a DISTINCT pass") {
    val rnd = new scala.util.Random(29L)
    val hs = Seq.fill(800)(rnd.nextLong() & ((1L << 60) - 1))
    val tripled = hs ++ hs ++ hs
    assert(sparkRegisters(tripled, 8) == refRegisters(hs))
  }

  test("all-zero remainder and register-index edge bits land correctly") {
    // h = idx<<50 exactly: remainder 0 → rho 51; also the top index
    val hs = Seq(0L, (m - 1).toLong << 50, (1L << 50) | 1L)
    val regs = refRegisters(hs)
    assert(regs(0) == 51)         // h=0: idx 0, zero remainder
    assert(regs(m - 1) == 51)     // top index, zero remainder
    assert(regs(1) == 50)         // low=1: highest set bit at position 50
    assert(sparkRegisters(hs, 2) == regs)
  }

  test("estimate lands inside the HLL error envelope vs exact") {
    val rnd = new scala.util.Random(41L)
    val n = 20000
    val hs = Seq.fill(n)(rnd.nextLong() & ((1L << 60) - 1)).distinct
    val regs = sparkRegisters(hs, 16)
    val s = regs.map(r => 1L << (51 - r)).sum
    val est = (0.7213 / (1.0 + 1.079 / 1024.0)) *
      (1048576.0 * 2251799813685248L.toDouble) / s
    val err = math.abs(est - hs.size) / hs.size
    // 1.04/sqrt(1024) ≈ 3.25% standard error; allow 4 sigma
    assert(err < 0.13, s"estimate $est vs exact ${hs.size}: err $err")
  }
}
