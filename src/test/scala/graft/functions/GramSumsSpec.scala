package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Gram aggregate: q148 rests on (a) exact agreement with an
  * in-memory triangle computation, (b) partitioning invariance (the
  * merge is elementwise, so the buffer is a function of the input
  * multiset), and (c) the documented buffer layout (pairs ++ dims ++
  * count) that the query's slice arithmetic decodes.
  */
class GramSumsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val d = 8
  private val tri = d * (d + 1) / 2

  private def gram(vs: Seq[Array[Long]], parts: Int): Seq[Long] = {
    import spark.implicits._
    vs.map(_.toSeq).toDF("qv").repartition(parts)
      .agg(GramSums.sums(col("qv"), d).as("g"))
      .head().getSeq[Long](0)
  }

  test("buffer matches the in-memory triangle, any partitioning") {
    val rnd = new scala.util.Random(7L)
    val vs = Seq.fill(100)(Array.fill(d)(rnd.nextLong(19L) - 9L))
    val expected = new Array[Long](tri + d + 1)
    vs.foreach { v =>
      var pos = 0
      for (i <- 0 until d) {
        expected(tri + i) += v(i)
        for (j <- i until d) { expected(pos) += v(i) * v(j); pos += 1 }
      }
      expected(tri + d) += 1L
    }
    val g1 = gram(vs, 1)
    assert(g1 == expected.toSeq)
    for (parts <- Seq(3, 8, 32))
      assert(gram(vs, parts) == g1, s"parts=$parts diverged")
  }

  test("dimension mismatch fails loudly instead of silently mis-summing") {
    import spark.implicits._
    val bad = Seq(Seq(1L, 2L, 3L)).toDF("qv")
    val err = intercept[Exception] {
      bad.agg(GramSums.sums(col("qv"), d)).head()
    }
    assert(err.getMessage != null)
  }
}
