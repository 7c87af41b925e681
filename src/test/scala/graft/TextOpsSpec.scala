package graft

import graft.ops.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the HOF-form text kernels (the per-row API surface; the
  * query layer uses the aggregation-shaped equivalents for codegen), plus
  * the LSH containment guarantee: LSH candidates never invent pairs —
  * verified near-dups from q25 are exactly the exact-scan pairs of q23 on
  * this corpus (banding found every planted dup).
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("wordShingles / charShingles basics") {
    import spark.implicits._
    val df = Seq("a b c d", "x y", "").toDF("t")
    val got = df.select(
      Text.wordShingles(Text.tokens(col("t")), 3).as("w"),
      Text.charShingles(col("t"), 3).as("c")).collect()
    assert(got(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(got(1).getSeq[String](0) == Seq.empty) // shorter than n -> empty
    assert(got(0).getSeq[String](1).take(2) == Seq("a b", " b "))
    assert(got(2).getSeq[String](0) == Seq.empty)
  }

  test("identical shingle sets share every band key; different docs don't all") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"), // identical
      (3L, "completely different words in this tiny document here now")
    ).toDF("id", "t")
    val bands = df.select(col("id"),
      Text.bandKeys(
        Text.minhashSignature(
          Text.shingleHashes(Text.wordShingles(Text.tokens(col("t")), 3)), 12),
        4, 3).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bands(1L) == bands(2L))          // identical docs: all 4 bands match
    assert(bands(1L).toSet.intersect(bands(3L).toSet).isEmpty)
    assert(bands(1L).size == 4 && bands(1L).distinct.size == 4)
  }

  test("LSH dedup pairs coincide with the exact scan on the test corpus") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.TextPipeline.q23NgramJaccard.run(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.queries.TextPipeline.q25MinhashDedup.run(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH verified pairs must be a subset of the exact scan")
    assert(lsh == exact, s"LSH missed planted near-dups: ${exact -- lsh}")
    assert(exact.nonEmpty)
  }
}
