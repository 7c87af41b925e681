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

  test("q93 shuffle-shard: a permutation, shard-tiled offsets, no hot shard") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.TextPipeline.q93ShuffleShard.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))) // doc_id, shard, n_tokens, pos, start_tok
    // every doc exactly once (it IS a permutation)
    assert(rows.map(_._1).distinct.length == rows.length)
    // within a shard, positions are 1..n and token offsets tile exactly
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      val byPos = rs.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1L to rs.length).toSeq, s"shard $shard")
      var off = 0L
      byPos.foreach { case (_, _, n, _, start) =>
        assert(start == off, s"shard $shard gap at $start != $off")
        off += n
      }
    }
    // md5 spreads: no shard holds more than 4x the fair share
    val fair = rows.length.toDouble / 32
    assert(rows.groupBy(_._2).values.map(_.length).max <= fair * 4)
  }

  test("q97 chunks: tile every token, overlap is exactly 16 where chunks meet") {
    val dir = "/root/testdata/sf0.001"
    val chunks = graft.queries.TextPipeline.q97ChunkOverlap.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk_idx contiguous from 0, starts at stride 48
      sorted.zipWithIndex.foreach { case ((_, idx, start, _), i) =>
        assert(idx == i && start == i * 48L, s"doc $doc chunk $i")
      }
      // consecutive chunks overlap by 64 - 48 = 16 tokens (when full)
      sorted.sliding(2).foreach {
        case Array((_, _, s1, n1), (_, _, s2, _)) =>
          assert(s2 < s1 + n1 || n1 < 64, s"doc $doc: gap between chunks")
          if (n1 == 64) assert(s1 + n1 - s2 == 16, s"doc $doc overlap")
        case _ =>
      }
      // coverage: if tokens remained past lastStart + 48 another chunk
      // would exist, so the last chunk must end the doc within 48 tokens
      val (_, _, _, lastN) = sorted.last
      assert(lastN <= 48, s"doc $doc dropped a tail chunk")
    }
    assert(chunks.nonEmpty)
  }
}
