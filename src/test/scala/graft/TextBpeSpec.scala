package graft

import graft.ops.Text
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for [[Text.bpeApply]] — the greedy
  * left-to-right single-pass-per-merge semantics pinned independently of
  * the q183 oracle gate. Every expected value below was derived by hand
  * from the BPE scan rule: for merge (a,b), walk the token list once,
  * merging each non-overlapping adjacent (a,b) occurrence left-to-right;
  * merges apply strictly in rank order, one pass each.
  */
class TextBpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def apply1(toks: Seq[String], merges: Seq[String]): String =
    Seq((toks, merges)).toDF("t", "m")
      .select(Text.bpeApply(col("t"), col("m"), merges.size.max(1)).as("r"))
      .head().getString(0)

  test("single merge joins each adjacent pair") {
    assert(apply1(Seq("a", "b", "c"), Seq("a b")) == "ab c")
    assert(apply1(Seq("c", "a", "b"), Seq("a b")) == "c ab")
  }

  test("greedy left-to-right on overlapping runs: [b b b] -> [bb b]") {
    assert(apply1(Seq("b", "b", "b"), Seq("b b")) == "bb b")
    assert(apply1(Seq("b", "b", "b", "b"), Seq("b b")) == "bb bb")
    assert(apply1(Seq("b", "b", "b", "b", "b"), Seq("b b")) == "bb bb b")
  }

  test("merges chain in rank order: later merge consumes an earlier output") {
    // rank1 makes "ab"; rank2 then merges ("ab","c") -> "abc"
    assert(apply1(Seq("a", "b", "c"), Seq("a b", "ab c")) == "abc")
    // reversed ranks: ("ab","c") finds no "ab" token yet, then ("a","b")
    // fires — order of the merge list is load-bearing
    assert(apply1(Seq("a", "b", "c"), Seq("ab c", "a b")) == "ab c")
  }

  test("whole-token anchoring: no cross-boundary or substring matches") {
    // pair ("x","b") must not match inside token "ax" followed by "b"
    assert(apply1(Seq("ax", "b"), Seq("x b")) == "ax b")
    // pair ("a","b") must not match the single token "ab"
    assert(apply1(Seq("ab"), Seq("a b")) == "ab")
  }

  test("merged token participates in later pairs to its right") {
    // one pass per merge: [a a b] with ("a","b") merges at position 2
    assert(apply1(Seq("a", "a", "b"), Seq("a b")) == "a ab")
    // a fresh merge is never re-used as the LEFT half within its own pass:
    // [a b b] with ("a","b") gives [ab b], and "ab"+"b" only merges if a
    // LATER rank asks for it
    assert(apply1(Seq("a", "b", "b"), Seq("a b")) == "ab b")
    assert(apply1(Seq("a", "b", "b"), Seq("a b", "ab b")) == "abb")
  }

  test("empty token list and missing merge slots degrade cleanly") {
    assert(apply1(Seq.empty[String], Seq("a b")) == "")
    // maxMerges beyond the trained list: null slots must be no-ops
    val r = Seq((Seq("a", "b"), Seq("a b"))).toDF("t", "m")
      .select(Text.bpeApply(col("t"), col("m"), 20).as("r"))
      .head().getString(0)
    assert(r == "ab")
  }

  test("punctuation tokens merge like any symbol") {
    assert(apply1(Seq("end", ".", "end", "."), Seq("end .")) == "end. end.")
  }
}
