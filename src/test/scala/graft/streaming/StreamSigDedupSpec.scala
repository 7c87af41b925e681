package graft.streaming

import graft.SparkTestSession
import graft.ops.Text
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q101's streaming MinHash-signature dedup, pinned against its batch
  * twin: `dropDuplicates(sig_key)` over micro-batches must emit exactly
  * the batch DISTINCT signature set, regardless of where the batch
  * boundary falls relative to the duplicates. Also pins the collapse
  * semantics of the key itself: equal shingle SETS (exact dups, cyclic
  * repetitions) share a key; distinct shingle sets do not (modulo minhash
  * collision, impossible on this fixture's disjoint vocabularies).
  */
object StreamSigDedupSpec {
  case class Doc(doc_id: Long, text: String)
}

class StreamSigDedupSpec extends AnyFunSuite {
  import StreamSigDedupSpec.Doc
  private lazy val spark = SparkTestSession.spark

  private val docs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog"),
    Doc(2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    // cyclic repetition: shingle SET {"a b c","b c a","c a b"} equals 4's
    Doc(3L, "a b c a b c"),
    Doc(4L, "a b c a b c a b c"),
    Doc(5L, "entirely different words in this document here"),
    Doc(6L, "short doc"), // < 3 tokens: filtered out, contributes nothing
    Doc(7L, "yet another unique set of tokens altogether"))

  private def sigKeys(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), Text.tokens(col("text")).as("t"))
    .filter(size(col("t")) >= 3)
    .select(Text.signatureKey(col("t"), 3, 12).as("sig_key"))

  test("streaming signature dedup over micro-batches equals batch distinct") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Doc]
    val q = sigKeys(input.toDF()).dropDuplicates("sig_key")
      .writeStream.outputMode("append")
      .format("memory").queryName("sig_out").start()
    try {
      // duplicates straddle the batch boundary: doc 1 in batch one, its
      // exact dup (2) and its cyclic near-dup family (3 vs 4) split across
      input.addData(docs.take(3)); q.processAllAvailable()
      input.addData(docs.drop(3)); q.processAllAvailable()

      val got = spark.table("sig_out").as[String].collect().toSeq
      val batch = sigKeys(docs.toDF()).distinct().as[String].collect().toSet

      assert(got.toSet == batch)
      assert(got.size == got.toSet.size, "streaming emitted a duplicate key")
    } finally q.stop()
  }

  test("signature key collapses equal shingle sets and separates distinct ones") {
    import spark.implicits._
    val byDoc = docs.toDF()
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), Text.signatureKey(col("t"), 3, 12).as("sig_key"))
      .as[(Long, String)].collect().toMap
    // 6 surviving docs (doc 6 filtered) → 1=2 and 3=4 collapse → 4 keys
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L, 5L, 7L))
    assert(byDoc(1L) == byDoc(2L), "exact duplicates must share a key")
    assert(byDoc(3L) == byDoc(4L), "equal shingle sets must share a key")
    assert(byDoc.values.toSet.size == 4)
  }
}
