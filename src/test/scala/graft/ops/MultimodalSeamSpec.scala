package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Companion the executor-side closures report into. Valid because the
  * test session is local-mode (one JVM): on a real cluster these would
  * be per-executor counters and the assertions would use accumulators. */
object FakeCodec {
  val instantiations = new AtomicInteger(0)
  val decoded = new AtomicInteger(0)
}

/** The codec drop-in contract of [[Multimodal.decodeMeta]], proved by
  * injecting a fake codec through the factory seam: a real decoder
  * (libjpeg/ffmpeg handle) replaces `stubDecode` at ONE call site and
  * inherits exactly these guarantees —
  *   - the factory runs once per partition and its instance is reused
  *     across the partition's rows (decoder construction amortized);
  *   - rows reach the decoder, and leave the operator, in partition
  *     order (frame sequencing survives);
  *   - null payloads never reach the decoder — they surface as the
  *     `n_bytes = -1 / "missing"` marker rows;
  *   - the map is narrow: the input partitioning survives unchanged.
  */
class MultimodalSeamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("codec seam: per-partition init, order, null-safety, narrow map") {
    val n = 100
    val parts = 4
    val media = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 10 === 0, lit(null).cast("binary"))
        .otherwise(concat(lit("payload-"), col("id")).cast("binary"))
        .as("payload"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")

    FakeCodec.instantiations.set(0)
    FakeCodec.decoded.set(0)
    val mkFake = () => {
      FakeCodec.instantiations.incrementAndGet()
      (r: Multimodal.MediaRow) => {
        require(r.payload != null, "null payload leaked through the seam")
        FakeCodec.decoded.incrementAndGet()
        Multimodal.MediaMeta(r.doc_id, r.payload.length.toLong, 7L, 9L,
          "fake/codec")
      }
    }
    val out = Multimodal.decodeMeta(spark, media, mkFake)

    // ONE job for everything observable — a second action would re-run
    // the pipeline and double the instantiation/decode counters
    val byPartition = out.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.toArray)))
      .collect().toMap

    assert(byPartition.keySet == (0 until parts).toSet,
      "narrow map: input partitioning must survive decode")
    for ((_, rows) <- byPartition) {
      val ids = rows.map(_.doc_id).toSeq
      assert(ids == ids.sorted, s"partition order not preserved: $ids")
    }
    assert(FakeCodec.instantiations.get == parts,
      s"decoder built ${FakeCodec.instantiations.get} times for $parts partitions")
    assert(FakeCodec.decoded.get == n - n / 10,
      "decoder must see every non-null payload exactly once")

    val all = byPartition.values.flatten.toSeq
    assert(all.size == n)
    val missing = all.filter(_.format == "missing")
    assert(missing.size == n / 10 && missing.forall(_.n_bytes == -1L),
      "null payloads must surface as marker rows, not decoder calls")
    assert(all.filter(_.format == "fake/codec").forall(m =>
      m.n_bytes == s"payload-${m.doc_id}".length.toLong &&
        m.width == 7L && m.height == 9L),
      "decoded rows must carry the injected codec's output verbatim")
  }
}
