package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns next to typed metadata structs; decode / feature-extraction
  * runs batch-wise per partition (the Scala analog of `mapInPandas` —
  * one decoder instantiation per partition, amortized across its rows,
  * never per-row driver round-trips).
  *
  * The decode itself is a clearly marked STUB (this container ships no
  * image/audio codecs): it derives deterministic fake dimensions from the
  * byte length. The Spark-side plumbing — binary column, typed output
  * schema, per-partition batching, partition-count preservation — is real
  * and is what the tests cover.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

  /** STUB decoder: stands in for an image decode (e.g. JPEG dimensions).
    * Deterministic pure function of the payload so results are
    * reproducible and oracle-checkable. A real deployment swaps only this
    * function; the partition plumbing stays. */
  def stubDecode(r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    MediaMeta(r.doc_id, n, n % 640, n % 480, "stub/raw")
  }

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — in a real
    * pipeline this IS the image/audio bytes column read from parquet). */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).cast("binary").as("payload"))

  /** Per-partition batch decode: one pass, decoder state amortized per
    * partition, output schema typed via the case-class encoder. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // decoder init would happen here, once per partition
      rows.map(stubDecode)
    }
  }

  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, frame_bytes: Array[Byte])

  /** Frame sampling (video-shaped): every `stride` bytes emit a
    * fixed-size "frame" slice, up to `maxFrames` per payload — the
    * Spark-side plumbing (one-to-many typed flatMap, bounded output,
    * offsets deterministic) of a real frame extractor; the slice stands
    * in for the decoded frame. */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      stride: Int,
      frameSize: Int,
      maxFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val n = r.payload.length
      Iterator.range(0, maxFrames)
        .map(i => i.toLong * stride)
        .takeWhile(off => off + frameSize <= n)
        .map(off => Frame(r.doc_id, off / stride, off,
          java.util.Arrays.copyOfRange(r.payload, off.toInt, off.toInt + frameSize)))
        .toSeq
    }
  }
}
