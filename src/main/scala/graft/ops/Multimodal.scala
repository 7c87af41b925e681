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

  /** The injectable codec seam: `mkDecoder` is a serializable FACTORY
    * shipped to executors and invoked ONCE per partition — the slot
    * where a real deployment constructs its libjpeg/ffmpeg handle, so a
    * codec drop-in changes one call site and nothing about the plumbing.
    * Contract (pinned by `MultimodalSeamSpec`):
    *  - one decoder instance per partition, reused across its rows
    *    (never per-row construction, never a shared global);
    *  - rows reach the decoder in partition order, output preserves it;
    *  - a NULL payload never reaches the decoder — it maps to the
    *    `n_bytes = -1, format = "missing"` marker row, keeping the
    *    decoder free of defensive null handling;
    *  - the map is narrow: partitioning survives unchanged.
    */
  def decodeMeta(
      spark: SparkSession, media: DataFrame,
      mkDecoder: () => MediaRow => MediaMeta = () => stubDecode): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val decode = mkDecoder() // decoder init: once per partition
      rows.map { r =>
        if (r.payload == null) MediaMeta(r.doc_id, -1L, 0L, 0L, "missing")
        else decode(r)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, frame_bytes: Array[Byte])

  case class FrameFeatures(
      doc_id: Long, frame_idx: Long, n_bytes: Long,
      byte_mean: Double, byte_min: Long, byte_max: Long)

  /** Per-frame feature extraction — REAL computation (byte statistics),
    * not a stub: the per-partition batch shape is where an image-embedding
    * model would run; the features here are honest functions of the raw
    * bytes so the whole path stays oracle-checkable. */
  def frameFeatures(spark: SparkSession, frames: Dataset[Frame]): Dataset[FrameFeatures] = {
    import spark.implicits._
    frames.mapPartitions { rows =>
      // feature-extractor init would happen here, once per partition
      rows.map { f =>
        val b = f.frame_bytes.map(_ & 0xFF)
        if (b.isEmpty) FrameFeatures(f.doc_id, f.frame_idx, 0L, 0.0, 0L, 0L)
        else FrameFeatures(f.doc_id, f.frame_idx, b.length.toLong,
          // long accumulation: an int sum wraps negative past ~8 MB of 0xFF
          b.foldLeft(0L)(_ + _).toDouble / b.length, b.min.toLong, b.max.toLong)
      }
    }
  }

  case class FramePHash(doc_id: Long, frame_idx: Long, phash: Long)

  /** Perceptual (average-)hash of a frame: 32 blocks of 2 bytes; bit j is
    * set iff block j's byte sum exceeds the frame average (integer form:
    * `32 * blockSum > totalSum`, no division rounding). Visually-similar
    * frames — same payload shifted/re-encoded a little — land within a
    * small hamming radius, so near-dup detection becomes the same banded
    * equi-join the simhash text dedup uses. Pure integer function of the
    * bytes, so the whole path stays oracle-checkable without codecs. */
  def perceptualHash(spark: SparkSession, frames: Dataset[Frame]): Dataset[FramePHash] = {
    import spark.implicits._
    frames.mapPartitions { rows =>
      rows.map { f =>
        // the 32-block geometry is only an unbiased average test when the
        // frame is exactly 64 bytes (total spans ALL bytes, blocks span
        // the first 64): fail loudly on reuse with another frame size
        // rather than emit silently biased hashes
        require(f.frame_bytes.length == 64,
          s"perceptualHash expects 64-byte frames, got ${f.frame_bytes.length}")
        val b = f.frame_bytes.map(_ & 0xFF)
        val total = b.foldLeft(0L)(_ + _)
        var ph = 0L
        var j = 0
        while (j < 32 && 2 * j + 1 < b.length) {
          val s = b(2 * j).toLong + b(2 * j + 1)
          if (32L * s > total) ph |= 1L << j
          j += 1
        }
        FramePHash(f.doc_id, f.frame_idx, ph)
      }
    }
  }

  case class FrameEnergy(doc_id: Long, frame_idx: Long, energy: Long)

  /** Audio-shaped feature extraction: signal energy per frame, reading
    * the payload as centered 8-bit PCM samples — Σ(b−128)² in exact Long
    * arithmetic. REAL computation in the per-partition batch slot (a
    * real pipeline decodes PCM/spectrograms here); the energy feeds the
    * VAD segmentation query the way frame stats feed q42. */
  def audioEnergy(spark: SparkSession, frames: Dataset[Frame]): Dataset[FrameEnergy] = {
    import spark.implicits._
    frames.mapPartitions { rows =>
      rows.map { f =>
        var e = 0L
        f.frame_bytes.foreach { byte =>
          val d = (byte & 0xFF) - 128
          e += d.toLong * d
        }
        FrameEnergy(f.doc_id, f.frame_idx, e)
      }
    }
  }

  case class Thumb(doc_id: Long, frame_idx: Long, thumb_bytes: Array[Byte])

  /** "Resize": deterministic stride-subsampling of a frame to `outBytes`
    * bytes — the plumbing (typed map, bounded output, exact byte
    * positions) of a real thumbnailer, with a trivially checkable
    * sampling kernel standing in for interpolation. */
  def resizeFrames(spark: SparkSession, frames: Dataset[Frame], outBytes: Int): Dataset[Thumb] = {
    import spark.implicits._
    frames.mapPartitions { rows =>
      rows.map { f =>
        // frames shorter than outBytes keep their own bytes (stride 1,
        // truncated output) instead of repeating byte 0 / crashing empty
        val n = math.min(outBytes, f.frame_bytes.length)
        val stride = math.max(1, f.frame_bytes.length / outBytes)
        Thumb(f.doc_id, f.frame_idx,
          Array.tabulate(n)(i => f.frame_bytes(i * stride)))
      }
    }
  }

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
