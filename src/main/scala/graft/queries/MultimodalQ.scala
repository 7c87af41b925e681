package graft.queries

import graft.{Q, Tables}
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal pipeline query: binary payload column → per-partition batch
  * "decode" (stubbed; see [[graft.ops.Multimodal]]) → typed metadata. The
  * oracle recomputes the stub's deterministic metadata from byte lengths,
  * checking the whole plumbing path end-to-end.
  */
object MultimodalQ {

  val q40MultimodalMeta: Q = Q.sql(
    "q40_multimodal_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |  CAST(octet_length(encode(text)) % 480 AS BIGINT) AS height,
      |  'stub/raw' AS format
      |FROM documents""".stripMargin) { (s, dir) =>
    val media = Multimodal.withPayload(Tables(s, dir, "documents"), "doc_id", "text")
    Multimodal.decodeMeta(s, media).toDF()
  }

  /** Frame sampling: one row per sampled frame (stride 100 B, 64 B
    * frames, ≤4 per doc). The oracle recomputes offsets and the frame
    * slice from the payload bytes — the one-to-many typed flatMap is
    * checked end-to-end including the binary content. The frame itself is
    * emitted hex-encoded (same information) so the driver's compare never
    * has to hash raw binary cells. */
  val q41FrameSample: Q = Q.sql(
    "q41_frame_sample",
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |  CAST(i * 100 AS BIGINT) AS "offset",
      |  hex(CAST(substr(text, i * 100 + 1, 64) AS BLOB)) AS frame_hex
      |FROM documents, UNNEST(range(0, 4)) r(i)
      |WHERE i * 100 + 64 <= octet_length(encode(text))""".stripMargin) { (s, dir) =>
    val media = Multimodal.withPayload(Tables(s, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrames(s, media, stride = 100, frameSize = 64, maxFrames = 4).toDF()
      .withColumn("frame_hex", hex(col("frame_bytes")))
      .drop("frame_bytes")
  }

  private def frames(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val media = Multimodal.withPayload(Tables(s, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrames(s, media, stride = 100, frameSize = 64, maxFrames = 4)
  }

  /** Shared oracle CTE: the q41 frames with their hex encoding (2 hex
    * chars per byte) — byte i of the frame is hex positions 2i+1..2i+2. */
  private val framesSql =
    """WITH fr AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |    hex(CAST(substr(text, i * 100 + 1, 64) AS BLOB)) AS h
      |  FROM documents, UNNEST(range(0, 4)) r(i)
      |  WHERE i * 100 + 64 <= octet_length(encode(text))
      |)""".stripMargin

  /** Per-frame byte statistics — honest feature extraction over the raw
    * bytes (the partition-batch slot where an embedding model would run),
    * re-derived by the oracle from the hex encoding. */
  val q42FrameFeatures: Q = Q.sql(
    "q42_frame_features",
    framesSql +
      """
      |SELECT doc_id, frame_idx, CAST(64 AS BIGINT) AS n_bytes,
      |  list_avg(b) AS byte_mean,
      |  CAST(list_min(b) AS BIGINT) AS byte_min,
      |  CAST(list_max(b) AS BIGINT) AS byte_max
      |FROM (SELECT doc_id, frame_idx,
      |        [('0x' || substr(h, 2 * i + 1, 2))::INT for i in range(0, 64)] AS b
      |      FROM fr)""".stripMargin) { (s, dir) =>
    Multimodal.frameFeatures(s, frames(s, dir)).toDF()
  }

  /** Stride-subsampled 8-byte thumbnails ("resize" plumbing): byte j of
    * the thumb is byte 8j of the frame. */
  val q43FrameResize: Q = Q.sql(
    "q43_frame_resize",
    framesSql +
      """
      |SELECT doc_id, frame_idx,
      |  array_to_string([substr(h, 16 * j + 1, 2) for j in range(0, 8)], '') AS thumb_hex
      |FROM fr""".stripMargin) { (s, dir) =>
    Multimodal.resizeFrames(s, frames(s, dir), outBytes = 8).toDF()
      .withColumn("thumb_hex", hex(col("thumb_bytes")))
      .drop("thumb_bytes")
  }

  val all: Seq[Q] =
    Seq(q40MultimodalMeta, q41FrameSample, q42FrameFeatures, q43FrameResize)
}
