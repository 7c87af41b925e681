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

  val all: Seq[Q] = Seq(q40MultimodalMeta, q41FrameSample)
}
