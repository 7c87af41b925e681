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

  val all: Seq[Q] = Seq(q40MultimodalMeta)
}
