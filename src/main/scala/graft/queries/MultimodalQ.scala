package graft.queries

import graft.{Q, Tables}
import graft.ops.Multimodal
import org.apache.spark.sql.expressions.Window
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

  /** Perceptual frame dedup — multimodal ⋈ dedup: 32-bit block-sum aHash
    * per frame ([[Multimodal.perceptualHash]]), then near-dup pairs at
    * hamming ≤ 2 via the lossless pigeonhole segment banding q27 uses for
    * simhash (2 bit flips can dirty at most 2 of 3 segments, so every
    * qualifying pair collides on ≥ 1 segment exactly) — a bucketed
    * equi-join, never an all-pairs product (PlanSpec pins no-NLJ). The
    * oracle recomputes the hash from hex bytes and brute-force joins —
    * fine for DuckDB at verify scale, quadratic-free on the Spark side.
    * Measured at sf0.01: 1337 frames → 1265 distinct hashes, 372 pairs,
    * max band bucket 84 rows. */
  /** [[framesSql]] + the 32-bit block-sum aHash per frame — the shared
    * opening of q91 (near-dup pairs) and q134 (scene cuts). */
  private val phashSql = framesSql +
    """
      |, bs AS (
      |  SELECT doc_id, frame_idx,
      |    [('0x' || substr(h, 2 * i + 1, 2))::INT for i in range(0, 64)] AS b
      |  FROM fr
      |), ph AS (
      |  SELECT doc_id, frame_idx,
      |    CAST(list_sum([CASE WHEN 32 * list_sum(b[2*j+1:2*j+2]) > list_sum(b)
      |                        THEN 1::BIGINT << j ELSE 0 END
      |                   for j in range(0, 32)]) AS BIGINT) AS phash
      |  FROM bs
      |)""".stripMargin

  val q91FrameDedup: Q = Q.sql(
    "q91_frame_dedup",
    phashSql +
      """
      |SELECT a.doc_id AS doc_a, a.frame_idx AS frame_a,
      |  b.doc_id AS doc_b, b.frame_idx AS frame_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |FROM ph a JOIN ph b
      |  ON a.doc_id * 4 + a.frame_idx < b.doc_id * 4 + b.frame_idx
      |WHERE bit_count(xor(a.phash, b.phash)) <= 2""".stripMargin) { (s, dir) =>
    val ph = Multimodal.perceptualHash(s, frames(s, dir)).toDF()
      // frame_idx < 4 by construction (maxFrames = 4), so this composite
      // is a collision-free total order over frames
      .withColumn("fid", col("doc_id") * 4 + col("frame_idx"))
    val segs = ph.select(col("doc_id"), col("frame_idx"), col("fid"), col("phash"),
      posexplode(array(
        col("phash").bitwiseAND(lit(0x7FFL)),
        shiftright(col("phash"), 11).bitwiseAND(lit(0x7FFL)),
        shiftright(col("phash"), 22))).as(Seq("seg", "segval")))
    val hamming = bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
    segs.as("a")
      .join(segs.as("b"), col("a.seg") === col("b.seg") &&
        col("a.segval") === col("b.segval") && col("a.fid") < col("b.fid"))
      .select(col("a.doc_id").as("doc_a"), col("a.frame_idx").as("frame_a"),
        col("b.doc_id").as("doc_b"), col("b.frame_idx").as("frame_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .distinct() // a pair may collide in 2-3 segments
      .filter(hamming <= 2)
      .select(col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"),
        hamming.cast("long").as("hamming"))
  }

  // ---------------------------------------------------------------- q134
  /** Scene-change (shot-boundary) detection — the video-pipeline
    * segmentation step, over the same per-frame aHash q91 dedups with:
    * within each video, frames in sample order, a cut wherever the
    * hamming distance to the PREVIOUS frame's hash exceeds half the
    * bits (> 16 of 32), and a running `scene_id` = cumulative cut count
    * — the lag + conditional-cumsum spelling of W1/W7 applied to the
    * multimodal column. On these stub-decoded frames adjacent hashes
    * are uncorrelated (hamming centers on 16), so the >16 bar
    * exercises both branches; on real decoded video, continuity keeps
    * within-shot distances near 0 and the bar drops to 2-4 bits — the
    * threshold is the tunable, the plan is not.
    *
    * Scale shape: one window shuffle on doc_id (frames of one video
    * co-locate); the hash itself is q91's map-side expression — no
    * joins at all. */
  val q134SceneChanges: Q = Q.sql(
    "q134_scene_changes",
    phashSql +
      """
      |, d AS (
      |  SELECT doc_id, frame_idx, phash,
      |    lag(phash) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev
      |  FROM ph
      |)
      |SELECT doc_id, frame_idx,
      |  CAST(CASE WHEN prev IS NULL THEN NULL
      |       ELSE bit_count(xor(phash, prev)) END AS BIGINT) AS hamming_prev,
      |  (prev IS NOT NULL AND bit_count(xor(phash, prev)) > 16) AS is_cut,
      |  CAST(SUM(CASE WHEN prev IS NOT NULL
      |                 AND bit_count(xor(phash, prev)) > 16
      |            THEN 1 ELSE 0 END)
      |       OVER (PARTITION BY doc_id ORDER BY frame_idx) AS BIGINT)
      |    AS scene_id
      |FROM d""".stripMargin,
    "shot-boundary detection: adjacent-frame aHash hamming + scene ids") {
    (s, dir) =>
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Multimodal.perceptualHash(s, frames(s, dir)).toDF()
        .withColumn("prev", lag(col("phash"), 1).over(w))
        .withColumn("hamming_prev",
          when(col("prev").isNotNull,
            bit_count(col("phash").bitwiseXOR(col("prev"))).cast("long")))
        .withColumn("is_cut",
          col("prev").isNotNull &&
            bit_count(col("phash").bitwiseXOR(col("prev"))) > 16)
        .withColumn("scene_id",
          sum(when(col("is_cut"), 1).otherwise(0)).over(w).cast("long"))
        .select(col("doc_id"), col("frame_idx"), col("hamming_prev"),
          col("is_cut"), col("scene_id"))
  }

  // ---------------------------------------------------------------- q146
  /** Energy-based voice-activity segmentation — the audio-pipeline
    * counterpart of q134's shot detection: each frame's PCM energy
    * (Σ(b−128)² over centered 8-bit samples, exact Long — see
    * [[Multimodal.audioEnergy]]) classifies it silent below a fixed
    * threshold, and null-safe transitions between silent/active runs cut
    * the clip into maximal segments (the islands spelled with
    * `IS DISTINCT FROM lag` so the first frame always opens a segment).
    * Putting the constant-within-segment flag in the GROUP BY instead of
    * an aggregate keeps both engines trivially agreed. The 127000 bar
    * sits at the stub frames' median energy so both branches exercise;
    * on real audio the threshold is the tunable, the plan is not.
    * Scale shape: map-side typed energy, ONE doc_id window shuffle, one
    * partial-agg roll-up — no joins. */
  val q146AudioSegments: Q = {
    val thr = 127000L
    Q.sql(
      "q146_audio_segments",
      framesSql +
        s"""
        |, en AS (
        |  SELECT doc_id, frame_idx,
        |    CAST(list_sum([(('0x' || substr(h, 2 * i + 1, 2))::INT - 128)
        |                   * (('0x' || substr(h, 2 * i + 1, 2))::INT - 128)
        |                   for i in range(0, 64)]) AS BIGINT) AS energy
        |  FROM fr
        |), fl AS (
        |  SELECT doc_id, frame_idx, energy, energy < $thr AS silent,
        |    CASE WHEN (energy < $thr) IS DISTINCT FROM
        |      lag(energy < $thr) OVER (PARTITION BY doc_id ORDER BY frame_idx)
        |      THEN 1 ELSE 0 END AS chg
        |  FROM en
        |), seg AS (
        |  SELECT doc_id, frame_idx, energy, silent,
        |    SUM(chg) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
        |  FROM fl
        |)
        |SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id, silent AS is_silent,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(MIN(frame_idx) AS BIGINT) AS start_idx,
        |  CAST(MAX(frame_idx) AS BIGINT) AS end_idx,
        |  CAST(SUM(energy) AS BIGINT) AS seg_energy
        |FROM seg GROUP BY doc_id, seg_id, silent""".stripMargin,
      "energy-based VAD: silent/active frame runs per clip") { (s, dir) =>
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Multimodal.audioEnergy(s, frames(s, dir)).toDF()
        .withColumn("silent", col("energy") < thr)
        .withColumn("chg",
          when(!(col("silent") <=> lag(col("silent"), 1).over(w)), 1)
            .otherwise(0))
        .withColumn("seg_id", sum(col("chg")).over(wc))
        .groupBy(col("doc_id"), col("seg_id"), col("silent").as("is_silent"))
        .agg(count(lit(1)).as("n_frames"),
          min(col("frame_idx")).as("start_idx"),
          max(col("frame_idx")).as("end_idx"),
          sum(col("energy")).as("seg_energy"))
        .select(col("doc_id"), col("seg_id"), col("is_silent"),
          col("n_frames"), col("start_idx"), col("end_idx"), col("seg_energy"))
    }
  }

  val all: Seq[Q] =
    Seq(q40MultimodalMeta, q41FrameSample, q42FrameFeatures, q43FrameResize,
      q91FrameDedup, q134SceneChanges, q146AudioSegments)
}
