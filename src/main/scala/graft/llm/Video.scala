package graft.llm

import java.io.ByteArrayInputStream
import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Decoded-video features off the REAL per-frame codec parse. */
final case class VideoFeature(
    doc_id: Long,
    n_frames: Long,  // container-parsed frame count
    frame0_w: Long,  // ImageIO-decoded dimensions of frame 0
    frame0_h: Long,
    grid_sum: Long)  // Σ over frames of the 136 dHash-grid samples

/** The VIDEO transport: a `GVID` container of REAL PNG frames.
  *
  * The JDK ships no video container codec (the brief's instruction for
  * exactly this case: keep the Spark-side plumbing — schema,
  * partitioning, batch shape — real, stub only what the container
  * can't provide), so the container here is a minimal explicit
  * transport format — magic `GVID`, big-endian frame count, then
  * length-prefixed frames — while every FRAME is a genuine ImageIO
  * PNG ([[ImageCodec.encodePng]]) and every decode parses the
  * container and runs the real ImageIO codec per frame. A video over
  * this transport is therefore "real" exactly where a codec exists to
  * be real: the per-frame image layer.
  *
  * Synthesis follows the [[ImageCodec]]/[[AudioCodec]] convention:
  * the frame SEQUENCE comes from `documents.text` sliced into
  * [[VideoCodec.nominalFrames]] contiguous windows (disjoint cover, so
  * a 1-char edit perturbs exactly ONE frame — the temporal-locality
  * property the dedup planting leans on), each window rendered to a
  * PNG whose dims/pixels derive from the window alone. Every decoded
  * value replays in DuckDB from the text, integer arithmetic end to
  * end; the Spark side still computes everything from the REAL parsed
  * container + rasters.
  */
object VideoCodec {
  val MAGIC: Int = 0x47564944 // "GVID"

  /** Nominal frame count from the content length: 4..7 — bounded so
    * the oracle's per-frame replay stays a ≤7×136-term pass per row,
    * ≥4 so every doc is a genuine sequence. */
  def nominalFrames(n: Int): Int = 4 + n % 4

  /** Slice stride: ceil(n / nominalFrames) — frames are DISJOINT
    * contiguous windows covering the content exactly once. */
  def stride(n: Int): Int = {
    val f = nominalFrames(n)
    (n + f - 1) / f
  }

  /** Actual frame count: ceil(n / stride) — equals nominalFrames
    * except for tiny contents where the cover needs fewer windows. */
  def nFrames(n: Int): Int = {
    val s = stride(n)
    (n + s - 1) / s
  }

  /** Real encode: slice the payload into frame windows, render each
    * through the real PNG codec, pack the `GVID` container. */
  def encodeVideo(payload: Array[Byte]): Array[Byte] = {
    require(payload.nonEmpty, "video synthesis needs content")
    val n = payload.length
    val s = stride(n)
    val frames = (0 until nFrames(n)).map { f =>
      ImageCodec.encodePng(
        java.util.Arrays.copyOfRange(payload, f * s, math.min(n, (f + 1) * s)))
    }
    val total = 8 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(MAGIC)
    buf.putInt(frames.length)
    frames.foreach { fr => buf.putInt(fr.length); buf.put(fr) }
    buf.array()
  }

  /** Real decode: container parse + the real ImageIO decode of every
    * frame's PNG bytes. */
  def decodeVideo(video: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(video)
    require(buf.getInt() == MAGIC, "payload is not a GVID container")
    val nf = buf.getInt()
    require(nf >= 1 && nf <= 4096, s"implausible frame count $nf")
    (0 until nf).map { _ =>
      val len = buf.getInt()
      val fr = new Array[Byte](len)
      buf.get(fr)
      fr
    }
  }
}

/** Video-modality operators (driver brief: image/audio/VIDEO as opaque
  * binary columns) — the third sensory modality, completing the
  * family: decode + feature extraction off the real per-frame codec
  * ([[qVideoFeatures]]) and content dedup via TEMPORAL perceptual
  * hashing ([[qVideoDedup]]: per-frame dHash, frame-aligned banded
  * candidates, sequence-level verify).
  *
  * == 100 TB design ==
  * Codec work is batch `mapPartitions` (linear, shuffle-free); dedup
  * signatures are (doc, frame)-granular rows — ~1 KB standing in for
  * arbitrarily large frames — banded into (frame_idx, band_idx,
  * band_val) buckets, so the candidate self-join is frame-aligned and
  * never all-pairs, and verification touches candidates only.
  */
object VideoOps extends QueryModule {
  import Tables._
  import ImageCodec.{GRID_N, HASH_COLS, HASH_ROWS}

  /** Synthesizes the real GVID media column — the codec's ENCODE
    * stage, batch-shaped. */
  def withVideo(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          (id, VideoCodec.encodeVideo(payload))
        })
      }
      .toDF("doc_id", "video")
  }

  /** Batch-shaped REAL decode over the binary video column: container
    * parse, per-frame ImageIO decode, dHash-grid feature fold. */
  def decodeVideoFeatures(
      docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideo(docs, batchSize)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, video) =>
          val frames = VideoCodec.decodeVideo(video)
          val d0 = ImageCodec.decode(frames.head)
          val gridSum = frames.iterator
            .map(fr => ImageCodec.dhash(fr).grid.sum).sum
          VideoFeature(id, frames.length.toLong,
            d0.width.toLong, d0.height.toLong, gridSum)
        })
      }
      .toDF()
  }

  // ---------------------------------------------------- q_video_features
  private def qVideoFeatures(s: SparkSession, d: String): DataFrame =
    decodeVideoFeatures(documents(s, d))

  /** Oracle prelude: per-(doc, frame) window geometry and the 136
    * dHash-grid samples, replayed from `documents.text` in integer
    * arithmetic. Frame f covers bytes [f·s, min(n, (f+1)·s)); its PNG
    * dims come from [[ImageCodec.dims]] of the window length; grid
    * sample k is the window byte at the [[ImageCodec.dhash]]
    * nearest-neighbor raster position, tiled over the window. */
  private def videoFramesSql(docsCte: String): String = {
    // grid sample k (0..GRID_N-1): y = k/HASH_COLS, x = k%HASH_COLS;
    // raster pixel ((y·h)/HASH_ROWS · w + (x·w)/HASH_COLS), tiled over
    // the lf window bytes at offset off (1-based substr)
    val pix = s"(f.off + ((((((k // $HASH_COLS) * f.h) // $HASH_ROWS) * f.w + " +
      s"(((k % $HASH_COLS) * f.w) // $HASH_COLS)) % f.lf)) + 1)"
    s"""b AS (
      |  SELECT doc_id, text, octet_length(encode(text)) AS n,
      |    (octet_length(encode(text)) + (4 + octet_length(encode(text)) % 4) - 1)
      |      // (4 + octet_length(encode(text)) % 4) AS s
      |  FROM $docsCte WHERE octet_length(encode(text)) >= 1),
      |bf AS (SELECT *, (n + s - 1) // s AS nf FROM b),
      |f AS (
      |  SELECT bf.doc_id, bf.text, bf.nf, t.f, t.f * bf.s AS off,
      |    least(bf.n, (t.f + 1) * bf.s) - t.f * bf.s AS lf,
      |    16 + (least(bf.n, (t.f + 1) * bf.s) - t.f * bf.s) % 48 AS w,
      |    16 + ((least(bf.n, (t.f + 1) * bf.s) - t.f * bf.s) * 7) % 48 AS h
      |  FROM bf, generate_series(0, 7) AS t(f)
      |  WHERE t.f < bf.nf),
      |g AS MATERIALIZED (
      |  SELECT doc_id, nf, f, w, h,
      |    list_transform(generate_series(0, ${GRID_N - 1}), k ->
      |      ord(substr(text, $pix::INT, 1))) AS grid
      |  FROM f)""".stripMargin
  }

  private val qVideoFeaturesSql =
    s"""WITH ${videoFramesSql("documents")}
      |SELECT doc_id,
      |  CAST(max(nf) AS BIGINT) AS n_frames,
      |  CAST(max(CASE WHEN f = 0 THEN w END) AS BIGINT) AS frame0_w,
      |  CAST(max(CASE WHEN f = 0 THEN h END) AS BIGINT) AS frame0_h,
      |  CAST(sum(list_sum(grid)) AS BIGINT) AS grid_sum
      |FROM g GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------- q_video_dedup
  /** Video CONTENT dedup via TEMPORAL perceptual hashing — the
    * multimodal×dedup composition for the sequence modality: every
    * container decodes through the real per-frame codec, each frame
    * dHashes off its raster ([[ImageCodec.dhash]]), and near-duplicate
    * VIDEOS surface through a frame-aligned banded join — candidates
    * are pairs sharing a band value at the SAME (frame_idx, band_idx),
    * verified by the SEQUENCE-level gates: equal frame count, total
    * aligned Hamming ≤ [[VID_HAM_MAX_PER_FRAME]]·n_frames, total
    * aligned grid SAD ≤ [[VID_SAD_MAX]].
    *
    * Candidates are COMPLETE at the sequence gate, not approximate: a
    * pair with total aligned Hamming ≤ 7·nf has SOME frame at Hamming
    * ≤ 7 (the mean bounds the min), and that frame shares one of its
    * 8 bands by pigeonhole (multi-index hashing, per-frame) — so the
    * frame-aligned band join finds every qualifying pair and the
    * DuckDB oracle stays exact. The per-frame budget (not a flat 7)
    * is what makes short-frame sequences plantable: frame windows of
    * ~n/4 bytes tile their raster densely, so a 1-byte edit can flip
    * more than 7 of frame 0's comparison bits while still being
    * nowhere near the ~64·nf random-pair floor.
    *
    * Planting is the [[Multimodal]] image convention verbatim (every
    * 25th doc re-appended with its first char replaced): the frame
    * windows are DISJOINT, so the edit perturbs exactly frame 0 —
    * total Hamming/SAD equal that one frame's perturbation, well
    * inside the gates, while unrelated pairs fail by orders of
    * magnitude. */
  private val VID_HAM_MAX_PER_FRAME = 7
  /** Sequence SAD gate: one frame's worth of mean |Δ| ≤ 16 gray levels
    * per grid sample — the edit is temporally local, so the budget is
    * per-sequence, not per-frame. */
  private val VID_SAD_MAX = GRID_N * 16
  private val VID_DUP_EVERY = 25
  private val VID_DUP_OFFSET = 1000000L

  private def plantedVideoDocs(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % VID_DUP_EVERY === 0 &&
          length(col("text")) >= 1)
        .select((col("doc_id") + VID_DUP_OFFSET).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text")))
  }

  /** (doc_id, n_frames, frame_idx, bands, grid) per-frame perceptual
    * signatures through the real container parse + per-frame codec,
    * batch-shaped. */
  def videoSignatures(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideo(docs, batchSize)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.flatMap { case (id, video) =>
          val frames = VideoCodec.decodeVideo(video)
          frames.iterator.zipWithIndex.map { case (fr, i) =>
            val ph = ImageCodec.dhash(fr)
            (id, frames.length.toLong, i.toLong, ph.bands.toSeq, ph.grid.toSeq)
          }
        })
      }
      .toDF("doc_id", "n_frames", "frame_idx", "bands", "grid")
  }

  /** Frame-aligned banded candidates + TWO-PHASE sequence-level verify
    * over a per-frame signature table — candidate-only work, never
    * all-pairs, and the heavy per-frame content grids (136 longs each)
    * are joined ONLY for pairs that already passed the Hamming gate:
    * candidate volume is ~N²/65536 per (frame, band) bucket, so
    * shipping both grids for every candidate×frame row is the memory
    * hot spot at corpus scale (it OOMed the 8 GB sf1 bench JVM), while
    * Hamming survivors are a vanishing fraction. The bands phase moves
    * ~9 longs per row; the grid phase runs on survivors only. */
  private[llm] def videoPairsFromSignatures(sig: DataFrame): DataFrame = {
    val banded = sig.select(col("doc_id"), col("frame_idx"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // phase 1: Hamming + frame-count gates over the 8-word band
    // signatures alone
    val ba = sig.select(col("doc_id").as("doc_a"), col("n_frames").as("nfa"),
      col("frame_idx"), col("bands").as("ba"))
    val bb = sig.select(col("doc_id").as("doc_b"), col("n_frames").as("nfb"),
      col("frame_idx"), col("bands").as("bb"))
    val hamPass = cand.join(ba, "doc_a").join(bb, Seq("doc_b", "frame_idx"))
      .withColumn("fham", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("nfa")).as("nfa"), max(col("nfb")).as("nfb"),
        sum(col("fham")).as("hamming"))
      .filter(col("nfa") === col("nfb") &&
        col("hamming") <= lit(VID_HAM_MAX_PER_FRAME) * col("nfa"))
      .select(col("doc_a"), col("doc_b"), col("nfa").as("n_frames"),
        col("hamming"))
    // phase 2: the content-grid SAD check, survivors only
    val ga = sig.select(col("doc_id").as("doc_a"), col("frame_idx"),
      col("grid").as("ga"))
    val gb = sig.select(col("doc_id").as("doc_b"), col("frame_idx"),
      col("grid").as("gb"))
    hamPass.join(ga, "doc_a").join(gb, Seq("doc_b", "frame_idx"))
      .withColumn("fsad", expr(
        "aggregate(zip_with(ga, gb, (x, y) -> abs(x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_frames"), col("hamming"))
      .agg(sum(col("fsad")).as("grid_sad"))
      .filter(col("grid_sad") <= VID_SAD_MAX)
      .select(col("doc_a"), col("doc_b"), col("n_frames"),
        col("hamming"), col("grid_sad"))
  }

  private def qVideoDedup(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Scratch.dir("graft-viddedup").resolve("sig").toString
    videoSignatures(plantedVideoDocs(s, d))
      .write.mode("overwrite").parquet(dir)
    videoPairsFromSignatures(s.read.parquet(dir))
  }

  private val qVideoDedupSql = {
    val bitsPerRow = HASH_COLS - 1 // 16
    val nBits = HASH_ROWS * bitsPerRow // 128 per frame
    def bit(side: String) =
      s"$side.grid[(t // $bitsPerRow) * $HASH_COLS + (t % $bitsPerRow) + 1] > " +
        s"$side.grid[(t // $bitsPerRow) * $HASH_COLS + (t % $bitsPerRow) + 2]"
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $VID_DUP_OFFSET, 'z' || substr(text, 2)
      |  FROM documents
      |  WHERE doc_id % $VID_DUP_EVERY = 0
      |    AND octet_length(encode(text)) >= 1),
      |${videoFramesSql("alldocs")},
      |bands AS MATERIALIZED (
      |  SELECT g.doc_id, g.f, t.j,
      |    list_sum(list_transform(generate_series(0, ${bitsPerRow - 1}), x ->
      |      CASE WHEN grid[t.j * $HASH_COLS + x + 1] >
      |                grid[t.j * $HASH_COLS + x + 2]
      |           THEN (1::BIGINT << x) ELSE 0::BIGINT END)) AS bv
      |  FROM g, generate_series(0, ${HASH_ROWS - 1}) AS t(j)),
      |cand AS MATERIALIZED (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      |  FROM bands a JOIN bands b2
      |    ON b2.f = a.f AND b2.j = a.j AND b2.bv = a.bv
      |      AND a.doc_id < b2.doc_id),
      |ver AS (
      |  SELECT c.doc_a, c.doc_b,
      |    max(ga.nf) AS nfa, max(gb.nf) AS nfb,
      |    CAST(sum(list_sum(list_transform(generate_series(0, ${nBits - 1}), t ->
      |      CASE WHEN (${bit("ga")}) != (${bit("gb")})
      |           THEN 1 ELSE 0 END))) AS BIGINT) AS hamming,
      |    CAST(sum(list_sum(list_transform(generate_series(1, $GRID_N), i ->
      |      abs(ga.grid[i] - gb.grid[i])))) AS BIGINT) AS grid_sad
      |  FROM cand c
      |  JOIN g ga ON ga.doc_id = c.doc_a
      |  JOIN g gb ON gb.doc_id = c.doc_b AND gb.f = ga.f
      |  GROUP BY c.doc_a, c.doc_b)
      |SELECT doc_a, doc_b, CAST(nfa AS BIGINT) AS n_frames,
      |  hamming, grid_sad
      |FROM ver WHERE nfa = nfb
      |  AND hamming <= $VID_HAM_MAX_PER_FRAME * nfa
      |  AND grid_sad <= $VID_SAD_MAX""".stripMargin
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_video_features" -> qVideoFeatures _,
    "q_video_dedup"    -> qVideoDedup _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_video_features" -> qVideoFeaturesSql,
    "q_video_dedup"    -> qVideoDedupSql)
}
