package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** One resized payload produced by the (stubbed) codec. */
final case class ResizedMedia(
    doc_id: Long,
    n_bytes: Int,
    resized_md5: String,
    width: Int,
    height: Int)

/** Decoded-media features produced by the (stubbed) codec. */
final case class MediaFeature(
    doc_id: Long,
    n_bytes: Int,
    checksum: String,
    width: Int,
    height: Int,
    mean_byte: Double)

/** STUB CODEC — deliberately fake, clearly marked (driver brief: the
  * container ships no image/audio libraries, so the decode step is a
  * deterministic stand-in while the Spark-side plumbing — schema,
  * batching, partitioning — is real and tested).
  *
  * A real deployment replaces `decode` with an actual media library
  * bound behind the same batch interface (in PySpark that is
  * `mapInPandas`/`mapInArrow`; in Scala, this `mapPartitions` + batch
  * shape is the equivalent: columnar batches in, columnar batches out,
  * one codec instance per partition, no per-row JNI crossings).
  */
object StubCodec {
  final case class Decoded(width: Int, height: Int, meanByte: Double)

  /** Fake "decode": derives stable dimensions and a pixel statistic
    * from the payload bytes. Deterministic by construction. */
  def decode(payload: Array[Byte]): Decoded = {
    val n = payload.length
    val mean = if (n == 0) 0.0
      else payload.iterator.map(b => (b & 0xff).toDouble).sum / n
    Decoded(16 + n % 240, 16 + (n * 7) % 240, mean)
  }

  /** Fake "resize": nearest-neighbor downsample along the byte stream —
    * keep every `factor`-th byte (a real codec resamples pixels; the
    * byte-stride stand-in keeps the op deterministic and
    * oracle-replayable). */
  def resize(payload: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1)
    Array.tabulate((payload.length + factor - 1) / factor)(i => payload(i * factor))
  }
}

/** Multimodal-column operators (SURVEY §2.9 / driver brief): media
  * payloads as opaque `binary` columns + typed metadata, with
  * decode/feature-extraction run batch-at-a-time per partition.
  *
  * The test corpus has no real media, so payloads are synthesized
  * deterministically from `documents.text` (UTF-8 bytes — ASCII here,
  * making byte offsets equal char offsets, which is what lets the
  * DuckDB oracle verify the byte-level plumbing end-to-end: lengths,
  * checksums, derived dimensions, frame sampling).
  *
  * == 100 TB design ==
  * Binary columns ride parquet as-is (no row-group bloat beyond size);
  * metadata lives beside the payload so pruning-friendly scans can
  * filter on `media_meta.*` without touching bytes; the decode stage is
  * `mapPartitions` over batches — linear, shuffle-free, codec state
  * amortized per partition; frame sampling is a per-row array
  * expression.
  */
object Multimodal extends QueryModule {
  import Tables._

  private val FRAME_BYTES = 16
  private val FRAME_STRIDE = 32

  /** Attaches the synthesized binary payload + typed metadata struct. */
  def withPayload(docs: DataFrame): DataFrame = docs
    .withColumn("payload", col("text").cast("binary"))
    .withColumn("media_meta", struct(
      (lit(16) + pmod(length(col("payload")), lit(240))).as("width"),
      (lit(16) + pmod(length(col("payload")) * 7, lit(240))).as("height"),
      element_at(typedLit(Seq("png", "jpeg", "webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format")))

  /** Batch-shaped decode: partitions stream through the stub codec in
    * groups of `batchSize` rows (the mapInPandas/mapInArrow shape —
    * batching is what a real codec binding needs to amortize setup). */
  def decodeFeatures(docs: DataFrame, batchSize: Int = 64): Dataset[MediaFeature] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload) =>
            val dec = StubCodec.decode(payload)
            MediaFeature(id, payload.length,
              java.security.MessageDigest.getInstance("MD5")
                .digest(payload).map("%02x".format(_)).mkString,
              dec.width, dec.height, dec.meanByte)
          }
        }
      }
  }

  /** Batch-shaped RESIZE through the stub codec (the remaining codec op
    * of the driver brief: decode / feature-extract / RESIZE /
    * frame-sample): every `factor`-th byte survives, dimensions are
    * re-derived from the resized payload — same `mapPartitions` batch
    * interface as [[decodeFeatures]]. */
  def resizeMedia(
      docs: DataFrame, factor: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, payload) =>
            val rp = StubCodec.resize(payload, factor)
            val dec = StubCodec.decode(rp)
            ResizedMedia(id, rp.length,
              java.security.MessageDigest.getInstance("MD5")
                .digest(rp).map("%02x".format(_)).mkString,
              dec.width, dec.height)
          }
        }
      }
  }

  // ------------------------------------------------- q_multimodal_resize
  /** The codec-shaped resize under the oracle gate: factor-2 byte
    * downsample, re-derived dimensions, checksum of the resized bytes.
    * ASCII payloads let the oracle rebuild the resized payload as the
    * odd-position characters. */
  private def qMultimodalResize(s: SparkSession, d: String): DataFrame =
    resizeMedia(documents(s, d).filter(length(col("text")) >= 1), factor = 2)
      .toDF()
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("resized_md5"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
  private val qMultimodalResizeSql =
    // the series bound is static (DuckDB's generate_series cannot be
    // lateral over a column): 8192 comfortably exceeds every corpus
    // text (max ~600 chars); positions beyond the text are filtered
    """WITH r AS (
      |  SELECT doc_id, string_agg(substr(text, i, 1), '' ORDER BY i) AS rp
      |  FROM documents, generate_series(1, 8192, 2) AS t(i)
      |  WHERE i <= length(text)
      |  GROUP BY doc_id)
      |SELECT doc_id,
      |  octet_length(encode(rp)) AS n_bytes,
      |  md5(rp) AS resized_md5,
      |  16 + octet_length(encode(rp)) % 240 AS width,
      |  16 + (octet_length(encode(rp)) * 7) % 240 AS height
      |FROM r""".stripMargin

  // --------------------------------------------------- q_multimodal_meta
  /** Typed-metadata extraction from the binary column — flat projection
    * so the DuckDB oracle can verify byte lengths, checksums and the
    * derived dimensions. */
  private def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    withPayload(documents(s, d)).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("payload_md5"),
      col("media_meta.width").cast("long").as("width"),
      col("media_meta.height").cast("long").as("height"),
      col("media_meta.format").as("format"))
  private val qMultimodalMetaSql =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  16 + octet_length(encode(text)) % 240 AS width,
      |  16 + (octet_length(encode(text)) * 7) % 240 AS height,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents""".stripMargin

  // ----------------------------------------------------- q_frame_sample
  /** Frame sampling over a "video" payload: every FRAME_STRIDE bytes,
    * checksum a FRAME_BYTES window — per-row array expression, the
    * plumbing shape of keyframe extraction. ASCII payloads make byte
    * windows equal char windows, so the oracle uses substr on text. */
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

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_multimodal_meta"   -> qMultimodalMeta _,
    "q_multimodal_resize" -> qMultimodalResize _,
    "q_frame_sample"      -> qFrameSample _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_multimodal_meta"   -> qMultimodalMetaSql,
    "q_multimodal_resize" -> qMultimodalResizeSql,
    "q_frame_sample"      -> qFrameSampleSql)
}
