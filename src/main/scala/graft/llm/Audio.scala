package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Decoded-audio features straight off the REAL codec parse. */
final case class AudioFeature(
    doc_id: Long,
    n_samples: Long,   // decoded frame count (WAV header + PCM body)
    sample_rate: Long, // decoded format sample rate
    duration_ms: Long, // n_samples / (rate/1000), integer
    amp_sum: Long,     // sum |sample| over the decoded PCM stream
    peak_amp: Long,    // max |sample|
    mean_amp: Double)  // amp_sum / n_samples — one IEEE div of exact ints

/** REAL audio codec on `javax.sound.sampled` (JDK-builtin — the WAV
  * file reader/writer ships in every JDK and needs no audio device):
  * 16-bit signed little-endian mono PCM inside a RIFF/WAVE container,
  * lossless, so every decoded sample is replayable by the DuckDB
  * oracle from the source content alone — the ImageIO argument
  * ([[ImageCodec]]), audio-side.
  *
  * The test corpus has no real media, so audio is SYNTHESIZED as real
  * WAV files from `documents.text`: the duration comes from the
  * content-length formula below and sample i is the centered, scaled
  * content byte `(byte[i mod n] - 128) * 200` — a deterministic
  * waveform whose decoded values DuckDB derives from the text. The
  * synthesis IS the encode op of the codec surface; decode, feature
  * extraction, and fingerprinting then run against genuine WAV bytes
  * they did not produce.
  */
object AudioCodec {
  val SAMPLE_RATE = 8000
  /** Sample scale: centered bytes × 200 stay inside 16-bit PCM
    * (|v| ≤ 128·200 = 25600 < 32768) while keeping every decoded
    * value an exact small integer for the oracle replay. */
  val SCALE = 200
  private val FMT =
    new AudioFormat(SAMPLE_RATE.toFloat, 16, 1, true, false)

  /** The JDK's own WAVE SPI providers, resolved ONCE per JVM.
    * `AudioSystem.write` / `getAudioInputStream` walk the provider
    * registry on EVERY call, and the reader walk signals each
    * non-matching provider with a thrown
    * `UnsupportedAudioFileException` — per-row stack-trace
    * construction that dominates the dispatch at corpus scale. The
    * cached instances are the SAME JDK codec classes AudioSystem
    * dispatches to; only the per-call walk is gone. Resolution
    * failure falls back to the AudioSystem entry points. */
  private lazy val wavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    scala.util.Try(
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter],
          classOf[AudioSystem].getClassLoader)
        .iterator.asScala
        .find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
    ).toOption.flatten
  }
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    // probe: a minimal WAV in this codec's own format, written through
    // the public entry point — the provider that parses it is the one
    // AudioSystem would pick for every real payload
    scala.util.Try {
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(new Array[Byte](16)), FMT, 8L),
        AudioFileFormat.Type.WAVE, bos)
      val probe = bos.toByteArray
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader],
          classOf[AudioSystem].getClassLoader)
        .iterator.asScala
        .find(r => scala.util.Try(
          r.getAudioInputStream(new ByteArrayInputStream(probe))).isSuccess)
    }.toOption.flatten
  }

  /** Synthesized duration from the content length: 1100..1999 samples
    * (~0.14–0.25 s at 8 kHz), bounded so the oracle's per-sample
    * replay stays a ≤2k-term sum per row, and ≥ 1100 so the last of
    * the 136 fingerprint windows ([[fingerprint]]) fits: the window
    * stride is nsamp/136 ≥ 8 = the window width. */
  def nSamples(n: Int): Int = 1100 + (n * 13) % 900

  /** The synthesized PCM stream: content bytes tiled, centered,
    * scaled. */
  def synthPcm(payload: Array[Byte]): Array[Short] = {
    val bytes = if (payload.isEmpty) Array[Byte](0) else payload
    val out = new Array[Short](nSamples(payload.length))
    var i = 0
    while (i < out.length) {
      out(i) = (((bytes(i % bytes.length) & 0xff) - 128) * SCALE).toShort
      i += 1
    }
    out
  }

  /** Real WAV encode: pack LE 16-bit PCM, write the RIFF/WAVE
    * container through `AudioSystem`. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val body = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      body(2 * i) = (samples(i) & 0xff).toByte
      body(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(body), FMT, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, bos)
      case None    => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    }
    bos.toByteArray
  }

  final case class DecodedAudio(
      nSamples: Int, sampleRate: Int, samples: Array[Short])

  /** Real decode: container parse + PCM unpack through
    * `AudioSystem.getAudioInputStream` — format, frame count, and
    * every sample come off the parsed stream. */
  def decodeWav(wav: Array[Byte]): DecodedAudio = {
    val in = wavReader match {
      case Some(r) => r.getAudioInputStream(new ByteArrayInputStream(wav))
      case None    => AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
    }
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unexpected WAV format $fmt")
    val n = in.getFrameLength.toInt
    val body = in.readAllBytes()
    require(body.length >= n * 2, "truncated PCM body")
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((body(2 * i + 1) & 0xff) << 8) | (body(2 * i) & 0xff)).toShort
      i += 1
    }
    DecodedAudio(n, fmt.getSampleRate.toInt, out)
  }

  /** A 128-bit energy-difference fingerprint (the Haitsma–Kalker
    * "robust audio fingerprint" shape: coarse frame energies,
    * difference-coded so the signature is gain-shift tolerant) over
    * the REAL decoded stream, plus the 136-entry energy grid it
    * derives from.
    *
    * The stream divides into 8 sections × 17 windows: window k
    * (0..135) sums |sample| over the [[WIN]] = 8 samples starting at
    * `(k·nsamp)/136`, and each of the 8×16 fingerprint bits records
    * whether window k's energy exceeds window k+1's within its
    * section. Exactly the [[ImageCodec.PHash]] band decomposition:
    * the 8 section-words (each 0..65535) are the multi-index-hashing
    * split (Norouzi et al.) — two fingerprints within Hamming
    * distance 7 MUST agree on a full section by pigeonhole, so a
    * band-bucket equi-join is a COMPLETE candidate generator at that
    * threshold, never all-pairs, with 65536 buckets per band keeping
    * random collisions ~N²/65536 per band. */
  final case class AFingerprint(bands: Array[Long], grid: Array[Long])

  val FP_ROWS = 8
  val FP_COLS = 17 // 16 comparisons per section
  val GRID_N: Int = FP_ROWS * FP_COLS // 136 energy windows
  val WIN = 8      // samples per energy window

  def fingerprint(wav: Array[Byte]): AFingerprint = {
    val dec = decodeWav(wav)
    val s = dec.samples
    val grid = new Array[Long](GRID_N)
    var k = 0
    while (k < GRID_N) {
      val start = (k * dec.nSamples) / GRID_N
      var e = 0L
      var j = 0
      while (j < WIN) { e += math.abs(s(start + j).toLong); j += 1 }
      grid(k) = e
      k += 1
    }
    val bands = new Array[Long](FP_ROWS)
    var y = 0
    while (y < FP_ROWS) {
      var v = 0L
      var x = 0
      while (x < FP_COLS - 1) {
        if (grid(y * FP_COLS + x) > grid(y * FP_COLS + x + 1))
          v |= (1L << x)
        x += 1
      }
      bands(y) = v
      y += 1
    }
    AFingerprint(bands, grid)
  }
}

/** Audio-modality operators (driver brief: image/AUDIO/video as opaque
  * binary columns): synthesis (encode), REAL codec decode + feature
  * extraction, and content dedup via an energy-difference fingerprint
  * — the [[Multimodal]] image surface, audio-side, so the multimodal
  * family covers both sensory modalities with a real JDK codec each.
  *
  * == 100 TB design ==
  * Every codec stage is batch `mapPartitions` (linear, shuffle-free,
  * no per-row stream-handle churn); dedup is the banded-LSH skeleton —
  * signatures materialized once, one shuffled self-join on
  * (band_idx, band_val) with 65536 buckets per band, candidate-only
  * verification — never all-pairs.
  *
  * == Oracle strategy ==
  * The synthesized WAVs are lossless 16-bit PCM with samples =
  * centered/scaled content bytes tiled over the duration formula, so
  * every DECODED value — frame counts, amplitude sums, window
  * energies, fingerprint bits, both dedup gates — replays in DuckDB
  * from `documents.text` alone, integer arithmetic end to end. The
  * Spark side still computes everything from the REAL parsed WAV;
  * the oracle proves the decode.
  */
object AudioOps extends QueryModule {
  import Tables._
  import AudioCodec.{FP_COLS, FP_ROWS, GRID_N, SCALE, WIN}

  /** Synthesizes the real WAV media column — the codec's ENCODE
    * stage, batch-shaped. */
  def withAudio(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          (id, AudioCodec.encodeWav(AudioCodec.synthPcm(payload)))
        })
      }
      .toDF("doc_id", "wav")
  }

  /** Batch-shaped REAL decode over the binary audio column: frame
    * count, rate, and amplitude statistics off the parsed PCM. */
  def decodeAudioFeatures(
      docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withAudio(docs, batchSize)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, wav) =>
          val dec = AudioCodec.decodeWav(wav)
          var sum = 0L
          var peak = 0L
          var i = 0
          while (i < dec.samples.length) {
            val a = math.abs(dec.samples(i).toLong)
            sum += a
            if (a > peak) peak = a
            i += 1
          }
          AudioFeature(id, dec.nSamples.toLong, dec.sampleRate.toLong,
            (dec.nSamples / (dec.sampleRate / 1000)).toLong,
            sum, peak, sum.toDouble / dec.nSamples)
        })
      }
      .toDF()
  }

  // ----------------------------------------------------- q_audio_features
  private def qAudioFeatures(s: SparkSession, d: String): DataFrame =
    decodeAudioFeatures(documents(s, d))

  /** Oracle prelude shared by both rows: content length and the
    * synthesized duration. The static generate_series bound (2048 >
    * max nsamp 1999) + length filter is the [[Multimodal]] idiom —
    * DuckDB's generate_series cannot be lateral over a column. */
  private val audioBaseSql =
    """b AS (
      |  SELECT doc_id, text,
      |    octet_length(encode(text)) AS n,
      |    1100 + (octet_length(encode(text)) * 13) % 900 AS ns
      |  FROM documents WHERE octet_length(encode(text)) >= 1)""".stripMargin

  private val qAudioFeaturesSql =
    s"""WITH $audioBaseSql,
      |s AS (
      |  SELECT b.doc_id,
      |    sum(abs(ord(substr(b.text, (t.i % b.n) + 1, 1)) - 128) * $SCALE)
      |      AS amp_sum,
      |    max(abs(ord(substr(b.text, (t.i % b.n) + 1, 1)) - 128) * $SCALE)
      |      AS peak_amp
      |  FROM b, generate_series(0, 2047) AS t(i)
      |  WHERE t.i < b.ns
      |  GROUP BY b.doc_id)
      |SELECT b.doc_id,
      |  CAST(b.ns AS BIGINT) AS n_samples,
      |  CAST(${AudioCodec.SAMPLE_RATE} AS BIGINT) AS sample_rate,
      |  CAST(b.ns // ${AudioCodec.SAMPLE_RATE / 1000} AS BIGINT) AS duration_ms,
      |  CAST(s.amp_sum AS BIGINT) AS amp_sum,
      |  CAST(s.peak_amp AS BIGINT) AS peak_amp,
      |  s.amp_sum / CAST(b.ns AS DOUBLE) AS mean_amp
      |FROM b JOIN s USING (doc_id)""".stripMargin

  // -------------------------------------------------------- q_audio_dedup
  /** Audio CONTENT dedup via the energy-difference fingerprint — the
    * multimodal×dedup composition, audio-side ([[Multimodal]]'s
    * q_image_dedup pattern): every payload decodes through the REAL
    * codec, fingerprints off its parsed PCM
    * ([[AudioCodec.fingerprint]]), and near-duplicate pairs surface
    * through the banded-LSH skeleton — signatures materialized once,
    * a band-bucket candidate self-join (NEVER all-pairs; COMPLETE at
    * Hamming ≤ [[AUD_HAM_MAX]] = 7 < 8 bands by pigeonhole), exact
    * two-stage verification on candidates only: the Hamming gate on
    * the fingerprint, then the ENERGY-PROFILE distance (sum of
    * absolute window-energy differences ≤ [[AUD_SAD_MAX]]) — the
    * content check that kills fingerprint-collision false positives.
    *
    * Planted near-dups follow the q_image_dedup convention, RESTRICTED
    * to docs of ≥ [[AUD_MIN_LEN]] bytes: a 1-char text edit perturbs
    * every tiled occurrence of that byte (~nsamp/n samples), so only
    * for long docs is the perturbation guaranteed to graze ≤ a handful
    * of the 136 energy windows — measured Hamming 0–3 and profile
    * distance ≤ 20k vs an unrelated-pair floor of 38 / 1.1M on this
    * corpus, both gates an order of magnitude clear. The corpus's
    * NATURAL exact-dup texts (the q_exact_dedup planting) synthesize
    * identical waveforms and surface too — correct, and replayed
    * identically by the oracle. */
  private val AUD_HAM_MAX = 7
  /** Energy-profile gate: mean |Δ| ≤ 1200 per window = 6 byte-units
    * (×[[SCALE]]) of drift across each 8-sample window. */
  private val AUD_SAD_MAX = GRID_N * 1200
  private val AUD_DUP_EVERY = 25
  private val AUD_DUP_OFFSET = 1000000L
  private val AUD_MIN_LEN = 300

  /** The deterministically-planted near-dup AUDIO corpus: every
    * [[AUD_DUP_EVERY]]-th doc of length ≥ [[AUD_MIN_LEN]] re-appends
    * under `doc_id + AUD_DUP_OFFSET` with its FIRST character replaced
    * by 'z' — length (hence duration) preserved, waveform perturbed in
    * the few windows containing a sample index ≡ 0 (mod n). Replays
    * exactly in DuckDB. */
  private def plantedAudioDocs(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    base.unionByName(
      base.filter(col("doc_id") % AUD_DUP_EVERY === 0 &&
          length(col("text")) >= AUD_MIN_LEN)
        .select((col("doc_id") + AUD_DUP_OFFSET).as("doc_id"),
          concat(lit("z"), expr("substring(text, 2)")).as("text")))
  }

  /** (doc_id, bands, grid) fingerprint signatures through the real
    * codec, batch-shaped. */
  def audioFingerprints(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withAudio(docs, batchSize)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { case (id, wav) =>
          val fp = AudioCodec.fingerprint(wav)
          (id, fp.bands.toSeq, fp.grid.toSeq)
        })
      }
      .toDF("doc_id", "bands", "grid")
  }

  /** (doc_id, band_idx, band_val) rows of a signature table — NULL
    * signatures (un-synthesizable docs) explode to no rows and so
    * never band-match, the [[AudioHashIndex]] total-derivation
    * contract. */
  private def afpBandRows(fp: DataFrame): DataFrame =
    fp.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_val")))

  /** Two-stage, TWO-PHASE verification of candidate pairs against a
    * signature table: phase 1 joins only the 8-word band signatures
    * (64 bytes/side) and applies the exact-Hamming gate; phase 2 joins
    * the 136-long energy grids (~1 KB/side) for HAMMING SURVIVORS
    * ONLY. Candidate volume is ~N²/65536 per band (random band
    * collisions), and nearly all of it dies at the Hamming gate
    * (random-pair floor ≈ 38 vs gate 7) — so the heavy grid arrays
    * never ship for the quadratic bulk (the [[VideoOps]] split; guide
    * §2.3/§8: decide on a lightweight proxy, move heavy bytes for
    * survivors only). Same filters, same output — the phases are the
    * same conjunction evaluated in selectivity order. */
  private def afpVerify(fp: DataFrame, cand: DataFrame): DataFrame = {
    val hamPass = cand
      .join(fp.select(col("doc_id").as("doc_a"), col("bands").as("ba")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("bands").as("bb")), "doc_b")
      .withColumn("hamming", expr(
        "aggregate(zip_with(ba, bb, (x, y) -> CAST(bit_count(x ^ y) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .filter(col("hamming") <= AUD_HAM_MAX)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    hamPass
      .join(fp.select(col("doc_id").as("doc_a"), col("grid").as("ga")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("grid").as("gb")), "doc_b")
      .withColumn("energy_sad", expr(
        "aggregate(zip_with(ga, gb, (x, y) -> abs(x - y)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .filter(col("energy_sad") <= AUD_SAD_MAX)
      .select(col("doc_a"), col("doc_b"), col("hamming"), col("energy_sad"))
  }

  /** Near-dup audio pairs from a signature table (doc_id, bands,
    * grid): multi-index band self-join, dedup candidates, two-stage
    * verify — candidate-only work over the 136-long energy arrays.
    * Shared by the query path ([[qAudioDedup]]) and the persisted
    * [[AudioHashIndex]] — the [[Multimodal.phashPairsFromSignatures]]
    * split, audio-side. */
  private[llm] def afpPairsFromSignatures(fp: DataFrame): DataFrame = {
    val banded = afpBandRows(fp)
    val cand = banded.alias("a").join(banded.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    afpVerify(fp, cand)
  }

  /** Near-dup audio pairs INVOLVING `deltaKeys` (one `doc_id` column)
    * only — the steady-state query after an index refresh: the delta's
    * band rows join the WHOLE signature table, O(Δ × band bucket)
    * instead of a corpus-wide pair pass. */
  private[llm] def afpPairsFor(
      fp: DataFrame, deltaKeys: DataFrame): DataFrame = {
    val all = afpBandRows(fp)
    val dlt = afpBandRows(fp.join(deltaKeys, "doc_id"))
    val cand = dlt.alias("a").join(all.alias("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    afpVerify(fp, cand)
  }

  private def qAudioDedup(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Scratch.dir("graft-auddedup").resolve("afp").toString
    audioFingerprints(plantedAudioDocs(s, d))
      .write.mode("overwrite").parquet(dir)
    afpPairsFromSignatures(s.read.parquet(dir))
  }

  private val qAudioDedupSql = {
    val bitsPerRow = FP_COLS - 1 // 16
    val nBits = FP_ROWS * bitsPerRow // 128
    def bit(side: String) =
      s"$side.grid[(t // $bitsPerRow) * $FP_COLS + (t % $bitsPerRow) + 1] > " +
        s"$side.grid[(t // $bitsPerRow) * $FP_COLS + (t % $bitsPerRow) + 2]"
    s"""WITH alldocs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $AUD_DUP_OFFSET, 'z' || substr(text, 2)
      |  FROM documents
      |  WHERE doc_id % $AUD_DUP_EVERY = 0
      |    AND octet_length(encode(text)) >= $AUD_MIN_LEN),
      |b AS (
      |  SELECT doc_id, text,
      |    octet_length(encode(text)) AS n,
      |    1100 + (octet_length(encode(text)) * 13) % 900 AS ns
      |  FROM alldocs WHERE octet_length(encode(text)) >= 1),
      |g0 AS (
      |  SELECT b.doc_id, t.k,
      |    sum(abs(ord(substr(b.text,
      |      (((t.k * b.ns) // $GRID_N + u.j) % b.n) + 1, 1)) - 128) * $SCALE)
      |      AS e
      |  FROM b, generate_series(0, ${GRID_N - 1}) AS t(k),
      |    generate_series(0, ${WIN - 1}) AS u(j)
      |  GROUP BY b.doc_id, t.k),
      |g AS (SELECT doc_id, list(e ORDER BY k) AS grid FROM g0 GROUP BY doc_id),
      |bands AS (
      |  SELECT g.doc_id, t.j,
      |    list_sum(list_transform(generate_series(0, ${bitsPerRow - 1}), x ->
      |      CASE WHEN grid[t.j * $FP_COLS + x + 1] >
      |                grid[t.j * $FP_COLS + x + 2]
      |           THEN (1::BIGINT << x) ELSE 0::BIGINT END)) AS bv
      |  FROM g, generate_series(0, ${FP_ROWS - 1}) AS t(j)),
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
      |      abs(ga.grid[i] - gb.grid[i]))) AS BIGINT) AS energy_sad
      |  FROM cand c
      |  JOIN g ga ON ga.doc_id = c.doc_a
      |  JOIN g gb ON gb.doc_id = c.doc_b)
      |SELECT doc_a, doc_b, hamming, energy_sad
      |FROM ver WHERE hamming <= $AUD_HAM_MAX AND energy_sad <= $AUD_SAD_MAX""".stripMargin
  }

  // -------------------------------------------------------- q_audio_index
  /** The PERSISTED audio-signature path ([[AudioHashIndex]] — the
    * [[Multimodal]] q_image_index pattern, audio-side): half the
    * planted corpus lands in a CDF source, the index builds through
    * the SQL DDL surface (`CREATE SIGNATURE INDEX ... USING AFP`, so
    * the DDL path is oracle-gated too), the other half lands and an
    * incremental refresh fingerprints ONLY the new documents; `pairs`
    * then band-joins the persisted signatures. Signatures are pure
    * per-row derivations, so the result is EXACTLY the query-path
    * operator's — the oracle is `qAudioDedupSql` verbatim. Cached per
    * (session, sfDir): the bench's warmup pays the build once and the
    * timed passes measure the PAIRS query over persisted
    * signatures. */
  private val audIndexCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (graft.table.VersionedTable, AudioHashIndex)]

  private def builtAudioIndex(s: SparkSession, d: String)
      : (graft.table.VersionedTable, AudioHashIndex) =
    audIndexCache.synchronized {
      audIndexCache.getOrElseUpdate((s, d), {
        import org.apache.spark.sql.types._
        val dir = graft.Scratch.dir("graft-aud-index")
        val srcSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("text", StringType)))
        val src = graft.table.VersionedTable.create(s,
          dir.resolve("src").toString, srcSchema,
          Map(graft.table.VersionedTable.PROP_CDF -> "true"))
        val docs = plantedAudioDocs(s, d)
        src.append(docs.filter(col("doc_id") % 2 === 0))
        val idxPath = dir.resolve("idx").toString
        graft.catalog.GraftSql.execute(s,
          s"CREATE SIGNATURE INDEX '$idxPath' ON '${src.root}' (text) " +
            "USING AFP")
        src.append(docs.filter(col("doc_id") % 2 === 1))
        graft.catalog.GraftSql.execute(s, s"REFRESH INDEX '$idxPath'")
        (src, AudioHashIndex.load(s, idxPath))
      })
    }

  private def qAudioIndex(s: SparkSession, d: String): DataFrame =
    builtAudioIndex(s, d)._2.pairs

  // ------------------------------------------------------ q_audio_refresh
  /** STEADY-STATE audio-index maintenance + per-batch dedup: each
    * untimed staging deletes and re-appends a small doc slice (real
    * CDF rows, real codec re-fingerprinting, real bucket rewrites,
    * netting to a content-identical UPSERT), so the timed body is ONE
    * [[AudioHashIndex.refresh]] plus [[AudioHashIndex.pairsFor]] over
    * the churned keys — O(Δ × band bucket), never a corpus
    * re-fingerprint. End state stays the full planted corpus, so the
    * oracle is the batch replay filtered to pairs TOUCHING the churned
    * slice. */
  /** 50, not the image side's 37: audio planting carries a
    * [[AUD_MIN_LEN]] length floor, and 50 is the modulus whose churn
    * slice still intersects planted pairs at EVERY test scale (doc
    * 100/200/300 are planted-eligible and churned at sf0.001, where
    * %37 touches none — the all-queries smoke runs there). */
  private val AUD_CHURN_MOD = 50

  private def audioRefreshPrepare(s: SparkSession, d: String): Unit = {
    val (src, _) = builtAudioIndex(s, d)
    val churned = col("doc_id") % AUD_CHURN_MOD === 0
    src.deleteWhere(churned)
    src.append(plantedAudioDocs(s, d).filter(churned)): Unit
  }

  private def qAudioRefresh(s: SparkSession, d: String): DataFrame = {
    val (src, idx) = builtAudioIndex(s, d)
    idx.refresh(src)
    idx.pairsFor(plantedAudioDocs(s, d)
      .filter(col("doc_id") % AUD_CHURN_MOD === 0).select(col("doc_id")))
  }

  /** The batch replay, kept to pairs touching the churned slice — the
    * exact output of [[AudioHashIndex.pairsFor]] over churned keys
    * (candidate generation and verification are side-symmetric). */
  private val qAudioRefreshSql = qAudioDedupSql +
    s"\n  AND (doc_a % $AUD_CHURN_MOD = 0 OR doc_b % $AUD_CHURN_MOD = 0)"

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_audio_features" -> qAudioFeatures _,
    "q_audio_dedup"    -> qAudioDedup _,
    "q_audio_index"    -> qAudioIndex _,
    "q_audio_refresh"  -> qAudioRefresh _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_audio_features" -> qAudioFeaturesSql,
    "q_audio_dedup"    -> qAudioDedupSql,
    "q_audio_index"    -> qAudioDedupSql,
    "q_audio_refresh"  -> qAudioRefreshSql)

  override val prepares: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "q_audio_refresh" -> (audioRefreshPrepare _))
}
