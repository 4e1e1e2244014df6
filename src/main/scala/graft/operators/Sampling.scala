package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Deterministic (hash-threshold) sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: the sample changes when
  * the partitioning changes (repartition, AQE coalesce, task retry with
  * a different split), which makes pipeline runs non-reproducible at
  * exactly the scale where retries are guaranteed. The hash-threshold
  * formulation instead keeps a row iff a 16-bit bucket of md5(id) falls
  * under the stratum's threshold:
  *
  *   - deterministic per ROW, not per partition — same sample on every
  *     run, every cluster size, every retry;
  *   - shuffle-free: a codegen'd per-row filter pushed right above the
  *     scan, so sampling 0.1% of 100 TB reads-and-drops in one pass
  *     with no exchange;
  *   - stratified by any expression: the threshold is a Column, so
  *     per-class rates (balance a skewed label distribution) are a
  *     CASE expression, still one pass;
  *   - consistent across tables: sampling two tables by the SAME key
  *     column yields aligned samples (a joinable subset), the classic
  *     hash-sampling property that RNG sampling cannot give.
  *
  * The bucket is the first 4 hex digits of md5 — portable across
  * engines (the DuckDB oracle recomputes it with strpos arithmetic) and
  * uniform enough for sampling (16 bits ≈ 0.0015% rate granularity).
  */
object Sampling extends QueryModule {
  import Tables._

  /** Uniform 16-bit bucket of `id`'s md5 — in [0, 65536). */
  def hashBucket16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long")

  /** Keep rows whose bucket falls under `threshold65536` (a per-row
    * Column in [0, 65536]; rate = threshold/65536). */
  def sampleByHash(df: DataFrame, id: Column, threshold65536: Column): DataFrame =
    df.filter(hashBucket16(id) < threshold65536)

  /** Stratified sample: per-stratum integer thresholds (out of 65536)
    * with a default for unlisted strata. One codegen'd CASE — no join
    * against a rate table, no per-stratum pass. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      thresholds: Seq[(String, Int)], defaultThreshold: Int): DataFrame = {
    val rate = thresholds.foldLeft(when(lit(false), lit(0))) {
      case (acc, (value, t)) => acc.when(stratum === value, lit(t))
    }.otherwise(lit(defaultThreshold))
    sampleByHash(df, id, rate)
  }

  // -------------------------------------------------- q_stratified_sample
  // Downsample orders per priority class: keep ~30% of URGENT, ~20% of
  // HIGH, ~5% of the rest — the label-balancing shape of corpus
  // preparation. Exact oracle: DuckDB recomputes the identical md5
  // bucket with hex-digit arithmetic, so the row SET matches, not just
  // the rate.
  private def qStratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    stratifiedSample(orders(s, d), $"o_orderkey", $"o_orderpriority",
      Seq("1-URGENT" -> 19661, "2-HIGH" -> 13107), defaultThreshold = 3277)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
  }
  private val qStratifiedSampleSql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice
      |FROM (SELECT *,
      |        (strpos('0123456789abcdef', substring(md5(o_orderkey::VARCHAR), 1, 1)) - 1) * 4096
      |      + (strpos('0123456789abcdef', substring(md5(o_orderkey::VARCHAR), 2, 1)) - 1) * 256
      |      + (strpos('0123456789abcdef', substring(md5(o_orderkey::VARCHAR), 3, 1)) - 1) * 16
      |      + (strpos('0123456789abcdef', substring(md5(o_orderkey::VARCHAR), 4, 1)) - 1) AS bucket
      |      FROM orders) t
      |WHERE bucket < CASE o_orderpriority
      |                 WHEN '1-URGENT' THEN 19661
      |                 WHEN '2-HIGH'   THEN 13107
      |                 ELSE 3277 END""".stripMargin

  // ---------------------------------------------------------- q_mix_epochs
  // TRAINING-MIX construction with OVERSAMPLING — the other half of
  // deterministic sampling: a mixture weight w > 1 replicates each
  // document floor(w) or ceil(w) times so the EXPECTED copy count is w
  // (LLaMA/DoReMi-style source weighting: scarce high-quality sources
  // run multiple epochs, bulk sources fractions of one). Weights are
  // stored as (whole copies, fractional threshold/65536) INTEGER pairs
  // so every decision is exact integer arithmetic:
  //   copy n survives iff n ≤ whole, or n = whole+1 and
  //   bucket16(doc_id) < frac
  // — per-row deterministic (same mix every run/retry/cluster size)
  // and shuffle-free: an explode + filter riding the scan, so building
  // a 100 TB mix is one read-and-replicate pass with no exchange.
  private val MIX: Seq[(String, Int, Int)] = Seq(
    ("en", 2, 32768), // w = 2.5: premium source, 2–3 epochs
    ("zh", 1, 0),     // w = 1.0: keep as-is
    ("de", 0, 26214)) // w ≈ 0.4: downsample
  private val MIX_DEFAULT = (0, 13107) // w ≈ 0.2 for unlisted sources

  private def qMixEpochs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val whole = MIX.foldLeft(when(lit(false), lit(0))) {
      case (acc, (v, w, _)) => acc.when($"lang" === v, lit(w))
    }.otherwise(lit(MIX_DEFAULT._1))
    val frac = MIX.foldLeft(when(lit(false), lit(0))) {
      case (acc, (v, _, f)) => acc.when($"lang" === v, lit(f))
    }.otherwise(lit(MIX_DEFAULT._2))
    documents(s, d)
      .withColumn("__whole", whole).withColumn("__frac", frac)
      // greatest(…, 1): Spark's sequence(1, 0) DESCENDS to [1, 0]
      // rather than producing an empty array — the keep predicate then
      // drops the phantom copies of weight-0 strata
      .withColumn("copy",
        explode(sequence(lit(1), greatest($"__whole" +
          when($"__frac" > 0, 1).otherwise(0), lit(1)))))
      .filter($"copy" <= $"__whole" ||
        ($"copy" === $"__whole" + 1 && hashBucket16($"doc_id") < $"__frac"))
      .select($"doc_id", $"lang", $"copy".cast("long").as("copy"))
  }
  private val qMixEpochsSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    val wholeCase = MIX.map { case (v, w, _) => s"WHEN '$v' THEN $w" }
      .mkString("CASE lang ", " ", s" ELSE ${MIX_DEFAULT._1} END")
    val fracCase = MIX.map { case (v, _, f) => s"WHEN '$v' THEN $f" }
      .mkString("CASE lang ", " ", s" ELSE ${MIX_DEFAULT._2} END")
    s"""SELECT doc_id, lang, copy
      |FROM (
      |  SELECT doc_id, lang, whole, frac, bucket,
      |         unnest(generate_series(1, greatest(
      |           whole + CASE WHEN frac > 0 THEN 1 ELSE 0 END, 1))) AS copy
      |  FROM (SELECT doc_id, lang,
      |          $wholeCase AS whole,
      |          $fracCase AS frac,
      |          $bucket AS bucket
      |        FROM documents))
      |WHERE copy <= whole OR (copy = whole + 1 AND bucket < frac)""".stripMargin
  }

  // ------------------------------------------------------ q_corpus_shuffle
  /** Deterministic pre-training corpus shuffle: every document gets a
    * pseudorandom SHARD and a position within it — the global
    * shuffle-then-shard step between curation and tokenization that
    * breaks source/crawl-order locality before sequence packing.
    * Seeded md5 keys make the permutation reproducible across runs,
    * retries, AND engines (the oracle recomputes the identical key),
    * unlike `rand()`-based shuffles which are neither replayable nor
    * resumable.
    *
    * Scale shape: ONE hash shuffle on `shard` + a within-shard sort —
    * at 100 TB, shards are sized to executor memory (thousands of
    * shards), each sorted independently; no global sort, no driver
    * state. The window is partitioned by shard, so there is no
    * single-partition WindowExec hazard. */
  private val SHUFFLE_SHARDS = 16
  private val SHUFFLE_SEED = 42

  private def qCorpusShuffle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    documents(s, d)
      .withColumn("__key",
        md5(concat($"doc_id".cast("string"), lit(s"#$SHUFFLE_SEED"))))
      .withColumn("shard",
        (conv(substring($"__key", 1, 4), 16, 10).cast("long")
          % SHUFFLE_SHARDS).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy($"shard").orderBy($"__key", $"doc_id"))
        .cast("long"))
      .select($"doc_id", $"shard", $"pos")
  }
  private val qCorpusShuffleSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(key, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH k AS (
      |  SELECT doc_id, md5(doc_id::VARCHAR || '#$SHUFFLE_SEED') AS key
      |  FROM documents)
      |SELECT doc_id, ($bucket) % $SHUFFLE_SHARDS AS shard,
      |       row_number() OVER (PARTITION BY ($bucket) % $SHUFFLE_SHARDS
      |                          ORDER BY key, doc_id) AS pos
      |FROM k""".stripMargin
  }

  // ------------------------------------------------------ q_shard_manifest
  /** Export MANIFEST for the shuffled shards: per shard, the row count,
    * total characters, and an ORDER-INDEPENDENT content checksum — what
    * a training job verifies before consuming a snapshot ("did every
    * shard land, fully, with the bytes curation emitted?"). The
    * checksum is the SUM over documents of a 32-bit md5 prefix of
    * `doc_id|text`, so it is insensitive to row order / partitioning /
    * retry timing (a concatenation hash would not be), mergeable across
    * writers, and incrementally adjustable (a replaced doc subtracts
    * its old term and adds the new one). 32-bit terms keep the running
    * BIGINT sum overflow-free up to ~2³¹ docs per shard — beyond any
    * sane shard sizing.
    *
    * Scale shape: rides the same single `shard` hash-shuffle as
    * [[qCorpusShuffle]] (same seeded assignment, so the manifest
    * DESCRIBES those shards); per-shard aggregation is map-side
    * partial. One scan, no sort. */
  private def qShardManifest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .withColumn("shard",
        (conv(substring(md5(concat($"doc_id".cast("string"),
          lit(s"#$SHUFFLE_SEED"))), 1, 4), 16, 10).cast("long")
          % SHUFFLE_SHARDS).cast("long"))
      .withColumn("h",
        conv(substring(md5(concat($"doc_id".cast("string"), lit("|"), $"text")),
          1, 8), 16, 10).cast("long"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
        sum($"h").as("checksum"))
  }
  private val qShardManifestSql = {
    def hex(col: String, n: Int) = (1 to n).map(i =>
      s"(strpos('0123456789abcdef', substring($col, $i, 1)) - 1) * ${java.lang.Long.parseLong("1" + "0" * (n - i), 16)}")
      .mkString(" + ")
    s"""WITH k AS (
      |  SELECT doc_id, n_chars,
      |    md5(doc_id::VARCHAR || '#$SHUFFLE_SEED') AS skey,
      |    md5(doc_id::VARCHAR || '|' || text) AS ckey
      |  FROM documents),
      |h AS (SELECT (${hex("skey", 4)}) % $SHUFFLE_SHARDS AS shard,
      |             n_chars, ${hex("ckey", 8)} AS hv
      |      FROM k)
      |SELECT shard, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(hv) AS BIGINT) AS checksum
      |FROM h GROUP BY shard""".stripMargin
  }

  // -------------------------------------------------- q_temperature_sample
  /** Temperature-scaled multilingual rebalance (the XLM-R/mT5 α-sampling
    * rule, recast as a deterministic FILTER): with per-language corpus
    * shares p_l, training should sample languages ∝ p_l^α (α < 1 damps
    * the head, lifts the tail). Downsampling-only, that means language
    * l keeps rate (p_min/p_l)^(1-α) — the rarest language keeps 100%
    * and every larger one keeps proportionally less. α is fixed at 0.5
    * so the rate is a single `sqrt` (correctly-rounded IEEE in every
    * engine — the exponent is config, the determinism argument needs α
    * to stay a closed form both engines compute identically).
    *
    * Scale shape: one tiny groupBy builds the per-language count table
    * (≤ #languages rows), the keep thresholds broadcast back, and the
    * corpus pass is a shuffle-free per-row hash filter riding the scan
    * — rebalancing 100 TB is one read-and-drop pass. Thresholds are
    * integers out of 65536 over the same md5 bucket as
    * [[stratifiedSample]], so the sampled row SET is deterministic per
    * row (retry/cluster-size independent) and exactly reproduced by
    * the oracle. */
  private def qTemperatureSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("c"))
    val cmin = counts.agg(min($"c").as("c_min"))
    val thr = counts.crossJoin(cmin).select($"lang",
      floor(lit(65536.0) * sqrt($"c_min".cast("double") / $"c"))
        .cast("long").as("thr"))
    docs.join(broadcast(thr), "lang")
      .filter(hashBucket16($"doc_id") < $"thr")
      .select($"doc_id", $"lang", $"thr")
  }
  private val qTemperatureSampleSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
      |m AS (SELECT min(c) AS c_min FROM c),
      |thr AS (
      |  SELECT lang,
      |         CAST(floor(65536.0 * sqrt(CAST(c_min AS DOUBLE) / c)) AS BIGINT)
      |           AS thr
      |  FROM c, m)
      |SELECT d.doc_id, d.lang, thr.thr
      |FROM documents d JOIN thr USING (lang)
      |WHERE ($bucket) < thr.thr""".stripMargin
  }

  // ---------------------------------------------------- q_weighted_sample
  /** Weighted sampling without replacement, deterministically — the
    * Efraimidis–Spirakis A-ES scheme with the randomness replaced by
    * the md5 bucket: each document draws u = (bucket16 + 0.5)/65536 ∈
    * (0,1) and competes on key = −ln(u)/w (w = n_chars, so longer
    * documents are proportionally likelier); the K smallest keys per
    * language win. This is the size-biased per-source quota draw of
    * training-mix construction (pick K docs per language, weighted by
    * length) — as a REPRODUCIBLE operator: same winners on every run,
    * retry, cluster size, and engine.
    *
    * Scale shape: per-row key computation rides the scan; selection is
    * one window partitioned by language (no single-partition hazard —
    * cardinality = #languages × docs, partitioned by lang; for a
    * global top-K over a huge stratum, the two-phase per-partition
    * pre-top-K of SkewOps.twoPhaseTopK composes in front). Rank flips
    * would need two keys within ~1e-15 relative — impossible here
    * with distinct (bucket, weight) pairs, and doc_id breaks exact
    * ties. */
  private val WS_K = 20

  private def qWeightedSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    documents(s, d)
      .withColumn("u", (hashBucket16($"doc_id") + lit(0.5)) / lit(65536.0))
      .withColumn("k", -log($"u") / $"n_chars".cast("double"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"lang").orderBy($"k".asc, $"doc_id".asc))
        .cast("long"))
      .filter($"rank" <= WS_K)
      .select($"doc_id", $"lang", $"rank")
  }
  private val qWeightedSampleSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH keyed AS (
      |  SELECT doc_id, lang,
      |         -ln((($bucket) + 0.5) / 65536.0) / CAST(n_chars AS DOUBLE) AS k
      |  FROM documents)
      |SELECT doc_id, lang, rank FROM (
      |  SELECT doc_id, lang,
      |         row_number() OVER (PARTITION BY lang ORDER BY k ASC, doc_id ASC)
      |           AS rank
      |  FROM keyed)
      |WHERE rank <= $WS_K""".stripMargin
  }

  // --------------------------------------------------- q_curriculum_order
  /** CURRICULUM ordering: assign every document a strict global
    * training position that is easy→hard ACROSS stages and seeded-
    * shuffled WITHIN each stage — the data-ordering step of curriculum
    * learning (Bengio et al. 2009). Difficulty here is document length
    * bucketed by frozen thresholds (the score is pluggable config —
    * e.g. [[graft.llm.CorpusQuality]]'s LM perplexity in a real mix);
    * within a stage, order is the seeded md5 permutation of
    * [[qCorpusShuffle]] so each stage is still i.i.d.-shuffled.
    *
    * The global index is equivalent to `row_number() OVER (ORDER BY
    * stage, shard, key, doc_id)` — but computed WITHOUT a global sort
    * or single-partition window: rows rank inside (stage, md5-shard)
    * window partitions (|stages|·|shards| of them, each a bounded
    * slice of the corpus), and each partition's absolute offset comes
    * from one tiny (stage, shard) count aggregate, cumulated on ≤
    * |stages|·|shards| rows and broadcast back. Two shuffles of the
    * corpus ((stage, shard) hash + window sort) at ANY scale; the
    * oracle verifies the distributed rank against the literal global
    * row_number, pinning the equivalence. */
  private val CURR_THRESHOLDS = Seq(150L, 250L, 400L) // n_chars stage edges

  private def qCurriculumOrder(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val stageExpr = CURR_THRESHOLDS.zipWithIndex
      .foldRight(lit(CURR_THRESHOLDS.size.toLong)) { case ((t, i), e) =>
        when($"n_chars" < t, i.toLong).otherwise(e)
      }
    val keyed = documents(s, d)
      .withColumn("stage", stageExpr)
      .withColumn("key",
        md5(concat($"doc_id".cast("string"), lit(s"#$SHUFFLE_SEED"))))
      .withColumn("shard",
        (conv(substring($"key", 1, 4), 16, 10).cast("long")
          % SHUFFLE_SHARDS).cast("long"))
    val wPart = Window.partitionBy($"stage", $"shard")
      .orderBy($"key", $"doc_id")
    // tiny offset table: cumulative count of all (stage, shard) groups
    // strictly before this one in (stage, shard) order
    val wOff = Window.orderBy($"stage", $"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy($"stage", $"shard")
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum($"n").over(wOff), lit(0L)))
      .select($"stage", $"shard", $"off")
    keyed
      .withColumn("pos", row_number().over(wPart).cast("long"))
      .join(broadcast(offsets), Seq("stage", "shard"))
      .select($"doc_id", $"stage", ($"off" + $"pos").as("order_idx"))
  }
  private val qCurriculumOrderSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(key, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    val stage = CURR_THRESHOLDS.zipWithIndex.map { case (t, i) =>
      s"WHEN n_chars < $t THEN $i"
    }.mkString("CASE ", " ", s" ELSE ${CURR_THRESHOLDS.size} END")
    s"""WITH k AS (
      |  SELECT doc_id, CAST($stage AS BIGINT) AS stage,
      |    md5(doc_id::VARCHAR || '#$SHUFFLE_SEED') AS key
      |  FROM documents)
      |SELECT doc_id, stage,
      |  row_number() OVER (ORDER BY stage, ($bucket) % $SHUFFLE_SHARDS,
      |                     key, doc_id) AS order_idx
      |FROM k""".stripMargin
  }

  // ------------------------------------------------------- q_data_split
  /** Deterministic train/val/test assignment (80/10/10): the split is a
    * pure function of md5(doc_id), so a document lands in the SAME
    * split on every rerun, retry, cluster size, and engine — the
    * property that makes eval splits leakage-proof under reprocessing
    * (a random() split re-deals documents across the boundary every
    * run, silently contaminating eval). Per-row expression riding the
    * scan: no shuffle, no state, exact thresholds out of 65536
    * (52429 ≈ 80%, 58982 ≈ 90% cumulative). The audit `bucket` column
    * makes threshold placement reviewable. */
  val SPLIT_TRAIN = 52429
  val SPLIT_VAL = 58982
  /** The q_data_split assignment as a reusable per-row expression (the
    * leakage audit joins it onto near-dup pairs). */
  def splitOf(id: Column): Column =
    when(hashBucket16(id) < SPLIT_TRAIN, "train")
      .when(hashBucket16(id) < SPLIT_VAL, "val")
      .otherwise("test")
  /** The identical assignment in DuckDB SQL, parameterized on the id
    * column expression. */
  def splitOfSql(idExpr: String): String = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5(($idExpr)::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""CASE WHEN ($bucket) < $SPLIT_TRAIN THEN 'train'
       |     WHEN ($bucket) < $SPLIT_VAL THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }
  private def qDataSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .withColumn("bucket", hashBucket16($"doc_id"))
      .select($"doc_id", $"lang", $"source", $"bucket",
        when($"bucket" < SPLIT_TRAIN, "train")
          .when($"bucket" < SPLIT_VAL, "val")
          .otherwise("test").as("split"))
  }
  private val qDataSplitSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""SELECT doc_id, lang, source, bucket,
      |  CASE WHEN bucket < $SPLIT_TRAIN THEN 'train'
      |       WHEN bucket < $SPLIT_VAL THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang, source, CAST($bucket AS BIGINT) AS bucket
      |      FROM documents)""".stripMargin
  }

  // ------------------------------------------------------ q_source_cap
  /** Per-source document cap — the "domain cap" rule crawl pipelines
    * apply before any quality filtering (no single host may contribute
    * more than K documents, or boilerplate-heavy domains dominate the
    * mix): rank each source's documents by quality (n_chars desc,
    * doc_id tiebreak) and keep the top [[CAP_K]]. One window shuffle
    * partitioned by source — millions of small groups at 100 TB, the
    * scalable direction — emitting every doc with its rank and keep
    * flag so the drop set is auditable. */
  private val CAP_K = 15
  private def qSourceCap(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    documents(s, d).select($"doc_id", $"source", $"n_chars")
      .withColumn("rnk", row_number().over(Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id".asc)).cast("long"))
      .select($"doc_id", $"source", $"rnk", ($"rnk" <= CAP_K).as("kept"))
  }
  private val qSourceCapSql =
    s"""SELECT doc_id, source, rnk, rnk <= $CAP_K AS kept
      |FROM (SELECT doc_id, source,
      |        CAST(row_number() OVER (PARTITION BY source
      |          ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk
      |      FROM documents)""".stripMargin

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_stratified_sample"  -> (qStratifiedSample _),
    "q_mix_epochs"         -> (qMixEpochs _),
    "q_corpus_shuffle"     -> (qCorpusShuffle _),
    "q_shard_manifest"     -> (qShardManifest _),
    "q_temperature_sample" -> (qTemperatureSample _),
    "q_weighted_sample"    -> (qWeightedSample _),
    "q_curriculum_order"   -> (qCurriculumOrder _),
    "q_data_split"         -> (qDataSplit _),
    "q_source_cap"         -> (qSourceCap _))

  override def oracles: Seq[(String, String)] = Seq(
    "q_stratified_sample"  -> qStratifiedSampleSql,
    "q_mix_epochs"         -> qMixEpochsSql,
    "q_corpus_shuffle"     -> qCorpusShuffleSql,
    "q_shard_manifest"     -> qShardManifestSql,
    "q_temperature_sample" -> qTemperatureSampleSql,
    "q_weighted_sample"    -> qWeightedSampleSql,
    "q_curriculum_order"   -> qCurriculumOrderSql,
    "q_data_split"         -> qDataSplitSql,
    "q_source_cap"         -> qSourceCapSql)
}
