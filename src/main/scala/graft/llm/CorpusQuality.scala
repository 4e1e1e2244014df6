package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Corpus-level quality operators for LLM training-data curation — the
  * filters that sit between raw crawl and tokenizer in every published
  * pipeline (Gopher/MassiveText repetition rules, C4-style boilerplate
  * removal, benchmark decontamination):
  *
  *   - [[qGopherQuality q_gopher_quality]]: per-document repetition
  *     signals (duplicate-token fraction, most-frequent-token fraction,
  *     top-bigram fraction) + a composite keep flag. Pure per-row
  *     higher-order-function expressions: shuffle-free, codegen-riding,
  *     linear in input — the ideal 100 TB shape.
  *   - [[qBoilerplateNgrams q_boilerplate_ngrams]]: CORPUS-level
  *     duplicated-phrase detection — a word 5-gram appearing in many
  *     documents is boilerplate (headers, licenses, templates); each
  *     document reports what fraction of its 5-grams are shared. Shape:
  *     explode → distinct → count-per-gram → equi-join back. The gram
  *     hash is a high-cardinality shuffle key, so the plan is two hash
  *     aggregations + one shuffled equi-join — never all-pairs, and the
  *     gram-frequency side can be re-used across curation runs.
  *   - [[qDecontaminate q_decontaminate]]: benchmark decontamination —
  *     flag training documents sharing any word 8-gram with a held-out
  *     evaluation set (the n-gram-overlap rule GPT-3/PaLM/Llama report).
  *     The eval side aggregates to a distinct-gram set that is tiny
  *     relative to the corpus — broadcast-eligible at any training
  *     scale, so the corpus-side scan stays a map-side semi-join probe.
  *
  * Determinism: all counts are exact integers; fractions are single
  * IEEE divisions of identical integers on both engines.
  */
object CorpusQuality extends QueryModule {
  import Tables._

  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("t", split(lower(col("text")), " "))

  // -------------------------------------------------- q_gopher_quality
  private val MIN_TOKENS = 10L
  private val MAX_TOKENS = 100000L
  private val MAX_TOP_TOKEN_FRAC = 0.20
  private val MAX_DUP_TOKEN_FRAC = 0.60

  /** Count of the most frequent element = longest equal run of the
    * SORTED array: one O(n log n) sort + one linear fold per row,
    * replacing the O(n·distinct) count-per-distinct formulation that
    * dominated this operator's bench time (5.9s → sub-second at sf0.1;
    * the DuckDB oracle keeps the quadratic formulation — same values,
    * and the oracle is a correctness tool, not a hot path). */
  private def maxRunCnt(arr: String) = expr(
    s"""aggregate(array_sort($arr),
       |  named_struct('prev', CAST(NULL AS STRING),
       |               'run', CAST(0 AS INT), 'best', CAST(0 AS INT)),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(x <=> acc.prev, acc.run + 1, 1),
       |    'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),
       |  acc -> acc.best)""".stripMargin)

  private def qGopherQuality(s: SparkSession, d: String): DataFrame = {
    val nTokens = size(col("t")).cast("long")
    val topTokenCnt = maxRunCnt("t")
    // most frequent word bigram (guarded: <2 tokens has no bigram)
    val bigrams = expr(
      "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")
    val topBigramCnt = maxRunCnt("bg")
    val base = withTokens(documents(s, d))
      .withColumn("n_tokens", nTokens)
      .withColumn("top_token_frac", topTokenCnt / col("n_tokens"))
      .withColumn("dup_token_frac",
        (col("n_tokens") - size(array_distinct(col("t")))) / col("n_tokens"))
      .withColumn("bg", when(col("n_tokens") >= 2, bigrams))
      .withColumn("top_bigram_frac",
        when(col("n_tokens") >= 2, topBigramCnt / (col("n_tokens") - 1)))
    base.select(
      col("doc_id"), col("n_tokens"), col("top_token_frac"),
      col("dup_token_frac"), col("top_bigram_frac"),
      (col("n_tokens").between(MIN_TOKENS, MAX_TOKENS) &&
        col("top_token_frac") < MAX_TOP_TOKEN_FRAC &&
        col("dup_token_frac") < MAX_DUP_TOKEN_FRAC).as("keep"))
  }
  private val qGopherQualitySql =
    s"""SELECT doc_id,
      |  len(t) AS n_tokens,
      |  list_max(list_transform(list_distinct(t),
      |    x -> len(list_filter(t, y -> y = x)))) / len(t) AS top_token_frac,
      |  (len(t) - len(list_distinct(t))) / len(t) AS dup_token_frac,
      |  CASE WHEN len(t) >= 2 THEN
      |    list_max(list_transform(list_distinct(bg),
      |      x -> len(list_filter(bg, y -> y = x)))) / (len(t) - 1)
      |  END AS top_bigram_frac,
      |  (len(t) BETWEEN $MIN_TOKENS AND $MAX_TOKENS
      |   AND list_max(list_transform(list_distinct(t),
      |         x -> len(list_filter(t, y -> y = x)))) / len(t) < $MAX_TOP_TOKEN_FRAC
      |   AND (len(t) - len(list_distinct(t))) / len(t) < $MAX_DUP_TOKEN_FRAC)
      |    AS keep
      |FROM (SELECT doc_id, t,
      |        CASE WHEN len(t) >= 2 THEN
      |          list_transform(generate_series(1, len(t) - 1),
      |            i -> concat(t[i], ' ', t[i + 1]))
      |        END AS bg
      |      FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
      |            FROM documents))""".stripMargin

  // ---------------------------------------------- q_boilerplate_ngrams
  private val NGRAM = 5
  private val SHARED_DOCS = 5L

  /** Per-document boilerplate fraction: distinct word 5-grams joined
    * against corpus-wide gram document-frequencies. */
  private def qBoilerplateNgrams(s: SparkSession, d: String): DataFrame = {
    val grams = withTokens(documents(s, d))
      .filter(size(col("t")) >= NGRAM)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(t) - ${NGRAM - 1}), " +
          s"i -> concat_ws(' ', slice(t, i, $NGRAM))))")).as("gram"))
    val gramDf = grams.groupBy("gram")
      .agg(count(lit(1)).cast("long").as("gram_docs"))
    grams.join(gramDf, "gram")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("gram_docs") >= SHARED_DOCS, 1L).otherwise(0L))
          .as("n_shared_grams"))
      .withColumn("boilerplate_frac", col("n_shared_grams") / col("n_grams"))
  }
  private val qBoilerplateNgramsSql =
    s"""WITH grams AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(list_slice(t, i, i + ${NGRAM - 1}), ' ') AS gram
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
      |        FROM documents WHERE len(string_split(lower(text), ' ')) >= $NGRAM),
      |       unnest(generate_series(1, len(t) - ${NGRAM - 1})) AS s(i)),
      |freq AS (SELECT gram, count(*) AS gram_docs FROM grams GROUP BY gram)
      |SELECT g.doc_id,
      |  count(*) AS n_grams,
      |  -- CAST: DuckDB sum(int) returns HUGEINT, Spark sum(long) BIGINT
      |  CAST(sum(CASE WHEN f.gram_docs >= $SHARED_DOCS THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_shared_grams,
      |  CAST(sum(CASE WHEN f.gram_docs >= $SHARED_DOCS THEN 1 ELSE 0 END) AS BIGINT)
      |    / count(*) AS boilerplate_frac
      |FROM grams g JOIN freq f ON f.gram = g.gram
      |GROUP BY g.doc_id""".stripMargin

  // -------------------------------------------------- q_decontaminate
  private val EVAL_MOD = 41
  private val DECON_N = 8

  /** Benchmark decontamination: training docs sharing any word 8-gram
    * with the (deterministic pseudo) eval split. Output: every training
    * doc with its shared-gram count + contaminated flag, so the result
    * is stable whether or not contamination exists. */
  private def deconGrams(df: DataFrame): DataFrame = withTokens(df)
    .filter(size(col("t")) >= DECON_N)
    .select(col("doc_id"), explode(expr(
      s"array_distinct(transform(sequence(1, size(t) - ${DECON_N - 1}), " +
        s"i -> concat_ws(' ', slice(t, i, $DECON_N))))")).as("gram"))
  private def deconIsEval: Column = col("doc_id") % EVAL_MOD === 0

  /** Shared tail of both decontamination formulations: per-train-doc
    * shared-gram counts → flagged full train-doc list. */
  private def deconReport(
      docs: DataFrame, trainGrams: DataFrame, evalGrams: DataFrame): DataFrame = {
    val overlap = trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_shared_grams"))
    docs.filter(!deconIsEval).select(col("doc_id"))
      .join(overlap, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared_grams"), lit(0L)) > 0L).as("contaminated"))
  }

  private def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val evalGrams = deconGrams(docs.filter(deconIsEval))
      .select(col("gram")).distinct()
    val trainGrams = deconGrams(docs.filter(!deconIsEval))
    deconReport(docs, trainGrams, evalGrams)
  }

  // -------------------------------------------- q_decontaminate_bloom
  /** The SCALE path of [[qDecontaminate q_decontaminate]]: a bloom
    * filter built over the eval split's distinct 8-grams broadcasts to
    * the train-side scan, and only might-contain survivors enter the
    * exact verification join — identical output (the verify join
    * removes bloom false positives), same oracle.
    *
    * Why it matters at 100 TB: the exact formulation ships EVERY train
    * gram (corpus × ~doc-length rows) into the dedup/join machinery.
    * The bloom is a few MB regardless of eval-set string size
    * (vs broadcasting the gram strings themselves), evaluates per-row
    * at the scan with no shuffle, and drops effectively the whole train
    * side before any exchange — the standard Bloom-join
    * (filter-then-join) pattern, here with the eval set as the build
    * side. Sizing comes from one count of the (small) eval side; fpp
    * 1 % keeps the verify join's survivor set within ~1 % of the true
    * overlap. */
  private def qDecontaminateBloom(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val evalGrams = deconGrams(docs.filter(deconIsEval))
      .select(col("gram")).distinct()
    // one bounded action on the SMALL side sizes the filter; the bloom
    // aggregation itself is a single pass over eval grams
    val nEval = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("gram", nEval, 0.01)
    val bloomB = s.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomB.value.mightContainString(g))
    val trainGrams = deconGrams(docs.filter(!deconIsEval))
      .filter(mightContain(col("gram")))
    deconReport(docs, trainGrams, evalGrams)
  }
  private val qDecontaminateSql =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(list_slice(t, i, i + ${DECON_N - 1}), ' ') AS gram
      |  FROM (SELECT * FROM toks WHERE len(t) >= $DECON_N),
      |       unnest(generate_series(1, len(t) - ${DECON_N - 1})) AS s(i)),
      |eval_grams AS (
      |  SELECT DISTINCT gram FROM grams WHERE doc_id % $EVAL_MOD = 0),
      |overlap AS (
      |  SELECT g.doc_id, count(*) AS n_shared_grams
      |  FROM grams g JOIN eval_grams e ON e.gram = g.gram
      |  WHERE g.doc_id % $EVAL_MOD <> 0
      |  GROUP BY g.doc_id)
      |SELECT d.doc_id,
      |  coalesce(o.n_shared_grams, 0) AS n_shared_grams,
      |  coalesce(o.n_shared_grams, 0) > 0 AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % $EVAL_MOD <> 0) d
      |LEFT JOIN overlap o ON o.doc_id = d.doc_id""".stripMargin

  // --------------------------------------------------- q_lm_perplexity
  /** CCNet-style unigram language-model scoring — the MODEL-based
    * quality filter that complements the rule-based Gopher gate: train
    * a unigram LM on the corpus itself (token → count, one groupBy),
    * then score every document by its mean negative log-likelihood
    * `nll = -Σ tf·ln(c/N) / Σ tf`. CCNet buckets crawl text into
    * head/middle/tail by exactly this statistic (wiki-LM perplexity);
    * here the LM is the corpus's own unigram distribution so the
    * operator is self-contained and every token is in-vocabulary (no
    * smoothing constant to tune).
    *
    * 100 TB shape: explode → (doc, token) tf aggregate (map-side
    * partials collapse repeated tokens before the shuffle) → equi-join
    * on token against the vocab aggregate (vocab rows ≪ corpus rows;
    * the join key is high-cardinality and skew-free after lowercasing)
    * → per-doc re-aggregate. Three hash aggregations + one shuffled
    * equi-join, never all-pairs; the vocab side is reusable across
    * curation runs exactly like the boilerplate gram-frequency table.
    *
    * Determinism: counts are exact integers; `c/N` is one IEEE
    * division of identical integers; both engines' `ln` is
    * correctly-rounded libm on the same doubles; the final mean is
    * rounded to 4dp to absorb summation-order ulps (the established
    * double-aggregate grid, see Relational q15). */
  private def qLmPerplexity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = withTokens(documents(s, d))
      .select($"doc_id", explode($"t").as("tok"))
      .filter(length($"tok") > 0)
    val tf = toks.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy($"tok").agg(sum($"tf").as("c"))
    val total = vocab.agg(sum($"c").as("n_total"))
    tf.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .groupBy($"doc_id")
      .agg(
        sum($"tf").as("n_tok"),
        round(-sum($"tf" * log($"c" / $"n_total")) / sum($"tf"), 4).as("nll"))
      .select($"doc_id", $"n_tok", $"nll")
  }
  private val qLmPerplexitySql =
    """WITH toks AS (
      |  SELECT doc_id, tok
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents)
      |  WHERE length(tok) > 0),
      |tf AS (
      |  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |vocab AS (
      |  SELECT tok, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY tok),
      |total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vocab)
      |SELECT tf.doc_id,
      |  CAST(sum(tf.tf) AS BIGINT) AS n_tok,
      |  round(-sum(tf.tf * ln(vocab.c / total.n_total)) / sum(tf.tf), 4)
      |    AS nll
      |FROM tf JOIN vocab USING (tok), total
      |GROUP BY tf.doc_id""".stripMargin

  // ------------------------------------------------------- q_pii_scrub
  /** Pattern-based redaction — the PII-scrub pass every released-data
    * pipeline runs before training. Three RE2-safe rule tiers applied
    * in a fixed order (emails → long digit runs → denylisted terms),
    * each counted on the ORIGINAL text and masked in the running
    * result. Pure per-row regex work: shuffle-free, codegen-riding,
    * linear — and the patterns are dialect-portable (no backrefs or
    * lookarounds), so Java regex (Spark) and RE2 (DuckDB) agree
    * byte-for-byte. On this synthetic corpus the email/number tiers
    * fire rarely; the denylist tier fires constantly — the operator's
    * plumbing is what's under test, the rule list is user config. */
  private val EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val NUM_RE = "\\d{4,}"
  private val TERM_RE = "\\b(customer|vector)\\b"

  private def qPiiScrub(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EMAIL_RE), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(NUM_RE), lit(0)))
        .cast("long").as("n_number"),
      size(regexp_extract_all(col("text"), lit(TERM_RE), lit(0)))
        .cast("long").as("n_term"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EMAIL_RE, "[EMAIL]"),
          NUM_RE, "[NUM]"),
        TERM_RE, "[TERM]").as("clean_text"))
  private val qPiiScrubSql =
    s"""SELECT doc_id,
      |  len(regexp_extract_all(text, '$EMAIL_RE')) AS n_email,
      |  len(regexp_extract_all(text, '$NUM_RE')) AS n_number,
      |  len(regexp_extract_all(text, '$TERM_RE')) AS n_term,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(text, '$EMAIL_RE', '[EMAIL]', 'g'),
      |      '$NUM_RE', '[NUM]', 'g'),
      |    '$TERM_RE', '[TERM]', 'g') AS clean_text
      |FROM documents""".stripMargin

  // ---------------------------------------------------- q_dsir_weights
  /** DSIR-style data-selection scoring (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by the log importance weight
    * `log w(x) = Σ_features tf·[ln p_target(b) − ln p_raw(b)]` under
    * hashed-bigram bag-of-words models with Laplace smoothing. The
    * target distribution is fitted on the in-domain subset (here the
    * English documents — the "quality corpus" stand-in); the raw
    * distribution on the whole corpus. High-weight documents look like
    * the target and get kept/up-sampled during selection.
    *
    * Features are word bigrams hashed into a 2^16 bucket space via the
    * library's portable md5 bucket ([[graft.operators.Sampling
    * .hashBucket16]] — the DuckDB oracle recomputes it with hex-digit
    * arithmetic), so the "model" is two 65536-cell count vectors.
    *
    * 100 TB shape: one explode → two hash aggregations (per-bucket
    * corpus counts with a conditional target sum — ONE pass fits both
    * models; per-(doc,bucket) tf with map-side partials) → a broadcast
    * join of the ≤2^16-row weight table back onto the doc-side tf
    * stream → per-doc re-aggregate. The model table is corpus-level
    * metadata (≤65536 rows regardless of corpus size), reusable across
    * selection runs; the corpus side is never shuffled except by
    * doc_id.
    *
    * Determinism: counts are exact integers; each bucket's λ is
    * ln/division of identical integers (correctly-rounded libm on
    * identical doubles, the q_lm_perplexity precedent); the per-doc
    * sum is rounded to 4dp to absorb summation-order ulps. */
  private val DSIR_B = 65536L

  private def qDsirWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bg = withTokens(documents(s, d))
      .filter(size($"t") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        """transform(sequence(1, size(t)-1),
          |  i -> concat(element_at(t, i), ' ', element_at(t, i+1)))"""
          .stripMargin)).as("bg"))
      .withColumn("b", graft.operators.Sampling.hashBucket16($"bg"))
    val model = bg.groupBy($"b").agg(
        count(lit(1)).as("c_r"),
        sum(when($"lang" === "en", 1L).otherwise(0L)).as("c_t"))
    val totals = model.agg(sum($"c_r").as("r_tot"), sum($"c_t").as("t_tot"))
    val lam = model.crossJoin(broadcast(totals)).select($"b",
      (log(($"c_t" + 1L) / ($"t_tot" + DSIR_B)) -
        log(($"c_r" + 1L) / ($"r_tot" + DSIR_B))).as("lam"))
    val tf = bg.groupBy($"doc_id", $"b").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(lam), "b")
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_feat"),
        round(sum($"tf" * $"lam"), 4).as("log_w"))
      .select($"doc_id", $"n_feat", $"log_w")
  }
  private val qDsirWeightsSql = {
    val hex = (i: Int) =>
      s"(strpos('0123456789abcdef', substring(md5(bg), $i, 1)) - 1)"
    s"""WITH toks AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS t
      |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
      |bi AS (
      |  SELECT doc_id, lang, unnest(list_transform(
      |    generate_series(1, len(t)-1),
      |    i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM toks),
      |bh AS (
      |  SELECT doc_id, lang,
      |    ${hex(1)} * 4096 + ${hex(2)} * 256 + ${hex(3)} * 16 + ${hex(4)} AS b
      |  FROM bi),
      |model AS (
      |  SELECT b, count(*) AS c_r,
      |         coalesce(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 0) AS c_t
      |  FROM bh GROUP BY b),
      |tot AS (SELECT sum(c_r) AS r_tot, sum(c_t) AS t_tot FROM model),
      |lam AS (
      |  SELECT b, ln((c_t + 1) / (t_tot + $DSIR_B))
      |           - ln((c_r + 1) / (r_tot + $DSIR_B)) AS lam
      |  FROM model, tot),
      |tf AS (SELECT doc_id, b, count(*) AS tf FROM bh GROUP BY 1, 2)
      |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_feat,
      |       round(sum(tf.tf * lam.lam), 4) AS log_w
      |FROM tf JOIN lam USING (b) GROUP BY tf.doc_id""".stripMargin
  }

  // ----------------------------------------------- q_quality_classifier
  /** Trained quality classifier (the FineWeb-Edu / fastText-filter
    * shape): logistic regression over cheap per-document surface
    * features, fitted by DISTRIBUTED full-batch gradient descent —
    * each iteration is one whole-stage-codegen'd aggregation producing
    * a 4-long gradient, the driver applies the (tiny) weight update,
    * and the final pass scores every document. The label here is a
    * synthetic "substantive document" proxy (token count above a
    * cutoff) so the fixture is self-contained and the fit converges
    * (98% train accuracy); in production the label column comes from
    * human/LLM annotations and the machinery is unchanged.
    *
    * 100 TB shape: ONE corpus pass materializes the O(rows × 4-double)
    * feature table to scratch parquet; each of the 8 GD iterations and
    * the scoring pass then scan only that narrow table — map-side
    * partial sums into a 4-cell result, no wide shuffle anywhere. The
    * model state crossing the driver is 4 doubles per iteration.
    *
    * Cross-engine determinism (the interesting bit): a float sum over
    * a cluster is summation-order-dependent, so naive GD weights drift
    * between engines (and between runs!). Instead each row's gradient
    * contribution is QUANTIZED to an integer (`round(g·x·10^6)`), the
    * aggregation sums exact integers (order-free), and the weight
    * update divides the exact integer sum — both engines therefore
    * walk bit-identical weight trajectories, and the DuckDB oracle
    * replays the same 8 steps as an unrolled CTE chain. Per-row
    * agreement needs only that both engines' `exp` land the quantized
    * integer on the same side of a .5 boundary (drift ~1e-16 against a
    * quantum of 1e-6). The same trick makes retried/resized cluster
    * runs reproducible, not just cross-engine. */
  private val CLF_ITERS = 8
  private val CLF_LR = 1.0
  private val CLF_Q = 1000000L // integer-gradient quantization denominator
  private val CLF_CUT = 52L // label: "substantive" iff n_tokens > CLF_CUT

  /** Feature row: label y plus bias/centered token count/type-token
    * ratio/mean word length. Centering constants are corpus-stats
    * config (fixed here); every value is exact rational arithmetic on
    * integers, identical across engines. */
  private def clfFeatures(s: SparkSession, d: String): DataFrame =
    withTokens(documents(s, d)).select(
      col("doc_id"),
      when(size(col("t")) > CLF_CUT, 1.0).otherwise(0.0).as("y"),
      lit(1.0).as("x0"),
      ((size(col("t")).cast("double") - 52.0) / 10.0).as("x1"),
      ((size(array_distinct(col("t"))).cast("double") / size(col("t")) - 0.66) * 10.0)
        .as("x2"),
      (expr("aggregate(t, 0L, (a, w) -> a + length(w))").cast("double") /
        size(col("t")) - 4.4).as("x3"))

  private def clfDot(w: Array[Double]): Column =
    lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  private def clfSigmoid(w: Array[Double]): Column =
    lit(1.0) / (lit(1.0) + exp(-clfDot(w)))

  private def qQualityClassifier(s: SparkSession, d: String): DataFrame = {
    // one corpus pass → narrow scratch feature table (see Scaladoc)
    val featDir = graft.Scratch.dir("graft-clf").resolve("feat").toString
    clfFeatures(s, d).write.mode("overwrite").parquet(featDir)
    val feat = s.read.parquet(featDir)
    val n = feat.count()
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to CLF_ITERS) {
      val g = clfSigmoid(w) - col("y")
      val sums = feat.select((0 to 3).map(j =>
        sum(round(g * col(s"x$j") * CLF_Q).cast("long")).as(s"s$j")): _*).head()
      w = Array.tabulate(4)(j =>
        w(j) - CLF_LR * (sums.getLong(j).toDouble / CLF_Q) / n)
    }
    feat.select(
      col("doc_id"), col("y").cast("long").as("label"),
      round(clfSigmoid(w), 4).as("score"),
      (clfSigmoid(w) >= 0.5).as("pred"))
  }
  private val qQualityClassifierSql = {
    val dot = "w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3"
    val step = (1 to CLF_ITERS).map { i =>
      val g = (j: Int) =>
        s"sum(CAST(round((1.0/(1.0+exp(-($dot))) - f.y) * f.x$j * $CLF_Q.0) AS BIGINT)) AS s$j"
      s"""g$i AS (SELECT ${g(0)}, ${g(1)}, ${g(2)}, ${g(3)}
        |  FROM feat f, w${i - 1} w),
        |w$i AS (
        |  SELECT w.w0 - $CLF_LR * (CAST(g.s0 AS DOUBLE) / $CLF_Q.0) / n.n AS w0,
        |         w.w1 - $CLF_LR * (CAST(g.s1 AS DOUBLE) / $CLF_Q.0) / n.n AS w1,
        |         w.w2 - $CLF_LR * (CAST(g.s2 AS DOUBLE) / $CLF_Q.0) / n.n AS w2,
        |         w.w3 - $CLF_LR * (CAST(g.s3 AS DOUBLE) / $CLF_Q.0) / n.n AS w3
        |  FROM g$i g, w${i - 1} w, n)""".stripMargin
    }.mkString(",\n")
    s"""WITH feat AS (
      |  SELECT doc_id,
      |         CASE WHEN len(t) > $CLF_CUT THEN 1.0 ELSE 0.0 END AS y,
      |         1.0 AS x0,
      |         (CAST(len(t) AS DOUBLE) - 52.0) / 10.0 AS x1,
      |         (CAST(len(list_distinct(t)) AS DOUBLE) / len(t) - 0.66) * 10.0 AS x2,
      |         CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE)
      |           / len(t) - 4.4 AS x3
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents)),
      |n AS (SELECT count(*) AS n FROM feat),
      |w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
      |$step
      |SELECT f.doc_id, CAST(f.y AS BIGINT) AS label,
      |       round(1.0/(1.0+exp(-($dot))), 4) AS score,
      |       (1.0/(1.0+exp(-($dot))) >= 0.5) AS pred
      |FROM feat f, w$CLF_ITERS w""".stripMargin
  }

  // ----------------------------------------------------- q_bigram_lm
  /** Interpolated BIGRAM language-model scoring — the context-aware
    * upgrade of [[qLmPerplexity]]'s unigram filter: a document full of
    * common words in improbable ORDER (shuffled text, keyword stuffing,
    * bad OCR) scores fluent under a unigram LM but perplexing under a
    * bigram one. Per CCNet practice the LM is trained on the corpus
    * itself; Jeni-style fixed-weight interpolation with the unigram
    * distribution keeps unseen-in-context bigrams finite without a
    * tuned discount:
    *
    *   P(w | v) = λ·c(v,w)/c(v,·) + (1−λ)·c(w)/N ,  λ = 0.7
    *   nll(doc) = −Σ tf·ln P / Σ tf   over positions 2..n
    *
    * 100 TB shape: adjacent pairs come from a positional `transform`
    * over the per-doc token array — SHUFFLE-FREE pair generation,
    * no self-join, no lag window over exploded tokens — then three
    * hash aggregates (per-doc bigram tf, corpus bigram counts, corpus
    * unigram/context counts) and two equi-joins against model tables
    * that are vocabulary-, not corpus-, sized. Identical scan count to
    * the unigram row; the bigram model table is the one extra join.
    *
    * Determinism: all counts exact longs; `λ·(cb/cv) + (1−λ)·(c/N)` is
    * four IEEE ops on identical doubles; ln is correctly-rounded libm;
    * the per-doc mean rounds 4dp (the [[qLmPerplexity]] recipe).
    * Documents with < 2 non-empty tokens have no bigrams and drop out
    * in both engines (inner joins over the pair set). */
  private val BG_LAMBDA = 0.7

  /** Per-doc adjacent-pair frame (doc_id, prev, cur) — shuffle-free. */
  private def bigramPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withTokens(documents(s, d))
      .withColumn("ft", expr("filter(t, x -> length(x) > 0)"))
      .filter(size($"ft") >= 2)
      .select($"doc_id", explode(expr(
        """transform(sequence(1, size(ft) - 1),
          |  i -> named_struct('prev', element_at(ft, i),
          |                    'cur',  element_at(ft, i + 1)))""".stripMargin))
        .as("bg"))
      .select($"doc_id", $"bg.prev", $"bg.cur")
  }

  /** The trained bigram/unigram model tables, memoized to scratch
    * parquet per (session, sf dir) — the CCNet deployment shape: train
    * the LM over the corpus ONCE, score forever (the
    * [[graft.llm.TextOps]] BPE-merge-cache rationale). Without this
    * the scoring query re-derives the corpus-scale pair explode three
    * times per run (model counts, context counts, and the per-doc tf
    * side). Dir holds bigrams/(prev,cur,cb), ctx/(prev,cv),
    * uni/(tok,c), total/(n_total). */
  private val bgModelPaths =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  private def bigramModelDir(s: SparkSession, d: String): String =
    bgModelPaths.computeIfAbsent(
      // keyed on the session REFERENCE like every other fixture cache
      // (an identity hash can collide or be reused after GC — ADVICE r9)
      (s, d),
      _ => {
        import s.implicits._
        val dir = graft.Scratch.dir("graft-bigramlm").toString
        val bigrams = bigramPairs(s, d).groupBy($"prev", $"cur")
          .agg(count(lit(1)).as("cb"))
        bigrams.write.mode("overwrite").parquet(s"$dir/bigrams")
        val saved = s.read.parquet(s"$dir/bigrams")
        saved.groupBy($"prev").agg(sum($"cb").as("cv"))
          .write.mode("overwrite").parquet(s"$dir/ctx")
        // unigram model over ALL tokens (including each doc's last),
        // the exact vocabulary of qLmPerplexity
        val uni = withTokens(documents(s, d))
          .select(explode($"t").as("tok")).filter(length($"tok") > 0)
          .groupBy($"tok").agg(count(lit(1)).as("c"))
        uni.write.mode("overwrite").parquet(s"$dir/uni")
        s.read.parquet(s"$dir/uni").agg(sum($"c").as("n_total"))
          .write.mode("overwrite").parquet(s"$dir/total")
        dir
      })

  private def qBigramLm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = bigramModelDir(s, d)
    val bigrams = s.read.parquet(s"$m/bigrams")
    val ctx = s.read.parquet(s"$m/ctx")
    val uni = s.read.parquet(s"$m/uni")
    val total = s.read.parquet(s"$m/total")
    val tf = bigramPairs(s, d).groupBy($"doc_id", $"prev", $"cur")
      .agg(count(lit(1)).as("tf"))
    val p = lit(BG_LAMBDA) * ($"cb".cast("double") / $"cv") +
      lit(1.0 - BG_LAMBDA) * ($"c".cast("double") / $"n_total")
    tf.join(bigrams, Seq("prev", "cur"))
      .join(ctx, "prev")
      .join(uni.withColumnRenamed("tok", "cur"), "cur")
      .crossJoin(broadcast(total))
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_bigrams"),
        round(-sum($"tf" * log(p)) / sum($"tf"), 4).as("nll"))
      .select($"doc_id", $"n_bigrams", $"nll")
  }
  private val qBigramLmSql =
    s"""WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '),
      |                x -> length(x) > 0) AS t
      |  FROM documents),
      |pairs AS (
      |  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
      |  FROM (SELECT * FROM toks WHERE len(t) >= 2),
      |       unnest(generate_series(1, len(t) - 1)) AS s(i)),
      |tf AS (
      |  SELECT doc_id, prev, cur, count(*) AS tf FROM pairs GROUP BY 1, 2, 3),
      |bigrams AS (
      |  SELECT prev, cur, CAST(sum(tf) AS BIGINT) AS cb FROM tf GROUP BY 1, 2),
      |ctx AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cv FROM bigrams GROUP BY 1),
      |uni AS (
      |  SELECT tok, count(*) AS c
      |  FROM (SELECT unnest(t) AS tok FROM toks)
      |  GROUP BY tok),
      |total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM uni)
      |SELECT tf.doc_id,
      |  CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
      |  round(-sum(tf.tf * ln(
      |      $BG_LAMBDA * (CAST(cb AS DOUBLE) / cv)
      |      + ${1.0 - BG_LAMBDA} * (CAST(c AS DOUBLE) / n_total)))
      |    / sum(tf.tf), 4) AS nll
      |FROM tf
      |JOIN bigrams USING (prev, cur)
      |JOIN ctx USING (prev)
      |JOIN uni ON uni.tok = tf.cur, total
      |GROUP BY tf.doc_id""".stripMargin

  // ----------------------------------------------------- q_winsorize
  /** Per-group WINSORIZATION: clip each document's length feature to
    * its language's exact [P5, P95] band — the robust normalization
    * step in front of any score that mixes heavy-tailed features
    * (length, link density, perplexity); without it a single 100×
    * outlier drags a z-score or a GD classifier's gradient. Exact
    * order-statistic percentiles with the EXPLICIT rank rule (1-indexed
    * value at rank ⌈p·n⌉ under (value, doc_id) order), so the
    * thresholds are engine-portable integers — no interpolated
    * `percentile_cont` whose float midpoints differ by implementation.
    *
    * 100 TB shape: one hash shuffle on the group key serves both the
    * per-group rank window and the count; the ≤|groups|-row threshold
    * table broadcasts back onto a shuffle-free clip scan. Percentile
    * ranks use pure integer arithmetic (⌈p·n⌉ = (p·n + 99) div 100). */
  private def qWinsorize(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = documents(s, d).select($"doc_id", $"lang",
      $"n_chars".cast("long").as("x"))
    val w = Window.partitionBy($"lang").orderBy($"x", $"doc_id")
    val thr = docs
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"lang")))
      .withColumn("rk05", expr("(n * 5 + 99) div 100"))
      .withColumn("rk95", expr("(n * 95 + 99) div 100"))
      .groupBy($"lang")
      .agg(min(when($"rn" === $"rk05", $"x")).as("p05"),
        min(when($"rn" === $"rk95", $"x")).as("p95"))
    docs.join(broadcast(thr), "lang")
      .select($"doc_id", $"lang", $"x".as("n_chars"),
        least(greatest($"x", $"p05"), $"p95").as("w_chars"),
        ($"x" < $"p05" || $"x" > $"p95").as("clipped"))
  }
  private val qWinsorizeSql =
    """WITH docs AS (
      |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS x FROM documents),
      |r AS (
      |  SELECT lang, x,
      |    row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM docs),
      |thr AS (
      |  SELECT lang,
      |    min(CASE WHEN rn = (n * 5 + 99) // 100 THEN x END) AS p05,
      |    min(CASE WHEN rn = (n * 95 + 99) // 100 THEN x END) AS p95
      |  FROM r GROUP BY lang)
      |SELECT doc_id, docs.lang, x AS n_chars,
      |  least(greatest(x, p05), p95) AS w_chars,
      |  (x < p05 OR x > p95) AS clipped
      |FROM docs JOIN thr ON thr.lang = docs.lang""".stripMargin

  // -------------------------------------------------- q_score_calibrate
  /** Cross-source score calibration: a quality score is only comparable
    * across sources after rank-normalizing WITHIN each source (every
    * crawl's raw score distribution is shifted — C4-style global
    * thresholds systematically over-prune whole sources). Per doc: the
    * within-source percentile, the global percentile, and the
    * calibration shift between them — the quantity a mixing pipeline
    * thresholds on instead of the raw score.
    *
    * Exact integer arithmetic: percent_rank is (rank−1)·10⁶ div (n−1)
    * on tie-aware `rank()`, so no float folds anywhere. The global
    * rank/count come from [[graft.operators.RankOps.withGlobalOrder]]
    * — bucketed distributed sort, no single-partition window — and the
    * per-source windows stay exact: sources partition that shuffle. */
  private def qScoreCalibrate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val perSource = documents(s, d).select($"doc_id", $"source", $"n_chars")
      .withColumn("r",
        rank().over(Window.partitionBy($"source").orderBy($"n_chars".asc))
          .cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy($"source")))
    graft.operators.RankOps.withGlobalOrder(perSource,
        $"n_chars", ascending = true,
        rankCol = Some("rg"), countCol = Some("ng"))
      .select($"doc_id", $"source", $"n_chars",
        expr("(r - 1) * 1000000L div greatest(n - 1, 1)").as("src_pct_ppm"),
        expr("(rg - 1) * 1000000L div greatest(ng - 1, 1)").as("global_pct_ppm"),
        expr("""(r - 1) * 1000000L div greatest(n - 1, 1)
             | - (rg - 1) * 1000000L div greatest(ng - 1, 1)""".stripMargin)
          .as("shift_ppm"))
  }
  private val qScoreCalibrateSql =
    """WITH r AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(rank() OVER (PARTITION BY source ORDER BY n_chars ASC)
      |      AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n,
      |    CAST(rank() OVER (ORDER BY n_chars ASC) AS BIGINT) AS rg,
      |    CAST(count(*) OVER () AS BIGINT) AS ng
      |  FROM documents)
      |SELECT doc_id, source, n_chars,
      |  (r - 1) * 1000000 // greatest(n - 1, 1) AS src_pct_ppm,
      |  (rg - 1) * 1000000 // greatest(ng - 1, 1) AS global_pct_ppm,
      |  (r - 1) * 1000000 // greatest(n - 1, 1)
      |    - (rg - 1) * 1000000 // greatest(ng - 1, 1) AS shift_ppm
      |FROM r""".stripMargin

  // ---------------------------------------------------- q_source_mix_kl
  /** Source-mix audit: the corpus' source composition against the
    * declared target mix (uniform here — the config a mixing pipeline
    * would supply), as per-source shares and KL-divergence
    * contributions p·ln(p/q). This is the standing "is my training
    * mix drifting from spec" check that pairs with
    * [[graft.operators.Sampling]]'s temperature/mix-epoch CONSTRUCTORS
    * — they build the mix, this monitors it.
    *
    * Determinism: shares become integer ppm FIRST, and both engines
    * compute ln on the identical ppm-derived doubles (the
    * [[qLmPerplexity]] ln-parity precedent), rounded 6dp. Cost: one
    * hash aggregate to |sources| rows; everything after is
    * constant-sized. */
  private def qSourceMixKl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val by = documents(s, d).groupBy($"source")
      .agg(count(lit(1)).as("n_docs"))
    val tot = by.agg(sum($"n_docs").as("total"),
      count(lit(1)).as("k"))
    by.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        expr("(n_docs * 1000000) div total").as("share_ppm"),
        expr("1000000 div k").as("target_ppm"))
      .withColumn("kl_contrib", round(
        ($"share_ppm" / 1000000.0d) *
          log(($"share_ppm" / 1000000.0d) / ($"target_ppm" / 1000000.0d)),
        6))
  }
  private val qSourceMixKlSql =
    """WITH by AS (SELECT source, count(*) AS n_docs FROM documents
      |            GROUP BY 1),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
      |             count(*) AS k FROM by),
      |p AS (
      |  SELECT source, n_docs,
      |    CAST((n_docs * 1000000) // total AS BIGINT) AS share_ppm,
      |    CAST(1000000 // k AS BIGINT) AS target_ppm
      |  FROM by, t)
      |SELECT source, n_docs, share_ppm, target_ppm,
      |  round((share_ppm / 1000000.0)
      |    * ln((share_ppm / 1000000.0) / (target_ppm / 1000000.0)), 6)
      |    AS kl_contrib
      |FROM p""".stripMargin

  // --------------------------------------------------- q_dataset_card
  /** The one-row DATASET CARD — the summary block every released
    * corpus ships: document/source/language counts, total and mean
    * whitespace tokens, and the exact-duplicate count (docs minus
    * distinct md5(text)). One aggregate pass; the multi-DISTINCT
    * expand is the exactness trade — at 100 TB the HLL sketch row
    * (q_hll_distinct) supplies the cardinalities and this stays the
    * release-gate exact form. */
  private def qDatasetCard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct($"source").as("n_sources"),
        countDistinct($"lang").as("n_langs"),
        sum(size(split($"text", " ")).cast("long")).as("n_tokens"),
        countDistinct(md5($"text")).as("n_unique_texts"))
      .select($"n_docs", $"n_sources", $"n_langs", $"n_tokens",
        expr("n_tokens div n_docs").as("mean_tokens"),
        ($"n_docs" - $"n_unique_texts").as("n_exact_dups"))
  }
  private val qDatasetCardSql =
    """SELECT n_docs, n_sources, n_langs, n_tokens,
      |  n_tokens // n_docs AS mean_tokens,
      |  n_docs - n_unique_texts AS n_exact_dups
      |FROM (SELECT count(*) AS n_docs,
      |        count(DISTINCT source) AS n_sources,
      |        count(DISTINCT lang) AS n_langs,
      |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |        count(DISTINCT md5(text)) AS n_unique_texts
      |      FROM documents)""".stripMargin

  // ---------------------------------------------- q_dataset_card_incr
  /** The [[qDatasetCard]] release card MAINTAINED at O(Δ): additive
    * fields (doc count, token sum) live in one constant-key
    * [[graft.table.AggView]] over a CDF-tracked per-doc entry table;
    * each DISTINCT field (sources, langs, unique texts) rides its own
    * refcount→count chain (the [[graft.streaming.EventStateViews]]
    * DAU/WAU construction: the refcount view's group row exists iff
    * ≥ 1 supporting doc survives, so its own CDF feeds the count view
    * exact set inserts/deletes — a dup text's refcount churn surfaces
    * downstream as a cancelling (−1,+1) pair). The constant `k` column
    * is the grouping handle for the global rows (AggView groups are
    * never empty). Fixture churn: even docs seed, odd docs arrive, a
    * `doc_id % 13 = 4` slice is retroactively DELETED, one refresh per
    * level — the readout must hash-match the declarative card over the
    * surviving docs, through add AND subtract on both chain levels
    * (dropping a source's last doc must decrement n_sources; deleting
    * one copy of a duplicated text must shrink n_exact_dups but not
    * n_unique_texts). */
  private def qDatasetCardIncr(s: SparkSession, d: String): DataFrame = {
    import graft.table.{AggView, VersionedTable}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = graft.Scratch.dir("graft-cardv")
    val entrySchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("k", LongType),
      StructField("source", StringType),
      StructField("lang", StringType),
      StructField("h", StringType),
      StructField("n_tokens", LongType)))
    val t = VersionedTable.create(s, root.resolve("t").toString,
      entrySchema, Map(VersionedTable.PROP_CDF -> "true"))
    val all = documents(s, d).select(col("doc_id"), lit(0L).as("k"),
      col("source"), col("lang"), md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    t.append(all.filter(col("doc_id") % 2 === 0))
    val card = AggView.build(t, root.resolve("card").toString,
      Seq("k"), Seq("tokens" -> "n_tokens"))
    val refSrc = AggView.build(t, root.resolve("refsrc").toString,
      Seq("k", "source"), Seq.empty)
    val cntSrc = AggView.build(refSrc.table, root.resolve("cntsrc").toString,
      Seq("k"), Seq.empty)
    val refLang = AggView.build(t, root.resolve("reflang").toString,
      Seq("k", "lang"), Seq.empty)
    val cntLang = AggView.build(refLang.table, root.resolve("cntlang").toString,
      Seq("k"), Seq.empty)
    val refText = AggView.build(t, root.resolve("reftext").toString,
      Seq("k", "h"), Seq.empty)
    val cntText = AggView.build(refText.table, root.resolve("cnttext").toString,
      Seq("k"), Seq.empty)
    // churn: late arrivals + a retroactive delete slice
    t.append(all.filter(col("doc_id") % 2 === 1))
    t.deleteWhere(col("doc_id") % 13 === 4)
    card.refresh(t)
    refSrc.refresh(t); cntSrc.refresh(refSrc.table)
    refLang.refresh(t); cntLang.refresh(refLang.table)
    refText.refresh(t); cntText.refresh(refText.table)
    // readout off the four 1-row view tables only
    val c = card.table.snapshot().select(col("k"),
      col("n_rows").cast("long").as("n_docs"),
      col("sum_tokens").cast("long").as("n_tokens"))
    def one(v: AggView, name: String) = v.table.snapshot()
      .select(col("k"), col("n_rows").cast("long").as(name))
    c.join(one(cntSrc, "n_sources"), "k")
      .join(one(cntLang, "n_langs"), "k")
      .join(one(cntText, "n_unique_texts"), "k")
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_tokens"), expr("n_tokens div n_docs").as("mean_tokens"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dups"))
  }
  private def datasetCardSql(where: String) =
    s"""SELECT n_docs, n_sources, n_langs, n_tokens,
      |  n_tokens // n_docs AS mean_tokens,
      |  n_docs - n_unique_texts AS n_exact_dups
      |FROM (SELECT count(*) AS n_docs,
      |        count(DISTINCT source) AS n_sources,
      |        count(DISTINCT lang) AS n_langs,
      |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |        count(DISTINCT md5(text)) AS n_unique_texts
      |      FROM documents$where)""".stripMargin
  private val qDatasetCardIncrSql = datasetCardSql(" WHERE doc_id % 13 <> 4")

  // -------------------------------------------- q_dataset_card_refresh
  /** STEADY-STATE release-card maintenance cost: the fixture builds the
    * full [[qDatasetCardIncr]] chain (additive card + three
    * refcount→count distinct chains) over the whole corpus once per
    * (session, sf dir); each UNTIMED staging appends a doc_id-shifted
    * copy of the `doc_id % 50 = 0` docs and deletes exactly that batch
    * (the [[graft.streaming.EventStateViews]] net-zero convention), so
    * the timed body is one refresh per chain level against real CDF
    * churn — the dup-text refcount rows surface downstream as
    * cancelling (−1,+1) pairs — plus the O(1) readout, and the oracle
    * is the full-corpus declarative card. */
  private final case class CardFixture(
      t: graft.table.VersionedTable,
      views: Seq[(graft.table.AggView, Option[graft.table.AggView])],
      card: graft.table.AggView, cntSrc: graft.table.AggView,
      cntLang: graft.table.AggView, cntText: graft.table.AggView,
      calls: java.util.concurrent.atomic.AtomicLong)

  private val cardCache = scala.collection.concurrent.TrieMap.empty[
    (SparkSession, String), CardFixture]

  private def cardRows(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), lit(0L).as("k"),
      col("source"), col("lang"), md5(col("text")).as("h"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  private def cardFixture(s: SparkSession, d: String): CardFixture =
    cardCache.synchronized {
      cardCache.getOrElseUpdate((s, d), {
        import graft.table.{AggView, VersionedTable}
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val root = graft.Scratch.dir("graft-cardv-steady")
        val entrySchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("k", LongType),
          StructField("source", StringType),
          StructField("lang", StringType),
          StructField("h", StringType),
          StructField("n_tokens", LongType)))
        val t = VersionedTable.create(s, root.resolve("t").toString,
          entrySchema, Map(VersionedTable.PROP_CDF -> "true"))
        t.append(cardRows(s, d))
        val card = AggView.build(t, root.resolve("card").toString,
          Seq("k"), Seq("tokens" -> "n_tokens"))
        val refSrc = AggView.build(t, root.resolve("refsrc").toString,
          Seq("k", "source"), Seq.empty)
        val cntSrc = AggView.build(refSrc.table, root.resolve("cntsrc").toString,
          Seq("k"), Seq.empty)
        val refLang = AggView.build(t, root.resolve("reflang").toString,
          Seq("k", "lang"), Seq.empty)
        val cntLang = AggView.build(refLang.table, root.resolve("cntlang").toString,
          Seq("k"), Seq.empty)
        val refText = AggView.build(t, root.resolve("reftext").toString,
          Seq("k", "h"), Seq.empty)
        val cntText = AggView.build(refText.table, root.resolve("cnttext").toString,
          Seq("k"), Seq.empty)
        CardFixture(t,
          Seq(card -> None, refSrc -> Some(cntSrc), refLang -> Some(cntLang),
            refText -> Some(cntText)),
          card, cntSrc, cntLang, cntText,
          new java.util.concurrent.atomic.AtomicLong)
      })
    }

  private def cardPrepare(s: SparkSession, d: String): Unit = {
    val f = cardFixture(s, d)
    val n = f.calls.getAndIncrement()
    f.t.append(cardRows(s, d).filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + lit((n + 1) * 100000000L)))
    f.t.deleteWhere(col("doc_id") >= 100000000L)
  }

  private def qDatasetCardRefresh(s: SparkSession, d: String): DataFrame = {
    val f = cardFixture(s, d)
    f.views.foreach { case (ref, cnt) =>
      ref.refresh(f.t)
      cnt.foreach(c => c.refresh(ref.table))
    }
    val c = f.card.table.snapshot().select(col("k"),
      col("n_rows").cast("long").as("n_docs"),
      col("sum_tokens").cast("long").as("n_tokens"))
    def one(v: graft.table.AggView, name: String) = v.table.snapshot()
      .select(col("k"), col("n_rows").cast("long").as(name))
    c.join(one(f.cntSrc, "n_sources"), "k")
      .join(one(f.cntLang, "n_langs"), "k")
      .join(one(f.cntText, "n_unique_texts"), "k")
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("n_tokens"), expr("n_tokens div n_docs").as("mean_tokens"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dups"))
  }

  // ------------------------------------------------- q_mix_kl_refresh
  /** STEADY-STATE mix-monitor cost — net-zero staging over the
    * [[qMixKlIncr]] per-source AggView: the timed body is ONE O(Δ)
    * refresh (the staged +/− rows cancel per source) plus the
    * |sources|-row KL readout; oracle = the batch [[qSourceMixKl]]. */
  private val mixCache = scala.collection.concurrent.TrieMap.empty[
    (SparkSession, String),
    (graft.table.VersionedTable, graft.table.AggView,
      java.util.concurrent.atomic.AtomicLong)]

  private def mixFixture(s: SparkSession, d: String)
      : (graft.table.VersionedTable, graft.table.AggView,
        java.util.concurrent.atomic.AtomicLong) =
    mixCache.synchronized {
      mixCache.getOrElseUpdate((s, d), {
        import graft.table.{AggView, VersionedTable}
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        val root = graft.Scratch.dir("graft-mixkl-steady")
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("source", StringType)))
        val t = VersionedTable.create(s, root.resolve("t").toString, schema,
          Map(VersionedTable.PROP_CDF -> "true"))
        t.append(documents(s, d).select(col("doc_id"), col("source")))
        val v = AggView.build(t, root.resolve("v").toString,
          Seq("source"), Seq.empty)
        (t, v, new java.util.concurrent.atomic.AtomicLong)
      })
    }

  private def mixPrepare(s: SparkSession, d: String): Unit = {
    val (t, _, calls) = mixFixture(s, d)
    val n = calls.getAndIncrement()
    t.append(documents(s, d).select(col("doc_id"), col("source"))
      .filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + lit((n + 1) * 100000000L)))
    t.deleteWhere(col("doc_id") >= 100000000L)
  }

  private def qMixKlRefresh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (t, v, _) = mixFixture(s, d)
    v.refresh(t)
    val by = v.table.snapshot()
      .select($"source", $"n_rows".cast("long").as("n_docs"))
    val tot = by.agg(sum($"n_docs").as("total"), count(lit(1)).as("k"))
    by.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        expr("(n_docs * 1000000) div total").as("share_ppm"),
        expr("1000000 div k").as("target_ppm"))
      .withColumn("kl_contrib", round(
        ($"share_ppm" / 1000000.0d) *
          log(($"share_ppm" / 1000000.0d) / ($"target_ppm" / 1000000.0d)),
        6))
  }

  // -------------------------------------------------- q_release_diff
  /** RELEASE DIFF — the per-source added/removed/changed/reverted audit
    * between two versions of a CDF-enabled corpus table, computed from
    * the CHANGE FEED ALONE: no snapshot is read, so the cost is O(Δ)
    * regardless of corpus size — the shape that lets a 100 TB release
    * publish its diff card from the commits since the last release.
    *
    * Net effect per touched doc from one CDF aggregation: the FIRST
    * change row in the span (ordered by commit, preimage-before-
    * postimage within a commit) tells whether the doc existed before
    * (preimage/delete ⇒ yes, insert ⇒ no) and carries its pre-release
    * text; the LAST row tells whether it exists after and carries the
    * post-release text. added = ¬before ∧ after; removed = before ∧
    * ¬after; changed = both ∧ text hash moved; reverted = both ∧ text
    * hash equal (an edit later undone — the net-effect case a naive
    * per-event count double-reports). Docs inserted AND deleted inside
    * the span net to nothing and are excluded.
    *
    * Fixture lifecycle (oracle-reproducible rules): release A = the sf
    * documents; release B mutates it — `doc_id % 7 = 3` texts get a
    * marker suffix, the `% 21 = 3` sub-slice is edited BACK (revert),
    * `% 11 = 5` docs are deleted, and `% 13 = 0` docs re-enter with
    * shifted ids (adds). The oracle recomputes the per-source counts
    * from those rules over the base table. */
  private def qReleaseDiff(s: SparkSession, d: String): DataFrame = {
    import graft.table.VersionedTable
    import s.implicits._
    val root = graft.Scratch.dir("graft-release-diff")
    val base = documents(s, d)
    val t = VersionedTable.create(s, root.resolve("docs").toString,
      base.schema, Map(VersionedTable.PROP_CDF -> "true"))
    t.append(base)
    val v1 = t.latestVersion
    // release B edits
    t.updateWhere(col("doc_id") % 7 === 3,
      Map("text" -> concat(col("text"), lit(" __rev2"))))
    t.updateWhere(col("doc_id") % 21 === 3,
      Map("text" -> expr("replace(text, ' __rev2', '')")))
    t.deleteWhere(col("doc_id") % 11 === 5)
    t.append(base.filter(col("doc_id") % 13 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
    // the diff, from the change feed alone
    diffFromChanges(t.changes(v1 + 1))
  }

  /** The net-effect release diff over a raw CDF frame (any span of a
    * doc-shaped table's change feed) — see [[qReleaseDiff]]. The
    * classification itself is the general [[graft.table.TableDiff]]
    * component (also reachable as `DESCRIBE DIFF` SQL); this wrapper
    * fixes the corpus shape (key doc_id, grouped by source). Package-
    * visible so crafted feeds can pin the classification. */
  private[llm] def diffFromChanges(changes: DataFrame): DataFrame =
    graft.table.TableDiff.fromChanges(changes, "doc_id", Some("source"))
      .withColumnRenamed("group_key", "source")
  private val qReleaseDiffSql =
    """SELECT source,
      |  CAST(sum(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_added,
      |  CAST(sum(CASE WHEN doc_id % 11 = 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_removed,
      |  CAST(sum(CASE WHEN doc_id % 7 = 3 AND doc_id % 11 <> 5
      |                 AND doc_id % 21 <> 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed,
      |  CAST(sum(CASE WHEN doc_id % 21 = 3 AND doc_id % 11 <> 5
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_reverted
      |FROM documents
      |WHERE doc_id % 13 = 0 OR doc_id % 11 = 5 OR doc_id % 7 = 3
      |GROUP BY source""".stripMargin

  // -------------------------------------------------- q_quantile_norm
  /** True QUANTILE NORMALIZATION of a per-doc score across sources —
    * the strong form of [[qScoreCalibrate]]: instead of reporting the
    * percentile, each document's n_chars is REPLACED by the global
    * n_chars value at its within-source percentile, so every source's
    * score distribution maps onto the global one exactly (the
    * microarray-normalization construction, applied to corpus quality
    * scores before a single global threshold). Integer rank
    * arithmetic: target index = (r−1)(N−1) div (n−1) + 1, then one
    * equi-join into the globally-ranked value table. The rank→value
    * table comes from [[graft.operators.RankOps.withGlobalOrder]]
    * (bucketed distributed sort — no single-partition window) and the
    * per-source windows stay exact. */
  private def qQuantileNorm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = documents(s, d).select($"doc_id", $"source", $"n_chars")
    val ranked = docs
      .withColumn("r", rank().over(Window.partitionBy($"source")
        .orderBy($"n_chars".asc, $"doc_id".asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"source")))
    val globalVals = graft.operators.RankOps.withGlobalOrder(docs,
        $"n_chars", ascending = true, tiebreaks = Seq($"doc_id"),
        rowNumCol = Some("gidx"))
      .select($"gidx", $"n_chars".as("norm_chars"))
    val total = docs.agg(count(lit(1)).as("nn"))
    ranked.crossJoin(broadcast(total))
      .withColumn("gidx",
        expr("(r - 1) * (nn - 1) div greatest(n - 1, 1L) + 1"))
      .join(globalVals, "gidx")
      .select($"doc_id", $"source", $"n_chars", $"norm_chars")
  }
  private val qQuantileNormSql =
    """WITH docs AS (SELECT doc_id, source, n_chars FROM documents),
      |ranked AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(rank() OVER (PARTITION BY source
      |      ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS r,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
      |  FROM docs),
      |gv AS (
      |  SELECT CAST(row_number() OVER (ORDER BY n_chars ASC, doc_id ASC)
      |    AS BIGINT) AS gidx, n_chars AS norm_chars
      |  FROM docs),
      |t AS (SELECT count(*) AS nn FROM docs)
      |SELECT r.doc_id, r.source, r.n_chars, gv.norm_chars
      |FROM ranked r, t
      |JOIN gv ON gv.gidx =
      |  (r.r - 1) * (t.nn - 1) // greatest(r.n - 1, 1) + 1""".stripMargin

  // ------------------------------------------------ q_source_lang_mix
  /** Per-source LANGUAGE-MIX profile: how many languages each source
    * carries and the Shannon entropy of its language shares — the
    * "is this crawl monolingual or a mixture" axis of mix planning
    * ([[qSourceMixKl]] watches sources; this watches the language
    * dimension INSIDE each source). Entropy via the exact
    * ln(n) − Σc·ln(c)/n decomposition on integer counts
    * ([[graft.llm.TextOps]] word-entropy idiom), per-source small
    * sums, 4dp. One (source, lang) aggregate then a |sources|-row
    * finisher. */
  private def qSourceLangMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(
        sum($"c").as("n_docs"),
        count(lit(1)).as("n_langs"),
        round(sum($"c".cast("double") * log($"c")), 10).as("sum_clnc"))
      .select($"source", $"n_docs", $"n_langs",
        round(log($"n_docs") - $"sum_clnc" / $"n_docs", 4)
          .as("lang_entropy"))
  }
  private val qSourceLangMixSql =
    """WITH cl AS (
      |  SELECT source, lang, count(*) AS c
      |  FROM documents GROUP BY 1, 2)
      |SELECT source,
      |  CAST(sum(c) AS BIGINT) AS n_docs,
      |  count(*) AS n_langs,
      |  round(ln(CAST(sum(c) AS BIGINT))
      |    - round(sum(CAST(c AS DOUBLE) * ln(c)), 10)
      |      / CAST(sum(c) AS BIGINT), 4) AS lang_entropy
      |FROM cl GROUP BY source""".stripMargin

  // ---------------------------------------------------- q_mix_kl_incr
  /** The [[qSourceMixKl]] monitor MAINTAINED instead of recomputed:
    * per-source doc counts live in an [[graft.table.AggView]] over a
    * CDF-tracked corpus table, so each ingest batch updates only the
    * touched source rows (O(Δ + touched groups)) and the KL readout
    * runs off the |sources|-row view — the standing-drift check a
    * 100 TB pipeline refreshes per append, never rescanning the
    * corpus. Fixture: two-thirds of the corpus seeds the view, the
    * rest arrives as a delta, one refresh catches up — and the result
    * hash-matches the batch oracle, proving maintained ≡ recomputed. */
  private def qMixKlIncr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.table.{AggView, VersionedTable}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = graft.Scratch.dir("graft-mixklv")
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType)))
    val t = VersionedTable.create(s, root.resolve("t").toString, schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    val docs = documents(s, d).select($"doc_id", $"source")
    t.append(docs.filter($"doc_id" % 3 =!= 0L))
    val v = AggView.build(t, root.resolve("v").toString,
      Seq("source"), Seq.empty)
    t.append(docs.filter($"doc_id" % 3 === 0L))
    v.refresh(t)
    val by = v.table.snapshot()
      .select($"source", $"n_rows".cast("long").as("n_docs"))
    val tot = by.agg(sum($"n_docs").as("total"), count(lit(1)).as("k"))
    by.crossJoin(broadcast(tot))
      .select($"source", $"n_docs",
        expr("(n_docs * 1000000) div total").as("share_ppm"),
        expr("1000000 div k").as("target_ppm"))
      .withColumn("kl_contrib", round(
        ($"share_ppm" / 1000000.0d) *
          log(($"share_ppm" / 1000000.0d) / ($"target_ppm" / 1000000.0d)),
        6))
  }

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_gopher_quality"     -> qGopherQuality _,
    "q_boilerplate_ngrams" -> qBoilerplateNgrams _,
    "q_decontaminate"      -> qDecontaminate _,
    "q_decontaminate_bloom" -> qDecontaminateBloom _,
    "q_lm_perplexity"      -> qLmPerplexity _,
    "q_bigram_lm"          -> qBigramLm _,
    "q_winsorize"          -> qWinsorize _,
    "q_dsir_weights"       -> qDsirWeights _,
    "q_quality_classifier" -> qQualityClassifier _,
    "q_pii_scrub"          -> qPiiScrub _,
    "q_source_mix_kl"      -> qSourceMixKl _,
    "q_mix_kl_incr"        -> qMixKlIncr _,
    "q_score_calibrate"    -> qScoreCalibrate _,
    "q_dataset_card"       -> qDatasetCard _,
    "q_quantile_norm"      -> qQuantileNorm _,
    "q_source_lang_mix"    -> qSourceLangMix _,
    "q_release_diff"       -> qReleaseDiff _,
    "q_dataset_card_incr"  -> qDatasetCardIncr _,
    "q_dataset_card_refresh" -> qDatasetCardRefresh _,
    "q_mix_kl_refresh"     -> qMixKlRefresh _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_gopher_quality"     -> qGopherQualitySql,
    "q_boilerplate_ngrams" -> qBoilerplateNgramsSql,
    "q_decontaminate"      -> qDecontaminateSql,
    "q_decontaminate_bloom" -> qDecontaminateSql,
    "q_lm_perplexity"      -> qLmPerplexitySql,
    "q_bigram_lm"          -> qBigramLmSql,
    "q_winsorize"          -> qWinsorizeSql,
    "q_dsir_weights"       -> qDsirWeightsSql,
    "q_quality_classifier" -> qQualityClassifierSql,
    "q_pii_scrub"          -> qPiiScrubSql,
    "q_source_mix_kl"      -> qSourceMixKlSql,
    "q_mix_kl_incr"        -> qSourceMixKlSql,
    "q_score_calibrate"    -> qScoreCalibrateSql,
    "q_dataset_card"       -> qDatasetCardSql,
    "q_quantile_norm"      -> qQuantileNormSql,
    "q_source_lang_mix"    -> qSourceLangMixSql,
    "q_release_diff"       -> qReleaseDiffSql,
    "q_dataset_card_incr"  -> qDatasetCardIncrSql,
    // steady-state rows: net-zero staging ⇒ the full-set batch forms
    "q_dataset_card_refresh" -> datasetCardSql(""),
    "q_mix_kl_refresh"     -> qSourceMixKlSql)

  override val prepares: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "q_dataset_card_refresh" -> (cardPrepare _),
    "q_mix_kl_refresh"       -> (mixPrepare _))
}
