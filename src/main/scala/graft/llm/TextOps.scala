package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Text-analysis operators over the `documents` table (SURVEY §2.9 /
  * driver brief: language-ID, quality scoring, token counting, document
  * fingerprinting) — the per-document half of an LLM training-data
  * pipeline.
  *
  * Every operator is a per-row array/higher-order-function expression —
  * zero UDFs, zero shuffles, zero explodes in the hot path (except
  * simhash's token unnest, see [[DedupOps]]). At 100 TB this is the
  * ideal shape: embarrassingly parallel map work that rides whole-stage
  * codegen, scans only `doc_id`+`text` (column pruning), and grows
  * linearly with input splits.
  *
  * Cross-engine determinism notes: token arithmetic is integer (exact);
  * ratios are single IEEE divisions of identical integers; fingerprints
  * are lexicographic minima of md5 hex strings — all bit-identical
  * between Spark and the DuckDB oracle.
  */
object TextOps extends QueryModule {
  import Tables._

  /** Shared tokenization: lowercase + single-space split (the corpus is
    * pre-normalized; `split` keeps empty tokens exactly like DuckDB's
    * `string_split`, so counts agree on any input). */
  private def withTokens(df: DataFrame): DataFrame =
    df.withColumn("tokens", split(lower(col("text")), " "))

  private val stopwords = Seq("the", "a", "of", "and", "in")
  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  // ------------------------------------------------------- q_text_stats
  /** Quality scoring: length/diversity/stopword signals + a composite
    * score, the heuristics corpus filters (C4, Gopher rules) are built
    * from. */
  private def qTextStats(s: SparkSession, d: String): DataFrame =
    withTokens(documents(s, d)).select(
      col("doc_id"),
      size(col("tokens")).cast("long").as("n_tokens"),
      size(array_distinct(col("tokens"))).cast("long").as("n_distinct"),
      expr("aggregate(transform(tokens, x -> length(x)), 0, (acc, x) -> acc + x)" +
        " / size(tokens)").as("avg_token_len"),
      (size(array_distinct(col("tokens"))) / size(col("tokens"))).as("type_token_ratio"),
      expr(s"size(filter(tokens, t -> t IN ${sqlList(stopwords)})) / size(tokens)")
        .as("stopword_ratio"),
      (length(col("text")).cast("long")).as("n_chars_measured"))
  private val qTextStatsSql =
    s"""SELECT doc_id,
      |  len(t) AS n_tokens,
      |  len(list_distinct(t)) AS n_distinct,
      |  list_sum(list_transform(t, x -> length(x))) / len(t) AS avg_token_len,
      |  len(list_distinct(t)) / len(t) AS type_token_ratio,
      |  len(list_filter(t, x -> x IN ${sqlList(stopwords)})) / len(t) AS stopword_ratio,
      |  length(text) AS n_chars_measured
      |FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents)""".stripMargin

  // --------------------------------------------------------- q_lang_id
  /** n-gram/marker-word language ID: score each candidate language by
    * its marker-token hit rate, predict the argmax with a fixed
    * preference order — the classic dictionary heuristic (langid/cld
    * fallback tier). Markers are evaluated per token so the operator
    * stays a per-row expression. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("de", "le", "shi", "zai", "he"))

  private def qLangId(s: SparkSession, d: String): DataFrame = {
    val scored = markers.foldLeft(withTokens(documents(s, d))) {
      case (df, (lang, ws)) =>
        df.withColumn(s"score_$lang",
          expr(s"size(filter(tokens, t -> t IN ${sqlList(ws)})) / size(tokens)"))
    }
    val langs = markers.map(_._1)
    // argmax with fixed preference order (ties resolve to the earlier
    // language) — identical CASE chain on both engines
    val predicted = langs.init.zipWithIndex.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (lang, i)) =>
        val rest = langs.drop(i + 1).map(l => col(s"score_$l"))
        val restMax = if (rest.size == 1) rest.head else greatest(rest: _*)
        val cond = col(s"score_$lang") >= restMax
        Some(acc.fold(when(cond, lang))(_.when(cond, lang)))
    }.get.otherwise(langs.last)
    scored.select(
      col("doc_id"), col("lang").as("actual_lang"),
      predicted.as("predicted_lang"),
      (predicted === col("lang")).as("is_correct"),
      col("score_en"), col("score_es"), col("score_de"))
  }
  private val qLangIdSql = {
    val scores = markers.map { case (lang, ws) =>
      s"len(list_filter(t, x -> x IN ${sqlList(ws)})) / len(t) AS score_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1).map(l => s"score_$l")
      val restMax = if (rest.size == 1) rest.head
        else s"greatest(${rest.mkString(", ")})"
      s"WHEN score_$lang >= $restMax THEN '$lang'"
    }.mkString(" ")
    s"""SELECT doc_id, actual_lang,
      |  CASE $cases ELSE '${langs.last}' END AS predicted_lang,
      |  (CASE $cases ELSE '${langs.last}' END) = actual_lang AS is_correct,
      |  score_en, score_es, score_de
      |FROM (SELECT doc_id, lang AS actual_lang,
      |  $scores
      |  FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents))""".stripMargin
  }

  // --------------------------------------------------- q_lang_confusion
  /** Language-ID quality readout: the confusion matrix of
    * [[qLangId]]'s prediction against the labeled language, with each
    * cell's integer-ppm share of its actual-language row (the recall
    * diagonal). Classifier evaluation is itself a corpus-scale
    * operator — the matrix is |langs|² rows off one aggregate over the
    * per-doc predictions, and at 100 TB it is the ONLY view of the
    * classifier anyone looks at, so it belongs beside the classifier
    * as a first-class query, not a notebook afterthought. */
  private def qLangConfusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    qLangId(s, d)
      .groupBy($"actual_lang", $"predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("row_total",
        sum($"n_docs").over(Window.partitionBy($"actual_lang")))
      .select($"actual_lang", $"predicted_lang", $"n_docs",
        expr("n_docs * 1000000L div row_total").as("row_share_ppm"),
        ($"actual_lang" === $"predicted_lang").as("is_diagonal"))
  }
  private val qLangConfusionSql =
    s"""WITH pred AS ($qLangIdSql),
      |cell AS (
      |  SELECT actual_lang, predicted_lang, count(*) AS n_docs
      |  FROM pred GROUP BY 1, 2)
      |SELECT actual_lang, predicted_lang, n_docs,
      |  (n_docs * 1000000)
      |    // CAST(sum(n_docs) OVER (PARTITION BY actual_lang) AS BIGINT)
      |    AS row_share_ppm,
      |  actual_lang = predicted_lang AS is_diagonal
      |FROM cell""".stripMargin

  // ----------------------------------------------------- q_token_count
  /** Token counting three ways: whitespace, a BPE-ish subword regex
    * (word pieces capped at 4 chars — the shape of byte-pair chunking),
    * and a word/punct tokenizer regex. Identical RE2-safe patterns on
    * both engines. */
  private def qTokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).cast("long")
        .as("bpe_pieces"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")).cast("long")
        .as("word_tokens"),
      length(col("text")).cast("long").as("n_chars_measured"))
  private val qTokenCountSql =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]{1,4}')) AS bpe_pieces,
      |  len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS word_tokens,
      |  length(text) AS n_chars_measured
      |FROM documents""".stripMargin

  // -------------------------------------------------- q_doc_fingerprint
  /** Rolling-hash document fingerprint (winnowing-style): hash every
    * character 5-gram, keep the lexicographic minimum (+ the distinct
    * 5-gram count as a length-normalized signal). Content-defined, so
    * whitespace-identical documents collide — the fingerprint used for
    * exact-ish dedup at corpus scale. */
  private def qDocFingerprint(s: SparkSession, d: String): DataFrame = {
    // md5_min: native fused hash+min loop (graft.functions.Md5Min) —
    // the interpreted HOF form is allocation-bound; values identical.
    // distinct count runs on raw grams (no hashing needed — md5 is
    // injective in practice so the counts coincide with the oracle's
    // distinct-of-hashes).
    graft.functions.GraftFunctions.register(s)
    documents(s, d)
      .filter(length(col("text")) >= 5)
      .withColumn("grams", expr(
        "transform(sequence(1, length(text)-4), i -> substring(text, i, 5))"))
      .select(
        col("doc_id"),
        expr("md5_min(grams, '')").as("fingerprint"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct_grams"))
  }
  private val qDocFingerprintSql =
    """SELECT doc_id,
      |  list_aggregate(gh, 'min') AS fingerprint,
      |  len(list_distinct(gh)) AS n_distinct_grams
      |FROM (SELECT doc_id, list_transform(generate_series(1, length(text)-4),
      |        i -> md5(substr(text, i, 5))) AS gh
      |      FROM documents WHERE length(text) >= 5)""".stripMargin

  // ----------------------------------------------------- q_corpus_prep
  /** End-to-end training-corpus preparation — the ops above COMPOSED
    * into the pipeline a data-curation job actually runs:
    *   1. quality gate (≥ 5 whitespace tokens),
    *   2. exact dedup by content hash (min-doc_id survivor — W1's
    *      window idiom on a derived key),
    *   3. per-language token budget: documents admitted in doc_id order
    *      until the language's cumulative token count passes 2k (the
    *      running-frame window), emitting each survivor with its
    *      running total.
    * Every stage is declarative (two window shuffles + per-row exprs),
    * so the whole pipeline is one Catalyst plan — filters and hashing
    * reach the scan, the two windows are the only exchanges. */
  private val TOKEN_BUDGET = 2000L

  private def qCorpusPrep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDup = Window.partitionBy(col("content_hash"))
      .orderBy(col("doc_id").asc_nulls_last)
    val wBudget = Window.partitionBy(col("lang"))
      .orderBy(col("doc_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tokens") >= 5)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("__rnk", row_number().over(wDup))
      .filter(col("__rnk") === 1)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wBudget))
      .filter(col("cum_tokens") <= TOKEN_BUDGET)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
  }
  private val qCorpusPrepSql =
    s"""WITH gated AS (
      |  SELECT doc_id, lang, md5(text) AS content_hash,
      |         len(string_split(text, ' ')) AS n_tokens
      |  FROM documents WHERE len(string_split(text, ' ')) >= 5),
      |deduped AS (
      |  SELECT doc_id, lang, n_tokens,
      |         row_number() OVER (PARTITION BY content_hash
      |                            ORDER BY doc_id ASC) AS rnk
      |  FROM gated),
      |budgeted AS (
      |  SELECT doc_id, lang, n_tokens,
      |         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id ASC
      |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |           AS cum_tokens
      |  FROM deduped WHERE rnk = 1)
      |SELECT doc_id, lang, n_tokens, cum_tokens
      |FROM budgeted WHERE cum_tokens <= $TOKEN_BUDGET""".stripMargin

  // ------------------------------------------------------ q_doc_chunks
  /** Sliding-window chunking — the step that turns documents into
    * training/RAG contexts: CHUNK-token windows every STRIDE tokens
    * (overlapping when STRIDE < CHUNK). Pure per-row array arithmetic
    * (sequence → posexplode → slice), shuffle-free and codegen-riding;
    * a 100 TB corpus chunks at scan speed with output partitioning
    * inherited from the input. */
  private[llm] val CHUNK = 30
  private[llm] val STRIDE = 20

  private def qDocChunks(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(STRIDE))).as("start"))
      .select(col("doc_id"),
        col("start").cast("long").as("chunk_start"),
        least(size(col("toks")) - col("start"), lit(CHUNK)).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(CHUNK)))
          .as("chunk_text"))

  private val qDocChunksSql =
    s"""SELECT d.doc_id,
      |       s.start AS chunk_start,
      |       least(len(d.t) - s.start, $CHUNK) AS n_chunk_tokens,
      |       array_to_string(
      |         list_slice(d.t, s.start + 1, least(s.start + $CHUNK, len(d.t))),
      |         ' ') AS chunk_text
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
      |     unnest(generate_series(0, len(d.t) - 1, $STRIDE)) AS s(start)""".stripMargin

  // ------------------------------------------------------- q_top_terms
  /** Per-document distinctive terms: rank terms by (tf DESC, df ASC,
    * term ASC) and keep the top 3 — the TF-IDF idea with an EXACT total
    * order (raw integer tf/df instead of a float score), so the result
    * hashes identically cross-engine. Two hash aggregations + one
    * broadcast-sized join + one per-doc window; the df (document
    * frequency) side aggregates to vocabulary size, which is what makes
    * the join broadcastable at corpus scale. */
  private def qTopTerms(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(length(col("term")) >= 4)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(dfreq), "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"))
  }

  private val qTopTermsSql =
    """WITH tf AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  WHERE len(term) >= 4
      |  GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
      |ranked AS (
      |  SELECT t.doc_id, t.term, t.tf, dfreq.df,
      |         row_number() OVER (PARTITION BY t.doc_id
      |                            ORDER BY t.tf DESC, dfreq.df ASC, t.term ASC)
      |           AS rank
      |  FROM tf t JOIN dfreq ON dfreq.term = t.term)
      |SELECT doc_id, rank, term, tf, df FROM ranked WHERE rank <= 3""".stripMargin

  // ------------------------------------------------------- q_bpe_pairs
  /** The core BPE-training statistic: corpus-wide adjacent character
    * pair frequencies (each training round merges the argmax pair and
    * recounts; this op IS that count, with the exact total order a
    * trainer needs — count DESC, pair ASC). Two generators + one hash
    * aggregation, all counts exact integers; at corpus scale the
    * explode is scan-proportional map work and the aggregation is
    * partial+final over a ≤ |alphabet|² key space. */
  private val BPE_TOP = 50

  private def qBpePairs(s: SparkSession, d: String): DataFrame = {
    val pairs = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
    // total (count DESC, pair ASC) rank over the ≤ |alphabet|²-row
    // frequency table via ONE aggregate (`sort_array(collect_list)` +
    // `slice` + `posexplode` — bounded by the pair keyspace, never
    // corpus size), not a partition-less ranking window: the plan
    // clears the ShapeGate without an exemption (VERDICT r14 next #5,
    // the q_join_estimate idiom).
    pairs.groupBy("pair").agg(count(lit(1)).as("n"))
      .agg(sort_array(collect_list(
        struct((-col("n")).as("neg_n"), col("pair"), col("n")))).as("xs"))
      .select(posexplode(slice(col("xs"), 1, BPE_TOP)).as(Seq("p", "e")))
      .select((col("p") + 1).cast("long").as("rank"),
        col("e.pair").as("pair"), col("e.n").as("n"))
  }
  private val qBpePairsSql =
    s"""WITH pairs AS (
      |  SELECT substr(w, i, 2) AS pair
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents),
      |       unnest(generate_series(1, length(w) - 1)) AS s(i)
      |  WHERE length(w) >= 2),
      |freq AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair)
      |SELECT row_number() OVER (ORDER BY n DESC, pair ASC) AS rank, pair, n
      |FROM freq
      |QUALIFY rank <= $BPE_TOP""".stripMargin

  // ------------------------------------------------------- q_bpe_train
  /** BPE TRAINING — the actual iterative loop `q_bpe_pairs` is one step
    * of: `BPE_ITERS` rounds of (count adjacent symbol pairs over the
    * word-type table, merge the argmax pair everywhere it occurs),
    * producing the ranked merge table a tokenizer ships. Words start as
    * character sequences; each round the globally most frequent
    * adjacent pair (count DESC, then pair ASC — a total order) becomes
    * one symbol, applied greedily left-to-right within each word (the
    * reference BPE convention; `aaaa` + merge (a,a) → `aa aa`).
    *
    * == 100 TB design ==
    * Training runs on the WORD-TYPE table, not the corpus: one
    * distributed explode+groupBy collapses any corpus to its
    * (word, count) vocabulary — the only corpus-scale pass — and each
    * merge round is then a pair-explode + hash-agg over that bounded
    * table. Here the trainer keeps the `BPE_TYPES` most frequent types
    * (count DESC, word ASC — deterministic), a constant-bounded set
    * collected like [[SimilarityOps.lloydCodebook]]'s TRAIN_MAX sample;
    * a production run would keep the full type table (~10M rows at
    * 100 TB — still tiny next to the corpus) and leave it distributed.
    * Each round's argmax is a 1-row collect; the merge rewrite is a
    * left-to-right fold (`aggregate` HOF) per word.
    *
    * == Cross-engine determinism ==
    * Counts are exact integers; the argmax order is total; the greedy
    * rewrite is the IDENTICAL fold in both engines (Spark `aggregate`
    * and DuckDB `list_reduce` over a space-sentineled accumulator —
    * a pair merges only where ` a` is the full trailing symbol, so no
    * substring aliasing). Words are restricted to `[a-z]{2,}` so
    * symbols never collide with the space sentinel or SQL quoting. */
  private[llm] val BPE_ITERS = 8
  private[llm] val BPE_TYPES = 256

  /** The fold rewriting one word's symbol list under merge (a, b):
    * symbols accumulate space-joined; when the accumulator's trailing
    * symbol is exactly `a` and the next is `b`, appending `b` directly
    * fuses them. Greedy left-to-right by construction. `in` is any
    * ARRAY<STRING> symbol-list expression. */
  private def mergeFoldSql(a: String, b: String, in: String): String =
    s"""split(ltrim(aggregate($in, '', (acc, x) ->
       |  CASE WHEN endswith(acc, ' $a') AND x = '$b'
       |       THEN concat(acc, '$b') ELSE concat(acc, ' ', x) END)), ' ')"""
      .stripMargin

  /** Ranked merge table: (rank, pair_left, pair_right, merged, n). The
    * merge list is deterministic, so [[qBpeEncode]] reuses one cached
    * training per (session, sfDir) — train once, encode forever, the
    * real deployment shape. [[qBpeTrain]] itself always retrains: the
    * trainer is the operation that bench row exists to measure. */
  private val bpeMergeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Long, String, String, String, Long)]]

  private[llm] def trainBpeMerges(
      s: SparkSession, d: String): Seq[(Long, String, String, String, Long)] =
    bpeMergeCache.synchronized {
      bpeMergeCache.getOrElseUpdate((s, d), computeBpeMerges(s, d))
    }

  private[llm] def computeBpeMerges(
      s: SparkSession, d: String): Seq[(Long, String, String, String, Long)] = {
    val types = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(BPE_TYPES)
    // the one corpus-scale pass; the collected type table is bounded
    // by the BPE_TYPES constant (same rationale as TRAIN_MAX)
    val localTypes = types.collect().toIndexedSeq
    var words = s.createDataFrame(
        s.sparkContext.parallelize(localTypes, 1), types.schema)
      .select(col("cnt"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .as("syms"))
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (it <- 1 to BPE_ITERS if !exhausted) {
      // a tiny corpus can run out of adjacent pairs before
      // BPE_ITERS rounds — stop early instead of throwing
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1)," +
            " i -> struct(syms[i-1] AS a, syms[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect().headOption
      best match {
        case Some(r) =>
          val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((it.toLong, a, b, a + b, n))
          words = words.withColumn("syms", expr(mergeFoldSql(a, b, "syms")))
        case None => exhausted = true
      }
    }
    merges.result()
  }

  private def qBpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    computeBpeMerges(s, d)
      .toDF("rank", "pair_left", "pair_right", "merged", "n")
  }

  /** The oracle replays every round as an unrolled CTE pair: `b$i` is
    * the argmax over `w${i-1}`'s adjacent pairs, `w$i` the fold-merged
    * type table (DuckDB `list_reduce` = the Spark `aggregate` fold).
    * MATERIALIZED pins each round to evaluate once (the chain is
    * referenced twice per round; inlined it would re-derive w0 2^8
    * times). `len(syms) >= 2` guards fully-merged words from both the
    * pair zip (DuckDB pads short zips with NULL) and Spark's
    * descending `sequence(1, 0)`. */
  /** The shared training CTE chain (`w0`, then `b$i`/`w$i` per round),
    * reused verbatim by the train and encode oracles. */
  private val bpeCtesSql = {
    val base =
      s"""w0 AS MATERIALIZED (
        |  SELECT cnt, [substr(w, i, 1) for i in range(1, length(w) + 1)] AS syms
        |  FROM (SELECT w, count(*) AS cnt
        |        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
        |              FROM documents)
        |        WHERE regexp_full_match(w, '[a-z]{2,}')
        |        GROUP BY w
        |        ORDER BY cnt DESC, w ASC LIMIT $BPE_TYPES))""".stripMargin
    val iters = (1 to BPE_ITERS).map { i =>
      s"""b$i AS (
        |  SELECT u.p[1] AS a, u.p[2] AS b, CAST(sum(cnt) AS BIGINT) AS n
        |  FROM w${i - 1}, unnest(list_zip(syms[1:-2], syms[2:-1])) AS u(p)
        |  WHERE len(syms) >= 2
        |  GROUP BY 1, 2
        |  ORDER BY n DESC, a ASC, b ASC LIMIT 1),
        |w$i AS MATERIALIZED (
        |  SELECT cnt, string_split(ltrim(list_reduce(list_prepend('', syms),
        |    (acc, x) -> CASE WHEN ends_with(acc, ' ' || b$i.a) AND x = b$i.b
        |                THEN acc || b$i.b ELSE acc || ' ' || x END)), ' ') AS syms
        |  FROM w${i - 1}, b$i)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iters"
  }

  private val qBpeTrainSql = {
    val out = (1 to BPE_ITERS).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, a AS pair_left, b AS pair_right," +
        s" a || b AS merged, n FROM b$i").mkString("\nUNION ALL\n")
    s"WITH $bpeCtesSql\n$out"
  }

  // ------------------------------------------------------ q_bpe_encode
  /** BPE ENCODING — applying [[trainBpeMerges]]'s learned merge table
    * to the corpus: every `[a-z]{2,}` word is segmented by replaying
    * the `BPE_ITERS` merges in training order (the standard apply-time
    * rule), all other tokens count as one piece, and each document
    * reports its token and piece totals — the tokens-per-document
    * statistic a training run budgets context windows with.
    *
    * == 100 TB design ==
    * Pure per-row map work: the merges are a collected constant (the
    * trained table), so encoding is a chain of `BPE_ITERS` folds inside
    * one `transform` lambda — no shuffle, no join, rides whole-stage
    * codegen next to the scan. The oracle cannot inline the learned
    * merges (they are data-dependent), so it re-derives them with the
    * shared training CTEs and applies the same folds with correlated
    * `b$i` references, exploded per word then re-aggregated per doc —
    * same arithmetic, shuffle shape irrelevant to equality. */
  private def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val merges = trainBpeMerges(s, d)
    val chars = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    val folded = merges.foldLeft(chars) { case (e, (_, a, b, _, _)) =>
      mergeFoldSql(a, b, e)
    }
    withTokens(documents(s, d)).select(
      col("doc_id"),
      size(col("tokens")).cast("long").as("n_tokens"),
      expr(s"""aggregate(transform(tokens, w ->
        |  CASE WHEN w RLIKE '^[a-z]{2,}$$' THEN size($folded) ELSE 1 END),
        |  0, (acc, x) -> acc + x)""".stripMargin).cast("long").as("n_pieces"))
  }

  private val qBpeEncodeSql = {
    val chars = "[substr(w, i, 1) for i in range(1, length(w) + 1)]"
    val folded = (1 to BPE_ITERS).foldLeft(chars) { (e, i) =>
      s"""string_split(ltrim(list_reduce(list_prepend('', $e),
         |  (acc, x) -> CASE WHEN ends_with(acc, ' ' || b$i.a) AND x = b$i.b
         |              THEN acc || b$i.b ELSE acc || ' ' || x END)), ' ')"""
        .stripMargin
    }
    val bs = (1 to BPE_ITERS).map("b" + _).mkString(", ")
    s"""WITH $bpeCtesSql,
      |enc AS (
      |  SELECT doc_id,
      |    CASE WHEN regexp_full_match(w, '[a-z]{2,}')
      |         THEN len($folded) ELSE 1 END AS pieces
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents), $bs)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(pieces) AS BIGINT) AS n_pieces
      |FROM enc GROUP BY doc_id""".stripMargin
  }

  // --------------------------------------------- q_tokenizer_fertility
  /** Tokenizer FERTILITY per language — the per-slice tokenizer-quality
    * readout (pieces per word, chars per piece) that decides whether a
    * vocabulary trained on the whole corpus under-serves a language:
    * high pieces-per-word on a slice means its text fragments into more
    * subwords, inflating context-window cost for that language. Applies
    * [[trainBpeMerges]]'s learned table exactly like [[qBpeEncode]]
    * (same fold chain, same `[a-z]{2,}` rule), then aggregates by
    * `lang`. Ratios are integer ppm (`div`-truncated) so the values are
    * bit-identical across engines and summation orders.
    *
    * == 100 TB design ==
    * Per-row fold work beside the scan (merges are a collected constant
    * — no join), then ONE |langs|-row aggregation: the only shuffle is
    * the tiny final groupBy. The oracle re-derives the merge table via
    * the shared training CTEs and replays the identical folds. */
  private def qTokenizerFertility(s: SparkSession, d: String): DataFrame = {
    val merges = trainBpeMerges(s, d)
    val chars = "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    val folded = merges.foldLeft(chars) { case (e, (_, a, b, _, _)) =>
      mergeFoldSql(a, b, e)
    }
    withTokens(documents(s, d))
      .select(
        col("lang"),
        size(col("tokens")).cast("long").as("d_tokens"),
        expr(s"""aggregate(transform(tokens, w ->
          |  CASE WHEN w RLIKE '^[a-z]{2,}$$' THEN size($folded) ELSE 1 END),
          |  0, (acc, x) -> acc + x)""".stripMargin).cast("long")
          .as("d_pieces"),
        expr("aggregate(transform(tokens, w -> length(w))," +
          " 0, (acc, x) -> acc + x)").cast("long").as("d_word_chars"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("d_tokens")).as("n_tokens"),
        sum(col("d_pieces")).as("n_pieces"),
        sum(col("d_word_chars")).as("n_word_chars"))
      .withColumn("pieces_per_token_ppm",
        expr("n_pieces * 1000000L div n_tokens"))
      .withColumn("chars_per_piece_ppm",
        expr("n_word_chars * 1000000L div n_pieces"))
  }

  private val qTokenizerFertilitySql = {
    val chars = "[substr(w, i, 1) for i in range(1, length(w) + 1)]"
    val folded = (1 to BPE_ITERS).foldLeft(chars) { (e, i) =>
      s"""string_split(ltrim(list_reduce(list_prepend('', $e),
         |  (acc, x) -> CASE WHEN ends_with(acc, ' ' || b$i.a) AND x = b$i.b
         |              THEN acc || b$i.b ELSE acc || ' ' || x END)), ' ')"""
        .stripMargin
    }
    val bs = (1 to BPE_ITERS).map("b" + _).mkString(", ")
    s"""WITH $bpeCtesSql,
      |enc AS (
      |  SELECT lang,
      |    CASE WHEN regexp_full_match(w, '[a-z]{2,}')
      |         THEN len($folded) ELSE 1 END AS pieces,
      |    length(w) AS wchars
      |  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents), $bs),
      |agg AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
      |         CAST(sum(pieces) AS BIGINT) AS n_pieces,
      |         CAST(sum(wchars) AS BIGINT) AS n_word_chars
      |  FROM enc GROUP BY 1),
      |docs AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1)
      |SELECT lang, n_docs, n_tokens, n_pieces, n_word_chars,
      |  (n_pieces * 1000000) // n_tokens AS pieces_per_token_ppm,
      |  (n_word_chars * 1000000) // n_pieces AS chars_per_piece_ppm
      |FROM agg JOIN docs USING (lang)""".stripMargin
  }

  // -------------------------------------------------- q_vocab_coverage
  /** Vocabulary coverage analysis: token frequencies ranked by the
    * exact total order, with each prefix's cumulative share of all
    * corpus tokens — the "what does a 32k vocab actually cover" curve
    * every tokenizer design starts from. The top-K comes from
    * orderBy+limit (TakeOrderedAndProject — per-partition top-K, no
    * single-partition sort even at 10⁸-term vocabularies); ranks and
    * prefix sums attach over the bounded K-row result. */
  private val VOCAB_TOP = 32

  private def qVocabCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    // total corpus tokens as a 1-row broadcast; top-K + rank + prefix
    // sum via RankOps.topK (TakeOrderedAndProject — no vocabulary-
    // scale single-partition sort; prefix sums of the first K rows
    // only ever see the first K rows)
    val total = freq.agg(sum(col("n")).as("__tot"))
    graft.operators.RankOps.topK(freq, VOCAB_TOP,
        Seq(("n", false), ("term", true)),
        rankName = "rank", runningSums = Seq(("n", "cum_n")))
      .crossJoin(broadcast(total))
      .withColumn("coverage", col("cum_n") / col("__tot"))
      .select(col("rank"), col("term"), col("n"), col("cum_n"), col("coverage"))
  }
  private val qVocabCoverageSql =
    s"""WITH freq AS (
      |  SELECT term, count(*) AS n
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
      |        FROM documents)
      |  GROUP BY term)
      |SELECT row_number() OVER w AS rank, term, n,
      |  CAST(sum(n) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
      |  CAST(sum(n) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    / CAST(sum(n) OVER () AS BIGINT) AS coverage
      |FROM freq
      |WINDOW w AS (ORDER BY n DESC, term ASC)
      |QUALIFY rank <= $VOCAB_TOP""".stripMargin

  // --------------------------------------------------------- q_seq_pack
  /** Context-window tokens per packed training sequence. Small so the
    * test corpus spans many chunks; the arithmetic is capacity-
    * independent. */
  private val PACK_CAP = 256L

  /** SEQUENCE PACKING — the last step before a training run: documents
    * are concatenated in a deterministic order and cut into fixed
    * `PACK_CAP`-token context windows (the standard concat-and-chunk
    * layout; a document crossing a boundary spans two chunks, recorded
    * as [chunk_first, chunk_last]). The running token offset is a
    * window sum PARTITIONED BY lang: packing is per-shard by
    * construction (each language's stream packs independently), so at
    * 100 TB the window never funnels the corpus into one partition —
    * the partition key mirrors how corpora are actually sharded.
    * Offsets and chunk ids are integer arithmetic over exact token
    * counts, so the oracle replays them bit-for-bit. */
  private def qSeqPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withTokens(documents(s, d))
      .select(col("doc_id"), col("lang"),
        size(col("tokens")).cast("long").as("n_tok"))
      .withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // integer `div`, not `/`: float division would round offsets past
      // 2^53 (a 100 TB corpus's token count), integral division cannot
      .withColumn("chunk_first", expr(s"`offset` div $PACK_CAP"))
      .withColumn("chunk_last", expr(s"(`offset` + n_tok - 1) div $PACK_CAP"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
  }
  private val qSeqPackSql =
    s"""WITH toks AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |off AS (
      |  SELECT doc_id, lang, n_tok,
      |         CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang
      |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
      |           AND 1 PRECEDING), 0) AS BIGINT) AS "offset"
      |  FROM toks)
      |SELECT doc_id, lang, n_tok, "offset",
      |       "offset" // $PACK_CAP AS chunk_first,
      |       ("offset" + n_tok - 1) // $PACK_CAP AS chunk_last,
      |       ("offset" + n_tok - 1) // $PACK_CAP - "offset" // $PACK_CAP + 1
      |         AS n_chunks
      |FROM off""".stripMargin

  // ------------------------------------------------------------ q_bm25
  /** Okapi BM25 keyword scoring over the corpus for a fixed query-term
    * set — the IR retrieval primitive beside the vector-similarity
    * family (`SimilarityOps`): lexical search needs no index build and
    * is the usual first-stage retriever in a hybrid stack.
    * `score(d) = Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
    * with the standard k1=1.2, b=0.75 and the +1-smoothed idf.
    *
    * 100 TB shape: the token stream filters to the broadcast query-term
    * set BEFORE any shuffle (the semi-join rides the scan — corpus-size
    * work is one projected pass), then per-(doc,term) tf aggregates and
    * the |Q|-row df table broadcasts back. Corpus stats (N, Σ|d|) are
    * one 1-row aggregate. Every score input is an exact integer; all
    * floating arithmetic is forced DOUBLE in both engines with the
    * identical expression shape, and the per-doc sum rounds to the 4dp
    * grid (summation-order ulps, the q_lm_perplexity precedent). No
    * top-k cut: the full scored posting set is returned, so no
    * ulp-at-the-boundary rank instability across engines. */
  private[llm] val BM25_TERMS = Seq("vector", "stream", "window")

  private def qBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dl = documents(s, d)
      .select($"doc_id", size(split(lower($"text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("sum_dl"))
    val tf = withTokens(documents(s, d))
      .select($"doc_id", explode($"tokens").as("tok"))
      .filter($"tok".isin(BM25_TERMS: _*))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df_), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)))
      .withColumn("part",
        $"idf" * ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" * $"n_docs" / $"sum_dl")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum($"part"), 4).as("score"))
  }
  private[llm] val qBm25Sql = {
    val terms = BM25_TERMS.map(t => s"'$t'").mkString(", ")
    """WITH dl AS (
      |  SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      |  FROM documents),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents)
      |  WHERE tok IN (TERMS_LIST) GROUP BY 1, 2),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |part AS (
      |  SELECT tf.doc_id,
      |    ln((n_docs - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)
      |       + 1.0::DOUBLE)
      |      * (tf.tf * 2.2::DOUBLE)
      |      / (tf.tf + 1.2::DOUBLE
      |         * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl * n_docs / sum_dl)) AS p
      |  FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), stats)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |       round(sum(p), 4) AS score
      |FROM part GROUP BY doc_id""".stripMargin
      .replace("TERMS_LIST", terms)
  }

  // ------------------------------------------------------ q_chunk_bm25
  /** Chunk-granular BM25 retrieval — the RAG composition: score the
    * [[qDocChunks]] sliding windows (not whole documents) against the
    * query terms and return the global top-[[CHUNK_K]] chunks WITH
    * provenance (doc_id, chunk_start), which is what a
    * retrieval-augmented pipeline actually feeds a context window.
    * Same BM25 shape as [[qBm25]] — term filter BEFORE any shuffle,
    * |terms|-row df and 1-row stats broadcasts — over the chunk
    * relation, whose explode is itself shuffle-free. Chunk-level df/
    * length stats differ from doc-level ones by design (that locality
    * is the point of chunk retrieval). The final global top-K window
    * runs over the scored-chunk table, already reduced to documents
    * containing query terms; ties in the 4dp score break on
    * (doc_id, chunk_start). */
  private[llm] val CHUNK_K = 10
  private def qChunkBm25(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val chunks = qDocChunks(s, d)
    val dl = chunks.select($"doc_id", $"chunk_start",
      $"n_chunk_tokens".as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_chunks"), sum($"dl").as("sum_dl"))
    val tf = chunks
      .select($"doc_id", $"chunk_start",
        explode(split(lower($"chunk_text"), " ")).as("tok"))
      .filter($"tok".isin(BM25_TERMS: _*))
      .groupBy($"doc_id", $"chunk_start", $"tok")
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"tok").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df_), "tok")
      .join(dl, Seq("doc_id", "chunk_start"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(($"n_chunks" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)))
      .withColumn("part",
        $"idf" * ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) +
            lit(0.75) * $"dl" * $"n_chunks" / $"sum_dl")))
      .groupBy($"doc_id", $"chunk_start")
      .agg(count(lit(1)).cast("long").as("n_terms"),
        round(sum($"part"), 4).as("score"))
    // global top-K + rank via RankOps.topK: TakeOrderedAndProject
    // (per-partition top-K, K-row merge — never a single-partition
    // sort of all scored chunks), rank attached over the bounded
    // CHUNK_K-row result with no window at all
    graft.operators.RankOps.topK(scored, CHUNK_K,
        Seq(("score", false), ("doc_id", true), ("chunk_start", true)),
        rankName = "rnk")
      .select($"rnk", $"doc_id", $"chunk_start", $"n_terms", $"score")
  }
  /** The chunk-BM25 CTE chain (everything up to the ranked top-K),
    * shared by [[qChunkBm25]]'s oracle and the context-expansion
    * oracle. */
  private val chunkBm25Ctes = {
    val terms = BM25_TERMS.map(t => s"'$t'").mkString(", ")
    s"""ch AS (
      |  SELECT d.doc_id, s.start AS chunk_start,
      |    least(len(d.t) - s.start, $CHUNK) AS dl,
      |    array_to_string(
      |      list_slice(d.t, s.start + 1, least(s.start + $CHUNK, len(d.t))),
      |      ' ') AS chunk_text
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) d,
      |       unnest(generate_series(0, len(d.t) - 1, $STRIDE)) AS s(start)),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_chunks,
      |                 CAST(sum(dl) AS BIGINT) AS sum_dl FROM ch),
      |tf AS (
      |  SELECT doc_id, chunk_start, tok, CAST(count(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, chunk_start,
      |          unnest(string_split(lower(chunk_text), ' ')) AS tok
      |        FROM ch)
      |  WHERE tok IN ($terms) GROUP BY 1, 2, 3),
      |df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |part AS (
      |  SELECT tf.doc_id, tf.chunk_start,
      |    ln((n_chunks - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE)
      |       + 1.0::DOUBLE)
      |      * (tf.tf * 2.2::DOUBLE)
      |      / (tf.tf + 1.2::DOUBLE
      |         * (0.25::DOUBLE + 0.75::DOUBLE * ch.dl * n_chunks / sum_dl))
      |      AS p
      |  FROM tf
      |  JOIN df USING (tok)
      |  JOIN ch ON ch.doc_id = tf.doc_id AND ch.chunk_start = tf.chunk_start,
      |  stats),
      |sc AS (
      |  SELECT doc_id, chunk_start, CAST(count(*) AS BIGINT) AS n_terms,
      |         round(sum(p), 4) AS score
      |  FROM part GROUP BY 1, 2),
      |hits AS (
      |  SELECT rnk, doc_id, chunk_start, n_terms, score
      |  FROM (SELECT *, CAST(row_number() OVER (ORDER BY score DESC,
      |          doc_id ASC, chunk_start ASC) AS BIGINT) AS rnk
      |        FROM sc)
      |  WHERE rnk <= $CHUNK_K)""".stripMargin
  }

  private[llm] val qChunkBm25Sql =
    s"""WITH $chunkBm25Ctes
      |SELECT rnk, doc_id, chunk_start, n_terms, score FROM hits""".stripMargin

  // --------------------------------------------------- q_expand_context
  /** RAG CONTEXT EXPANSION — the step after [[qChunkBm25]]: each
    * retrieval hit widens to a [STRIDE]-token margin on both sides
    * ([max(0, start−STRIDE), min(len, start+CHUNK+STRIDE))), sliced
    * DIRECTLY from the document token array rather than by stitching
    * neighboring chunks (whose STRIDE < CHUNK overlap would duplicate
    * tokens). What a retrieval pipeline actually puts in the prompt:
    * the scoring unit stays small (precision), the context unit grows
    * back around the match (recall for the reader).
    *
    * == 100 TB design ==
    * The K-row hit set BROADCASTS onto one pruned documents scan (only
    * doc_id+text read); the slice is per-row array arithmetic beside
    * that scan — no shuffle beyond [[qChunkBm25]]'s own. */
  private def qExpandContext(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hits = qChunkBm25(s, d)
      .select($"rnk", $"doc_id", $"chunk_start", $"score")
    documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .join(broadcast(hits), "doc_id")
      .withColumn("ctx_start", greatest($"chunk_start" - STRIDE, lit(0L)))
      .withColumn("n_ctx_tokens",
        least($"chunk_start" + (CHUNK + STRIDE),
          size($"toks").cast("long")) - $"ctx_start")
      .select($"rnk", $"doc_id", $"chunk_start", $"score",
        $"ctx_start", $"n_ctx_tokens",
        concat_ws(" ", slice($"toks", ($"ctx_start" + 1).cast("int"),
          $"n_ctx_tokens".cast("int"))).as("ctx_text"))
  }
  private[llm] val qExpandContextSql =
    s"""WITH $chunkBm25Ctes,
      |dd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |SELECT h.rnk, h.doc_id, h.chunk_start, h.score,
      |  CAST(greatest(h.chunk_start - $STRIDE, 0) AS BIGINT) AS ctx_start,
      |  CAST(least(h.chunk_start + ${CHUNK + STRIDE}, len(t))
      |       - greatest(h.chunk_start - $STRIDE, 0) AS BIGINT)
      |    AS n_ctx_tokens,
      |  array_to_string(list_slice(t,
      |    greatest(h.chunk_start - $STRIDE, 0) + 1,
      |    least(h.chunk_start + ${CHUNK + STRIDE}, len(t))), ' ')
      |    AS ctx_text
      |FROM hits h JOIN dd USING (doc_id)""".stripMargin

  // ---------------------------------------------------- q_ngram_diversity
  /** Corpus DIVERSITY profile per language slice: distinct-trigram
    * ratio (type/token ratio over word 3-grams) — the standing
    * self-repetition metric for a training mix. A slice dominated by
    * templated or machine-generated text shows a collapsing
    * distinct/total trigram ratio even when per-document quality gates
    * pass; model-collapse and synthetic-data audits (and Self-BLEU
    * studies) track exactly this corpus-level statistic.
    *
    * 100 TB shape: trigram generation is a shuffle-free per-row
    * `transform` (no explode-then-window), then ONE aggregation grid:
    * `count` is map-side partial and `count(DISTINCT gram)` plans as
    * the standard two-phase partial-distinct aggregate — the heavy
    * dedup happens on (lang, gram) partials before anything crosses
    * the wire. Output is |langs| rows. The ratio is exact integer
    * parts-per-million, bit-identical across engines. */
  private def qNgramDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withTokens(documents(s, d))
      .filter(size($"tokens") >= 3)
      .select($"lang", explode(expr(
        """transform(sequence(1, size(tokens) - 2),
          |  i -> concat_ws(' ', slice(tokens, i, 3)))""".stripMargin))
        .as("gram"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct($"gram").as("n_distinct"))
      .select($"lang", $"n_grams", $"n_distinct",
        expr("n_distinct * 1000000L div n_grams").as("diversity_ppm"))
  }
  private val qNgramDiversitySql =
    """WITH toks AS (
      |  SELECT lang, string_split(lower(text), ' ') AS t FROM documents),
      |grams AS (
      |  SELECT lang, array_to_string(list_slice(t, i, i + 2), ' ') AS gram
      |  FROM (SELECT * FROM toks WHERE len(t) >= 3),
      |       unnest(generate_series(1, len(t) - 2)) AS s(i))
      |SELECT lang, count(*) AS n_grams,
      |  count(DISTINCT gram) AS n_distinct,
      |  (count(DISTINCT gram) * 1000000) // count(*) AS diversity_ppm
      |FROM grams GROUP BY lang""".stripMargin

  // --------------------------------------------------- q_word_entropy
  /** Per-document word-distribution shape: Shannon entropy (nats), the
    * max-word repetition fraction, and the doc's distance from its own
    * uniform bound `ln(n_distinct)` — the "natural text or degenerate
    * repetition?" triple Gopher-style filters threshold on that
    * [[qTextStats]]'s type/token ratio alone can't see (a doc cycling
    * two words 50/50 has TTR ≈ 0 but also entropy ≈ ln 2, while a doc
    * that is 95% one filler word scores near 0 entropy).
    *
    * Determinism ([[qLmPerplexity]] precedent): each entropy term is
    * `tf/n · ln(tf/n)` on integer-derived doubles, summed PER DOC over
    * at most a few hundred same-magnitude terms, then rounded 4dp —
    * both engines fold identically at that resolution. Cost: one
    * explode + one (doc, word) hash aggregate, partial-aggregated
    * map-side; per-doc state is O(distinct words). At 100 TB this is
    * the same shuffle shape as [[qTextStats]] — per-doc rows, no
    * corpus-wide join. */
  private def qWordEntropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tf = withTokens(documents(s, d))
      .select($"doc_id", explode($"tokens").as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
    tf.groupBy($"doc_id").agg(
        sum($"tf").as("n_tok"),
        count(lit(1)).as("n_distinct"),
        max($"tf").as("max_tf"),
        // Σ tf·ln(tf), stabilized at 10dp before the per-doc finisher:
        // ~1e-13 fold-order noise on a ~1e2 sum, 1e-10 grid kills it.
        round(sum($"tf".cast("double") * log($"tf")), 10).as("sum_tlnt"))
      .select($"doc_id", $"n_tok", $"n_distinct",
        round(log($"n_tok") - $"sum_tlnt" / $"n_tok", 4).as("entropy_nats"),
        expr("max_tf * 1000000L div n_tok").as("top_word_ppm"),
        round(log(greatest($"n_distinct", lit(1L))), 4).as("max_entropy"))
  }
  private val qWordEntropySql =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |        FROM documents)
      |  WHERE length(tok) > 0
      |  GROUP BY 1, 2)
      |SELECT doc_id,
      |  CAST(sum(tf) AS BIGINT) AS n_tok,
      |  count(*) AS n_distinct,
      |  round(ln(CAST(sum(tf) AS BIGINT))
      |    - round(sum(CAST(tf AS DOUBLE) * ln(tf)), 10)
      |      / CAST(sum(tf) AS BIGINT), 4) AS entropy_nats,
      |  (max(tf) * 1000000) // CAST(sum(tf) AS BIGINT) AS top_word_ppm,
      |  round(ln(greatest(count(*), 1)), 4) AS max_entropy
      |FROM tf GROUP BY doc_id""".stripMargin

  // ------------------------------------------------- q_repetition_stats
  /** Within-document repetition metrics — the Gopher "rep." signal
    * family at n-gram granularity: duplicate-trigram fraction (1 −
    * distinct/total word 3-grams) and top-bigram mass, the two
    * thresholds that catch template/keyword-stuffed pages that
    * [[qWordEntropy]]'s unigram view under-penalizes (a page cycling
    * a 5-word phrase has healthy word entropy but ~100% duplicate
    * trigrams). The trigram side is pure per-row HOF arithmetic
    * (shuffle-free, codegen-riding); the bigram mode needs one
    * explode + (doc, bigram) hash aggregate — the qWordEntropy shuffle
    * shape, per-doc groups, no corpus-wide join. Exact integer ppm. */
  private def qRepetitionStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = withTokens(documents(s, d)).filter(size($"tokens") >= 3)
    val tri = base.select($"doc_id",
      (size($"tokens") - 2).cast("long").as("n_tri"),
      size(array_distinct(expr(
        """transform(sequence(1, size(tokens) - 2),
          |  i -> concat(element_at(tokens, i), ' ',
          |              element_at(tokens, i + 1), ' ',
          |              element_at(tokens, i + 2)))""".stripMargin)))
        .cast("long").as("n_tri_distinct"))
    val big = base
      .select($"doc_id", explode(expr(
        """transform(sequence(1, size(tokens) - 1),
          |  i -> concat(element_at(tokens, i), ' ',
          |              element_at(tokens, i + 1)))""".stripMargin)).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(max($"c").as("top_big"), sum($"c").as("n_big"))
    tri.join(big, "doc_id")
      .select($"doc_id", $"n_tri", $"n_tri_distinct",
        expr("(n_tri - n_tri_distinct) * 1000000L div n_tri").as("dup_tri_ppm"),
        expr("top_big * 1000000L div n_big").as("top_bigram_ppm"))
  }
  private val qRepetitionStatsSql =
    """WITH tk AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 3),
      |tri AS (
      |  SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS n_tri,
      |    CAST(len(list_distinct(list_transform(
      |      generate_series(1, len(t) - 2),
      |      i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])))) AS BIGINT)
      |      AS n_tri_distinct
      |  FROM tk),
      |bg AS (
      |  SELECT doc_id, concat(t[i], ' ', t[i + 1]) AS bg
      |  FROM tk, unnest(generate_series(1, len(t) - 1)) AS s(i)),
      |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
      |ba AS (SELECT doc_id, max(c) AS top_big,
      |              CAST(sum(c) AS BIGINT) AS n_big
      |       FROM bc GROUP BY 1)
      |SELECT doc_id, n_tri, n_tri_distinct,
      |  (n_tri - n_tri_distinct) * 1000000 // n_tri AS dup_tri_ppm,
      |  top_big * 1000000 // n_big AS top_bigram_ppm
      |FROM tri JOIN ba USING (doc_id)""".stripMargin

  // ---------------------------------------------------- q_pmi_bigrams
  /** Top word associations by pointwise mutual information — the
    * collocation statistic behind phrase detection (word2vec-style
    * phrase merging, multi-word tokenizer entries): for every adjacent
    * word pair seen ≥ [[PMI_MIN]] times, PMI = ln p(x,y) − ln p(x) −
    * ln p(y), ranked and cut at [[PMI_K]]. Corpus-scale shape: one
    * unigram aggregate, one bigram aggregate, two |vocab|-bounded
    * equi-joins; the ranking window runs over the ≥min-count pair
    * table, frequency-truncated far below corpus size.
    *
    * Determinism: PMI is a fixed SUM OF LOGS of integer-derived
    * doubles (never a product first — c_xy·N² overflows a long at
    * corpus scale, and a different factoring would round differently),
    * rounded 4dp; ties in the rounded score break on the pair text. */
  private val PMI_MIN = 5L
  private val PMI_K = 50
  private def qPmiBigrams(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ft = documents(s, d).select(
      expr("filter(split(lower(text), ' '), x -> length(x) > 0)").as("t"))
    val uc = ft.select(explode($"t").as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
    val nu = uc.agg(sum($"c").as("n_uni"))
    val bc = ft.filter(size($"t") >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(t) - 1),
          |  i -> struct(element_at(t, i) AS w1,
          |              element_at(t, i + 1) AS w2))""".stripMargin)).as("p"))
      .select($"p.w1", $"p.w2")
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c_xy"))
    val nb = bc.agg(sum($"c_xy").as("n_big"))
    val scored = bc.filter($"c_xy" >= PMI_MIN)
      .join(broadcast(uc.select($"w".as("w1"), $"c".as("c_x"))), "w1")
      .join(broadcast(uc.select($"w".as("w2"), $"c".as("c_y"))), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select($"w1", $"w2", $"c_xy",
        expr("round(ln(c_xy) + 2 * ln(n_uni) - ln(n_big) - ln(c_x) - ln(c_y), 4)")
          .as("pmi"))
    // global top-K + rank via RankOps.topK — TakeOrderedAndProject,
    // no single-partition sort of the scored-bigram relation
    graft.operators.RankOps.topK(scored, PMI_K,
        Seq(("pmi", false), ("w1", true), ("w2", true)),
        rankName = "rnk")
      .select($"rnk", $"w1", $"w2", $"c_xy", $"pmi")
  }
  private val qPmiBigramsSql =
    s"""WITH ft AS (
      |  SELECT list_filter(string_split(lower(text), ' '),
      |                     x -> length(x) > 0) AS t
      |  FROM documents),
      |uc AS (
      |  SELECT w, count(*) AS c
      |  FROM (SELECT unnest(t) AS w FROM ft) GROUP BY 1),
      |nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uc),
      |bc AS (
      |  SELECT w1, w2, count(*) AS c_xy
      |  FROM (SELECT t[i] AS w1, t[i + 1] AS w2
      |        FROM (SELECT t FROM ft WHERE len(t) >= 2),
      |             unnest(generate_series(1, len(t) - 1)) AS s(i))
      |  GROUP BY 1, 2),
      |nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_big FROM bc),
      |p AS (
      |  SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
      |    round(ln(c_xy) + 2 * ln(n_uni) - ln(n_big) - ln(ux.c) - ln(uy.c), 4)
      |      AS pmi
      |  FROM bc
      |  JOIN uc ux ON ux.w = bc.w1
      |  JOIN uc uy ON uy.w = bc.w2, nu, nb
      |  WHERE c_xy >= $PMI_MIN)
      |SELECT rnk, w1, w2, c_xy, pmi
      |FROM (SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, w1 ASC,
      |        w2 ASC) AS BIGINT) AS rnk
      |      FROM p)
      |WHERE rnk <= $PMI_K""".stripMargin

  // -------------------------------------------------------- q_zipf_fit
  /** Zipf's-law diagnostic: least-squares slope/intercept of
    * ln(frequency) on ln(rank) over the term table — natural corpora
    * fit slope ≈ −1, and a corpus whose slope collapses toward 0
    * (flat, templated vocabulary) or steepens sharply (a few tokens
    * dominating) fails quality review before any per-doc filter runs.
    * One vocabulary aggregate, one |V|-row ranking window, closed-form
    * fit — no iteration.
    *
    * Determinism: each point's (ln rank, ln freq) quantizes to the
    * MILLI-nat integer grid first, so the five fit sums accumulate as
    * exact order-free integers (milli keeps Σx² inside a long through
    * ~10⁶-term vocabularies), and both engines derive slope/intercept
    * from the same integers with one fixed expression sequence. */
  private def qZipfFit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // every term needs its global rank, so this is the distributed
    // exact-rank primitive (bucketed sort — no single-partition window
    // even at 10⁸-term vocabularies), not a top-K
    val uc = graft.operators.RankOps.withGlobalOrder(
      // staged once: the ranking passes read the |vocab|-row count
      // table from scratch parquet instead of re-tokenizing the corpus
      graft.operators.RankOps.staged(
        withTokens(documents(s, d))
          .select(explode($"tokens").as("w")).filter(length($"w") > 0)
          .groupBy($"w").agg(count(lit(1)).as("c")),
        "zipf-vocab", d),
      $"c", ascending = false, tiebreaks = Seq($"w"),
      rowNumCol = Some("rnk"))
    val pts = uc.select(
      expr("CAST(round(ln(rnk) * 1000) AS BIGINT)").as("x"),
      expr("CAST(round(ln(c) * 1000) AS BIGINT)").as("y"))
    pts.agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"n".as("n_terms"),
        expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)"""
          .stripMargin).as("slope"),
        expr("""round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE))
             |  / CAST(n AS DOUBLE) / 1000.0D, 6)""".stripMargin)
          .as("intercept"))
  }
  private val qZipfFitSql =
    """WITH uc AS (
      |  SELECT w, count(*) AS c
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0 GROUP BY w),
      |r AS (
      |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w ASC) AS BIGINT)
      |    AS rnk
      |  FROM uc),
      |pts AS (
      |  SELECT CAST(round(ln(rnk) * 1000) AS BIGINT) AS x,
      |         CAST(round(ln(c) * 1000) AS BIGINT) AS y
      |  FROM r),
      |s AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(x * y) AS BIGINT) AS sxy
      |  FROM pts)
      |SELECT n AS n_terms,
      |  round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6) AS slope,
      |  round((sy::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
      |    / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)) * sx::DOUBLE)
      |    / n::DOUBLE / 1000.0, 6) AS intercept
      |FROM s""".stripMargin

  // ----------------------------------------------------- q_len_profile
  /** Per-language token-length decile profile — the calibration table
    * sequence-packing and truncation configs are read off (pack length
    * should sit near a high decile of the lengths it will see, per
    * language, not a global guess). ntile(10) over the (n_tok, doc_id)
    * total order is deterministic; output is the |langs|×10 boundary
    * table: per decile its doc count and max token length. One window
    * shuffle partitioned by lang, |langs|·10-row output. */
  private def qLenProfile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    documents(s, d)
      .select($"doc_id", $"lang",
        size(split(lower($"text"), " ")).cast("long").as("n_tok"))
      .withColumn("dec", ntile(10).over(Window.partitionBy($"lang")
        .orderBy($"n_tok".asc, $"doc_id".asc)).cast("long"))
      .groupBy($"lang", $"dec")
      .agg(count(lit(1)).as("n_docs"), max($"n_tok").as("max_tok"))
  }
  private val qLenProfileSql =
    """SELECT lang, dec, count(*) AS n_docs, max(n_tok) AS max_tok
      |FROM (SELECT lang,
      |        CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tok,
      |        CAST(ntile(10) OVER (PARTITION BY lang
      |          ORDER BY len(string_split(lower(text), ' ')) ASC,
      |                   doc_id ASC) AS BIGINT) AS dec
      |      FROM documents)
      |GROUP BY lang, dec""".stripMargin

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_text_stats"      -> qTextStats _,
    "q_lang_id"         -> qLangId _,
    "q_lang_confusion"  -> qLangConfusion _,
    "q_token_count"     -> qTokenCount _,
    "q_doc_fingerprint" -> qDocFingerprint _,
    "q_corpus_prep"     -> qCorpusPrep _,
    "q_doc_chunks"      -> qDocChunks _,
    "q_top_terms"       -> qTopTerms _,
    "q_bpe_pairs"       -> qBpePairs _,
    "q_bpe_train"       -> qBpeTrain _,
    "q_bpe_encode"      -> qBpeEncode _,
    "q_vocab_coverage"  -> qVocabCoverage _,
    "q_seq_pack"        -> qSeqPack _,
    "q_ngram_diversity" -> qNgramDiversity _,
    "q_word_entropy"    -> qWordEntropy _,
    "q_repetition_stats" -> qRepetitionStats _,
    "q_pmi_bigrams"     -> qPmiBigrams _,
    "q_zipf_fit"        -> qZipfFit _,
    "q_len_profile"     -> qLenProfile _,
    "q_bm25"            -> qBm25 _,
    "q_chunk_bm25"      -> qChunkBm25 _,
    "q_expand_context"  -> qExpandContext _,
    "q_tokenizer_fertility" -> qTokenizerFertility _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_text_stats"      -> qTextStatsSql,
    "q_lang_id"         -> qLangIdSql,
    "q_lang_confusion"  -> qLangConfusionSql,
    "q_token_count"     -> qTokenCountSql,
    "q_doc_fingerprint" -> qDocFingerprintSql,
    "q_corpus_prep"     -> qCorpusPrepSql,
    "q_doc_chunks"      -> qDocChunksSql,
    "q_top_terms"       -> qTopTermsSql,
    "q_bpe_pairs"       -> qBpePairsSql,
    "q_bpe_train"       -> qBpeTrainSql,
    "q_bpe_encode"      -> qBpeEncodeSql,
    "q_vocab_coverage"  -> qVocabCoverageSql,
    "q_seq_pack"        -> qSeqPackSql,
    "q_ngram_diversity" -> qNgramDiversitySql,
    "q_word_entropy"    -> qWordEntropySql,
    "q_repetition_stats" -> qRepetitionStatsSql,
    "q_pmi_bigrams"     -> qPmiBigramsSql,
    "q_zipf_fit"        -> qZipfFitSql,
    "q_len_profile"     -> qLenProfileSql,
    "q_bm25"            -> qBm25Sql,
    "q_chunk_bm25"      -> qChunkBm25Sql,
    "q_expand_context"  -> qExpandContextSql,
    "q_tokenizer_fertility" -> qTokenizerFertilitySql)
}
