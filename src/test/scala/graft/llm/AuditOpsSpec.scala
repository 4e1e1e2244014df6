package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic invariants of the corpus/index AUDIT operators (entropy,
  * mix-KL, cross-source overlap, embedding health, lang-ID confusion,
  * lifecycle accounting, calibration, dup weights). The oracle rows pin
  * cross-engine content; these pin the identities a user relies on.
  */
class AuditOpsSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------ word entropy
  test("word entropy: 0 ≤ entropy ≤ ln(n_distinct), counts consistent") {
    val out = run("q_word_entropy").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("entropy_nats") > col("max_entropy") + 1e-4).count() === 0)
      assert(out.filter(col("entropy_nats") < -1e-9).count() === 0)
      assert(out.filter(col("n_distinct") > col("n_tok")).count() === 0)
      // top-word fraction is a valid ppm and consistent with entropy's
      // degenerate end: a doc that is one repeated word has entropy 0
      assert(out.filter(col("top_word_ppm") > 1000000L).count() === 0)
      assert(out.filter(col("top_word_ppm") === 1000000L &&
        col("entropy_nats") =!= 0.0).count() === 0)
    } finally out.unpersist()
  }

  // ----------------------------------------------------- source mix KL
  test("source mix KL: truncated shares conserve mass, contribution signs follow shares") {
    val out = run("q_source_mix_kl").cache()
    try {
      val k = out.count()
      assert(k > 1)
      val tot = out.agg(sum("share_ppm")).first().getLong(0)
      // div-truncated ppm shares lose < 1 ppm per source
      assert(tot <= 1000000L && tot > 1000000L - k)
      // p > q ⇒ p·ln(p/q) ≥ 0; p < q ⇒ ≤ 0 (6dp rounding can park tiny
      // contributions at exactly 0, so the sign tests are non-strict)
      assert(out.filter(col("share_ppm") > col("target_ppm") &&
        col("kl_contrib") < -1e-9).count() === 0)
      assert(out.filter(col("share_ppm") < col("target_ppm") &&
        col("share_ppm") > 0 && col("kl_contrib") > 1e-9).count() === 0)
    } finally out.unpersist()
  }

  // ---------------------------------------------------- source overlap
  test("source overlap: ordered pairs, jaccard ≤ containment ≤ 1, shared ≤ min set") {
    val out = run("q_source_overlap").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("source_a") >= col("source_b")).count() === 0)
      assert(out.filter(col("jaccard_ppm") > col("containment_ppm")).count() === 0)
      assert(out.filter(col("containment_ppm") > 1000000L).count() === 0)
      assert(out.filter(col("n_shared") > least(col("n_a"), col("n_b"))).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- embed dim stats
  test("embed dim stats: one row per dimension covering every vector, moments ordered") {
    val out = run("q_embed_dim_stats").cache()
    try {
      val nVecs = graft.Tables.embeddings(spark, sf).count()
      assert(out.count() === 64L)
      assert(out.filter(col("n") =!= nVecs).count() === 0)
      assert(out.filter(col("std_val") < 0.0).count() === 0)
      assert(out.filter(col("min_val") > col("mean_val") ||
        col("mean_val") > col("max_val")).count() === 0)
      assert(out.filter(col("n_zero") > col("n")).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- lang confusion
  test("lang confusion: cells partition the corpus, row shares fill each row") {
    val out = run("q_lang_confusion").cache()
    try {
      val nDocs = graft.Tables.documents(spark, sf).count()
      assert(out.agg(sum("n_docs")).first().getLong(0) === nDocs)
      assert(out.filter(col("is_diagonal")).count() > 0)
      // per actual language the truncated shares lose < 1 ppm per cell
      val rows = out.groupBy("actual_lang")
        .agg(sum("row_share_ppm").as("s"), count(lit(1)).as("cells"))
      assert(rows.filter(col("s") > 1000000L).count() === 0)
      assert(rows.filter(col("s") <= lit(1000000L) - col("cells")).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- user lifecycle
  test("user lifecycle: wau decomposes, first week all-new, last week all-churning") {
    val out = run("q_user_lifecycle").cache()
    try {
      assert(out.count() > 1)
      assert(out.filter(col("wau") =!=
        col("n_new") + col("n_retained") + col("n_resurrected")).count() === 0)
      val first = out.orderBy(col("week").asc).first()
      assert(first.getAs[Long]("n_new") === first.getAs[Long]("wau"))
      val last = out.orderBy(col("week").desc).first()
      assert(last.getAs[Long]("n_churning_out") === last.getAs[Long]("wau"))
      // weekly actives reconcile against a direct distinct count
      val direct = graft.Tables.events(spark, sf)
        .select(col("user_id"),
          expr(s"unix_micros(ts) div ${7L * 86400000000L}L").as("week"))
        .distinct().groupBy("week").agg(count(lit(1)).as("w2"))
      assert(out.join(direct, "week").filter(col("wau") =!= col("w2"))
        .count() === 0)
    } finally out.unpersist()
  }

  // -------------------------------------------------- score calibrate
  test("score calibrate: ppm bounds, each source anchors at percentile 0") {
    val out = run("q_score_calibrate").cache()
    try {
      assert(out.count() === graft.Tables.documents(spark, sf).count())
      assert(out.filter(col("src_pct_ppm") < 0 ||
        col("src_pct_ppm") > 1000000L).count() === 0)
      assert(out.filter(col("global_pct_ppm") < 0 ||
        col("global_pct_ppm") > 1000000L).count() === 0)
      val mins = out.groupBy("source").agg(min("src_pct_ppm").as("m"))
      assert(mins.filter(col("m") =!= 0L).count() === 0)
      assert(out.filter(col("shift_ppm") =!=
        col("src_pct_ppm") - col("global_pct_ppm")).count() === 0)
    } finally out.unpersist()
  }

  // ----------------------------------------------------- data split
  test("data split: exhaustive, deterministic, thresholds respected") {
    val out = run("q_data_split").cache()
    try {
      assert(out.count() === graft.Tables.documents(spark, sf).count())
      assert(out.filter(col("split") === "train" &&
        col("bucket") >= 52429).count() === 0)
      assert(out.filter(col("split") === "test" &&
        col("bucket") < 58982).count() === 0)
      // pure function of doc_id: a second run assigns identically
      val again = run("q_data_split")
        .select(col("doc_id"), col("split").as("split2"))
      assert(out.join(again, "doc_id")
        .filter(col("split") =!= col("split2")).count() === 0)
      // all three splits materialize at the fixture's size
      assert(out.select("split").distinct().count() === 3)
    } finally out.unpersist()
  }

  // ------------------------------------------------ repetition stats
  test("repetition stats: ppm bounds and distinct ≤ total") {
    val out = run("q_repetition_stats").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("n_tri_distinct") > col("n_tri")).count() === 0)
      assert(out.filter(col("dup_tri_ppm") < 0 ||
        col("dup_tri_ppm") > 1000000L).count() === 0)
      assert(out.filter(col("top_bigram_ppm") <= 0 ||
        col("top_bigram_ppm") > 1000000L).count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------- survivor stats
  test("survivor stats: kept ≤ total, reconciles with dup clusters") {
    val out = run("q_survivor_stats").cache()
    try {
      assert(out.filter(col("n_kept") > col("n_docs")).count() === 0)
      assert(out.filter(col("tok_kept") > col("tok_total")).count() === 0)
      val nDocs = graft.Tables.documents(spark, sf).count()
      assert(out.agg(sum("n_docs")).first().getLong(0) === nDocs)
      // kept total = corpus − (cluster members − clusters)
      val labels = run("q_dup_clusters").cache()
      try {
        val members = labels.count()
        val clusters = labels.select("cluster_id").distinct().count()
        assert(out.agg(sum("n_kept")).first().getLong(0) ===
          nDocs - (members - clusters))
      } finally labels.unpersist()
    } finally out.unpersist()
  }

  // -------------------------------------------------- budget select
  test("budget select: prefix under budget, boundary tight, cum monotone") {
    val out = run("q_budget_select").cache()
    try {
      val budget = {
        val total = out.agg(sum("n_tok")).first().getLong(0)
        total / 5
      }
      assert(out.filter(col("selected")).count() > 0)
      assert(out.filter(col("selected") &&
        col("cum_tok") > budget).count() === 0)
      // the first excluded document would have crossed the budget
      val minUnsel = out.filter(!col("selected"))
        .agg(min("cum_tok")).first().getLong(0)
      assert(minUnsel > budget)
    } finally out.unpersist()
  }

  // ------------------------------------------------------- lsh eval
  test("lsh eval: tp bounded by both sides, ppm well-formed") {
    val out = run("q_lsh_eval").cache()
    try {
      val r = out.first()
      val (nc, nt, tp) = (r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_tp"))
      assert(tp <= nc && tp <= nt)
      assert(r.getAs[Long]("precision_ppm") <= 1000000L)
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
      // the banded scheme must actually surface exact dups here
      assert(nt > 0 && tp > 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------- eval leakage
  test("eval leakage: pair mass conserved, leak flag consistent") {
    val out = run("q_eval_leakage").cache()
    try {
      val totalPairs = run("q_minhash_lsh").count()
      assert(out.agg(sum("n_pairs")).first().getLong(0) === totalPairs)
      assert(out.filter(col("is_leak") =!=
        (col("split_a") =!= col("split_b"))).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- source cap
  test("source cap: dense per-source ranks, kept = min(K, group size)") {
    val out = run("q_source_cap").cache()
    try {
      assert(out.count() === graft.Tables.documents(spark, sf).count())
      val per = out.groupBy("source").agg(
        count(lit(1)).as("n"), max("rnk").as("maxr"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nk"))
      assert(per.filter(col("maxr") =!= col("n")).count() === 0)
      assert(per.filter(col("nk") =!= least(lit(15L), col("n"))).count() === 0)
    } finally out.unpersist()
  }

  // -------------------------------------------------- embed norms
  test("embed norms: every vector scored, non-negative, outliers a minority") {
    val out = run("q_embed_norms").cache()
    try {
      val n = graft.Tables.embeddings(spark, sf).count()
      assert(out.count() === n)
      assert(out.filter(col("norm_val") < 0.0).count() === 0)
      assert(out.filter(col("is_outlier")).count() < n / 10)
    } finally out.unpersist()
  }

  // -------------------------------------------------- pmi bigrams
  test("pmi bigrams: dense ranks, min-count respected, score non-increasing") {
    val out = run("q_pmi_bigrams").cache()
    try {
      val k = out.count()
      assert(k > 0 && k <= 50)
      assert(out.agg(max("rnk")).first().getLong(0) === k)
      assert(out.filter(col("c_xy") < 5L).count() === 0)
      val rows = out.orderBy(col("rnk").asc).select("pmi")
        .collect().map(_.getDouble(0))
      assert(rows.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    } finally out.unpersist()
  }

  // ------------------------------------------- field completeness
  test("field completeness: rows partition events, ppm bounded") {
    val out = run("q_field_completeness").cache()
    try {
      val nEvents = graft.Tables.events(spark, sf).count()
      assert(out.agg(sum("n")).first().getLong(0) === nEvents)
      for (c <- Seq("value_null_ppm", "props_empty_ppm", "props_k_ppm"))
        assert(out.filter(col(c) < 0 || col(c) > 1000000L).count() === 0,
          s"$c out of range")
      assert(out.filter(col("n_users") > col("n")).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- zipf fit
  test("zipf fit: negative slope, intercept anchors near the top frequency") {
    val out = run("q_zipf_fit").cache()
    try {
      val r = out.first()
      assert(r.getAs[Long]("n_terms") > 1)
      val slope = r.getAs[Double]("slope")
      assert(slope < 0.0, s"frequency must fall with rank, got $slope")
      // intercept ≈ ln(top frequency): within an order of magnitude
      val topC = graft.Tables.documents(spark, sf)
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").count().agg(max("count")).first().getLong(0)
      assert(math.abs(r.getAs[Double]("intercept") - math.log(topC.toDouble)) < 2.5)
    } finally out.unpersist()
  }

  // ------------------------------------------------ length profile
  test("length profile: 10 deciles per language, boundaries non-decreasing") {
    val out = run("q_len_profile").cache()
    try {
      val langs = graft.Tables.documents(spark, sf)
        .select("lang").distinct().count()
      assert(out.select("lang").distinct().count() === langs)
      // per language: deciles 1..10, max_tok non-decreasing with decile
      val bad = out.as("a").join(out.as("b"),
        col("a.lang") === col("b.lang") && col("a.dec") < col("b.dec") &&
          col("a.max_tok") > col("b.max_tok"))
      assert(bad.count() === 0)
      assert(out.groupBy("lang").count().filter(col("count") =!= 10L)
        .count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------- sim calibration
  test("sim calibration: levels in [4,8], jaccard mean within min/max") {
    val out = run("q_sim_calibration").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(col("est_k") < 4L || col("est_k") > 8L).count() === 0)
      assert(out.filter(col("avg_jaccard_ppm") < col("min_jaccard_ppm") ||
        col("avg_jaccard_ppm") > col("max_jaccard_ppm")).count() === 0)
      assert(out.filter(col("max_jaccard_ppm") > 1000000L).count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------- incremental monitors
  test("mix-KL view: maintained result equals the batch recompute") {
    val a = run("q_source_mix_kl").orderBy("source").collect()
    val b = run("q_mix_kl_incr").orderBy("source").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("completeness view: totals reconcile with the surviving row set") {
    val out = run("q_completeness_incr").cache()
    try {
      val kept = graft.Tables.events(spark, sf)
        .filter(col("event_id") % 17 =!= 3)
      assert(out.agg(sum("n")).first().getLong(0) === kept.count())
      assert(out.filter(col("n_users") > col("n")).count() === 0)
      for (c <- Seq("value_null_ppm", "props_empty_ppm", "props_k_ppm"))
        assert(out.filter(col(c) < 0 || col(c) > 1000000L).count() === 0)
    } finally out.unpersist()
  }

  // --------------------------------------------------- dataset card
  test("dataset card: counts reconcile with the corpus") {
    val out = run("q_dataset_card").first()
    val docs = graft.Tables.documents(spark, sf)
    assert(out.getAs[Long]("n_docs") === docs.count())
    assert(out.getAs[Long]("n_sources") ===
      docs.select("source").distinct().count())
    assert(out.getAs[Long]("n_langs") ===
      docs.select("lang").distinct().count())
    assert(out.getAs[Long]("n_exact_dups") >= 0L)
    assert(out.getAs[Long]("mean_tokens") ===
      out.getAs[Long]("n_tokens") / out.getAs[Long]("n_docs"))
  }

  // ------------------------------------------------- quantile norm
  test("quantile norm: count preserved, each source spans the global range") {
    val out = run("q_quantile_norm").cache()
    try {
      val docs = graft.Tables.documents(spark, sf)
      assert(out.count() === docs.count())
      val gmin = docs.agg(min("n_chars")).first().getLong(0)
      val gmax = docs.agg(max("n_chars")).first().getLong(0)
      val per = out.groupBy("source")
        .agg(min("norm_chars").as("lo"), max("norm_chars").as("hi"))
      assert(per.filter(col("lo") =!= gmin).count() === 0)
      assert(per.filter(col("hi") =!= gmax).count() === 0)
    } finally out.unpersist()
  }

  // ---------------------------------------------- source lang mix
  test("source lang mix: entropy bounded by ln(k), docs conserve") {
    val out = run("q_source_lang_mix").cache()
    try {
      val nDocs = graft.Tables.documents(spark, sf).count()
      assert(out.agg(sum("n_docs")).first().getLong(0) === nDocs)
      assert(out.filter(col("lang_entropy") < -1e-9).count() === 0)
      assert(out.filter(col("lang_entropy") >
        log(col("n_langs").cast("double")) + 1e-4).count() === 0)
    } finally out.unpersist()
  }

  // ---------------------------------------------------- chunk bm25
  test("chunk bm25: dense top-k, scores non-increasing, provenance resolvable") {
    val out = run("q_chunk_bm25").cache()
    try {
      val k = out.count()
      assert(k > 0 && k <= 10)
      assert(out.agg(max("rnk")).first().getLong(0) === k)
      val scores = out.orderBy(col("rnk").asc).select("score")
        .collect().map(_.getDouble(0))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      // every hit's (doc_id, chunk_start) resolves to a real chunk
      val chunks = run("q_doc_chunks")
        .select(col("doc_id"), col("chunk_start"))
      assert(out.join(chunks, Seq("doc_id", "chunk_start"), "left_anti")
        .count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------ context expansion
  test("context expansion: covers every hit, margins bounded, token count exact") {
    val out = run("q_expand_context").cache()
    try {
      val hits = run("q_chunk_bm25")
        .select(col("rnk"), col("doc_id"), col("chunk_start"),
          col("n_terms").as("nt"))
      // exactly the hit set, one context per hit
      assert(out.count() === hits.count())
      assert(out.join(hits, Seq("rnk", "doc_id", "chunk_start"), "left_anti")
        .count() === 0)
      out.collect().foreach { r =>
        val (cs, ctxS, nCtx) = (r.getLong(2), r.getLong(4), r.getLong(5))
        val ctxText = r.getString(6)
        assert(ctxS <= cs, "context must start at or before the chunk")
        assert(ctxS >= math.max(cs - 20L, 0L), "left margin bounded by STRIDE")
        assert(nCtx >= 1 && nCtx <= 30L + 2 * 20L, "window bounded")
        assert(ctxText.split(" ", -1).length.toLong === nCtx,
          "n_ctx_tokens must equal the emitted token count")
      }
    } finally out.unpersist()
  }

  // ------------------------------------------------- cluster weights
  test("cluster weights: every doc weighted once, weight = 1e6 div size, dups downweighted") {
    val out = run("q_cluster_weights").cache()
    try {
      assert(out.count() === graft.Tables.documents(spark, sf).count())
      assert(out.filter(col("weight_ppm") =!=
        expr("1000000L div cluster_size")).count() === 0)
      assert(out.filter(col("cluster_size") === 1L &&
        col("weight_ppm") =!= 1000000L).count() === 0)
      assert(out.filter(col("cluster_size") < 1L).count() === 0)
    } finally out.unpersist()
  }
}
