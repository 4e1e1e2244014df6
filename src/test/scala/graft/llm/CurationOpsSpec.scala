package graft.llm

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Semantic properties of the round-9 curation operators (the oracle
  * rows pin cross-engine content; these pin the invariants a user
  * relies on).
  */
class CurationOpsSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------ segment dedup
  test("segment dedup: kept counts bounded, drops happen, untouched docs round-trip") {
    val out = run("q_segment_dedup").cache()
    try {
      val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      val joined = out.join(docs, "doc_id").cache()
      try {
        assert(out.count() === docs.count()) // every doc present, even fully-scrubbed
        assert(out.filter(col("n_kept") > col("n_segs")).count() === 0)
        // the corpus genuinely contains cross-document boilerplate segments
        assert(out.filter(col("n_kept") < col("n_segs")).count() > 0)
        // a document with nothing dropped reassembles to its exact original text
        val untouched = joined.filter(col("n_kept") === col("n_segs"))
        assert(untouched.count() > 0)
        assert(untouched.filter(col("clean_text") =!= col("text")).count() === 0)
        // a scrubbed document's clean text is a strict subsequence: every kept
        // token run appears in the original, and it is shorter
        val scrubbed = joined.filter(col("n_kept") < col("n_segs"))
        assert(scrubbed.filter(length(col("clean_text")) >= length(col("text")))
          .count() === 0)
      } finally joined.unpersist()
    } finally out.unpersist()
  }

  // ------------------------------------------------- temperature sample
  test("temperature sample: rarest language kept whole, keep rates invert counts") {
    val docs = graft.Tables.documents(spark, sf)
    val out = run("q_temperature_sample").cache()
    try {
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("total"))
      val kept = out.groupBy("lang").agg(count(lit(1)).as("kept"))
      val byLang = counts.join(kept, Seq("lang"), "left")
        .na.fill(0L, Seq("kept"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val rarest = byLang.minBy(_._2)
      // (p_min/p_l)^0.5 with l = argmin gives rate 1.0: every doc survives
      assert(rarest._3 === rarest._2,
        s"rarest language ${rarest._1} must be kept in full, got $byLang")
      // larger languages keep a smaller fraction (monotone rebalance)
      val rates = byLang.sortBy(_._2).map { case (_, t, k) => k.toDouble / t }
      rates.sliding(2).foreach { case Seq(a, b) => assert(a >= b - 0.1) }
      // the head language is genuinely damped
      val head = byLang.maxBy(_._2)
      assert(head._3.toDouble / head._2 < 0.75)
    } finally out.unpersist()
  }

  // ---------------------------------------------------- weighted sample
  test("weighted A-ES sample: exact per-stratum quota, deterministic winners") {
    val out = run("q_weighted_sample").cache()
    try {
      val perLang = out.groupBy("lang").agg(count(lit(1)).as("n"),
        max(col("rank")).as("maxr")).collect()
      perLang.foreach { r =>
        assert(r.getLong(1) === 20L, s"lang ${r.getString(0)} quota")
        assert(r.getLong(2) === 20L) // ranks are 1..K with no gaps
      }
      val again = run("q_weighted_sample")
      assert(out.exceptAll(again).count() === 0)
      assert(again.exceptAll(out).count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------------- drift monitor
  test("drift PSI: non-negative, bucket counts exact, stable feed reads stable") {
    val out = run("q_drift_psi").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set("value", "event_type"))
    // PSI is a sum of (p-q)ln(p/q) terms, each ≥ 0
    out.values.foreach { case (_, psi) => assert(psi >= 0.0) }
    // groupBy emits only buckets observed in the data (empty-on-both-
    // sides buckets carry no count evidence); the fixed edges cap at 10
    assert(out("value")._1 >= 1L && out("value")._1 <= 10L)
    assert(out("event_type")._1 === 5L)
    // the synthetic feed is stationary: both columns must read "stable"
    out.values.foreach { case (_, psi) => assert(psi < 0.1) }
  }

  // ------------------------------------------------------ graph PageRank
  test("graph rank: fixed-point mass conserved within truncation, deterministic") {
    val out = run("q_graph_rank").cache()
    try {
      val n = out.count()
      assert(n > 0, "near-dup graph is empty at this sf")
      assert(out.filter(col("rank_fp") <= 0L).count() === 0)
      // total rank mass: N·(SCALE/N) at start; each iteration keeps
      // 0.15 + 0.85 of it minus integer-truncation leakage (< 1 unit
      // per edge per iteration — utterly negligible at 10^12 scale)
      val mass = out.agg(sum(col("rank_fp"))).head().getLong(0)
      val scale = 1000000000000L
      assert(math.abs(mass - scale).toDouble / scale < 0.01,
        s"rank mass $mass drifted from $scale")
      val again = run("q_graph_rank")
      assert(out.exceptAll(again).count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------ incremental drift view
  test("incremental drift view converges to the from-scratch PSI") {
    val batch = run("q_drift_psi")
    val incr = run("q_drift_incr")
    assert(incr.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(incr).count() === 0)
  }

  // ------------------------------------------------------ triplet mining
  test("triplet mining: one triplet per eligible anchor, flags consistent") {
    val out = run("q_triplet_mine").cache()
    try {
      assert(out.count() === 32L) // every anchor label has positives+negatives here
      assert(out.filter(col("pos_id") === col("anchor_id")).count() === 0)
      assert(out.filter(col("neg_id") === col("anchor_id")).count() === 0)
      // violation flag consistent with the reported (rounded) cosines,
      // up to the 1e-6 rounding grid at the margin boundary
      assert(out.filter(col("violation") &&
        col("cos_neg") <= col("cos_pos") - lit(0.05) - lit(2e-6)).count() === 0)
      assert(out.filter(!col("violation") &&
        col("cos_neg") >= col("cos_pos") - lit(0.05) + lit(2e-6)).count() === 0)
      // hardest positive really is the in-class argmin: no same-label
      // candidate scores below the reported cos_pos (re-derived directly)
      val emb = graft.Tables.embeddings(spark, sf)
      val a = emb.filter(col("vec_id") < 32)
        .select(col("vec_id").as("anchor_id"), col("label").as("al"),
          col("embedding").as("ae"))
      val c = emb.select(col("vec_id").as("cid"), col("label").as("cl"),
        col("embedding").as("ce"))
      graft.functions.GraftFunctions.register(spark)
      val minPos = c.crossJoin(a)
        .filter(col("cid") =!= col("anchor_id") && col("cl") === col("al"))
        .withColumn("cos", expr("cosine_sim(ae, ce)"))
        .groupBy("anchor_id").agg(min(col("cos")).as("true_min"))
      val cmp = out.join(minPos, "anchor_id")
        .filter(abs(col("cos_pos") - col("true_min")) > 1e-5)
      assert(cmp.count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------- quality classifier
  test("quality classifier: distributed GD converges and scores are calibrated") {
    val out = run("q_quality_classifier").cache()
    try {
      assert(out.filter(col("score") < 0.0 || col("score") > 1.0).count() === 0)
      // pred is exactly the 0.5 threshold of the (pre-rounding) score;
      // allow the rounded column's boundary either way
      assert(out.filter(col("pred") && col("score") < 0.4999).count() === 0)
      assert(out.filter(!col("pred") && col("score") > 0.5001).count() === 0)
      val n = out.count()
      val correct = out.filter(col("pred") === (col("label") === 1L)).count()
      assert(correct.toDouble / n > 0.9,
        s"train accuracy ${correct.toDouble / n} — GD failed to converge")
    } finally out.unpersist()
  }
}
