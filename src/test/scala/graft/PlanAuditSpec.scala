package graft

/** Plan-shape assertions — the 100 TB properties that must not regress:
  * column pruning reaches the scan, predicates push into parquet, tiny
  * sides broadcast, and per-row operators stay shuffle-free. These are
  * the checks a human would run with `.explain("formatted")`; encoding
  * them keeps the plans honest as the operators evolve. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("text operators scan only the referenced columns") {
    val p = plan("q_text_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"q_text_stats must prune to doc_id+text:\n$p")
    assert(!p.contains("Exchange"), "per-row text stats must not shuffle")
  }

  test("token counting and fingerprinting are shuffle-free single scans") {
    for (q <- Seq("q_token_count", "q_doc_fingerprint", "q_multimodal_meta")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("brute-force cosine broadcasts the query side") {
    val p = plan("q_topk_cosine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)"),
      s"vec_id split must push to parquet:\n$p")
  }

  test("point lookup pushes the key predicate into the scan") {
    val p = plan("q13_point_lookup")
    assert(p.contains("PushedFilters") && p.contains("o_orderkey"))
  }

  test("join-aggregate broadcasts the filtered dimension") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), s"customer side must broadcast:\n$p")
  }

  test("range filter pushes into the parquet scan") {
    // (the plan toString elides long PushedFilters lists, so assert on
    // the leading bound only)
    val p = plan("q2_filter_project")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"expected pushed range bound:\n$p")
  }

  test("doc chunking is a shuffle-free explode riding the scan") {
    val p = plan("q_doc_chunks")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected a generator (explode):\n$p")
  }

  test("distinctive-terms ranking broadcasts the vocabulary-sized df side") {
    val p = plan("q_top_terms")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"df join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"), p)
  }

  test("partition-pruned snapshot read opens only the pinned partition's files") {
    val df = SparkEntry.queries("q_partition_prune")(spark, sf)
    // the predicate pins event_type='click': every scanned file must sit
    // inside that partition's directory
    val files = df.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("event_type=click")),
      s"scan escaped the pinned partition:\n${files.mkString("\n")}")
  }

  test("gopher quality signals are a shuffle-free per-row scan") {
    val p = plan("q_gopher_quality")
    assert(!p.contains("Exchange"), s"per-row signals must not shuffle:\n$p")
  }

  test("boilerplate detection joins grams by key, never all-pairs") {
    val p = plan("q_boilerplate_ngrams")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"gram-frequency join must be a hash equi-join:\n$p")
  }

  test("decontamination broadcasts the eval gram set into the corpus probe") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"the tiny eval side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bloom point lookup opens only bloom-positive files") {
    val df = SparkEntry.queries("q_bloom_prune")(spark, sf)
    // the table lands as 8 hash-scattered files (every file spans ~the
    // full orderkey range — stats prune nothing); orderkey 1 has 4 rows,
    // so at most 4 true-positive files + ~0.9%-fpp strays may open
    val opened = df.inputFiles.length
    assert(opened >= 1 && opened <= 5,
      s"bloom should cut the 8-file scan to the hit files: opened $opened")
  }

  test("dup clustering builds on equi-joins only (no all-pairs anywhere)") {
    val p = plan("q_dup_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"label propagation must stay a hash equi-join:\n$p")
  }

  test("banded LSH candidates come from an equi-join, never a cross-join") {
    val p = plan("q_cosine_lsh")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH candidate generation must be a hash equi-join:\n$p")
    assert(p.contains("simhash_bands"),
      s"signatures must use the codegen'd expression:\n$p")
  }

  test("semantic dedup pairs only within clusters (equi-join on c_id)") {
    val p = plan("q_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"cluster-scoped pair generation must be a c_id equi-join:\n$p")
    assert(p.contains("cosinesimilarity"),
      s"verification must use the codegen'd cosine expression:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin"),
      s"pair generation must be a hash/merge equi-join on c_id:\n$p")
  }

  test("IVF probes broadcast against the materialized cell index") {
    val p = plan("q_ivf_cosine")
    assert(p.contains("BroadcastHashJoin"),
      s"the (tiny) probe set must broadcast into the cells join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"cell-partitioned candidates must never cross-join the corpus:\n$p")
  }

  test("persisted-index searches broadcast the query-derived sides, never cross-join the codes") {
    // PQ: the ADC LUT (queries x M x PQ_K) and the query norms must
    // broadcast into the codes join; the only corpus-wide work is the
    // codes scan + the per-(query,vector) fold
    val pq = plan("q_pq_index")
    assert(pq.contains("BroadcastHashJoin"),
      s"ADC must be a broadcast-LUT hash join over the codes:\n$pq")
    assert(!pq.contains("CartesianProduct"),
      s"PQ search must never cross-join raw vectors:\n$pq")
    // SQ8: brute-force over reconstructed codes with the query side
    // broadcast (the one legitimate broadcast nested loop: Q is tiny)
    val sq = plan("q_sq8_index")
    assert(sq.contains("BroadcastNestedLoopJoin") || sq.contains("BroadcastHashJoin"),
      s"SQ8 search must broadcast the query side:\n$sq")
    assert(!sq.contains("CartesianProduct"),
      s"SQ8 search must not plan a cartesian product:\n$sq")
  }

  test("the deliberately skewed join stays a shuffle join (the skew is real)") {
    val p = plan("q17_skew_aqe")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"merge hint must keep q17 a shuffle join so AQE owns the skew:\n$p")
  }

  test("running-total windows pay exactly one key shuffle") {
    val p = plan("q_running_total")
    assert(p.split("Exchange").length - 1 === 1,
      s"both window functions must share ONE user_id exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
  }

  test("corpus prep composes into one plan with exactly two window shuffles") {
    val p = plan("q_corpus_prep")
    assert(p.split("Exchange").length - 1 === 2,
      s"dedup (content_hash) + budget (lang) = two exchanges, no more:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>"),
      s"the scan must prune to the three referenced columns:\n$p")
  }

  test("windowed aggregation is a partial-aggregate plan, not a raw shuffle") {
    val p = plan("q_event_windows")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"window x type aggregation must hash-aggregate:\n$p")
    assert(p.split("Exchange").length - 1 === 1,
      s"one shuffle on the group keys:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // At 100 TB the win is real: a selective dimension filter becomes a
    // bloom filter EVALUATED INSIDE THE FACT SCAN, so non-joining fact
    // rows die before the shuffle instead of after it. The optimizer
    // gates injection on estimated sizes (application side > 10 GB by
    // default) — local test inputs never qualify, so the thresholds are
    // floored here to pin the REWRITE itself; production inherits the
    // size-gated defaults.
    val s = spark
    import s.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      // a broadcast join would reuse the build side as a DPP-style
      // filter instead; force the shuffle-join shape the rule targets
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dim = Tables.orders(spark, sf).filter($"o_orderpriority" === "1-URGENT")
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(org.apache.spark.sql.functions.sum($"l_quantity"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter on the fact side:\n$p")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("sequence packing is one window shuffle on the shard key, no global window") {
    val p = plan("q_seq_pack")
    // exactly one exchange: hashpartitioning on lang for the running
    // offset; a GLOBAL (partition-less) window would single-partition
    // the corpus at 100 TB
    assert(p.contains("hashpartitioning(lang"),
      s"the offset window must partition by the shard key:\n$p")
    assert(!p.contains("SinglePartition"),
      s"packing must never funnel into one partition:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ppjoin jaccard candidates come from equi-joins, never a cross-join") {
    val p = plan("q_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"prefix-filter candidates must stay an equi-join:\n$p")
  }

  test("incremental dedup pairs are equi-joins against the persisted index") {
    val p = plan("q_incr_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"delta-vs-index banding must stay an equi-join:\n$p")
  }

  test("corpus shuffle windows by shard — never a single-partition sort") {
    val p = plan("q_corpus_shuffle")
    assert(p.contains("hashpartitioning(shard"),
      s"the position window must partition by shard:\n$p")
    assert(!p.contains("SinglePartition"),
      s"a global shuffle must never funnel into one partition:\n$p")
  }

  test("containment probes are equi-joins on (lang, shingle), never all-pairs") {
    val p = plan("q_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"inner-prefix × inverted-index must stay an equi-join:\n$p")
  }

  test("temperature rebalance broadcasts thresholds; the corpus pass is one filter") {
    val p = plan("q_temperature_sample")
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤#langs threshold table must broadcast into the corpus scan:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must never shuffle for the threshold join:\n$p")
  }

  test("weighted sampling shuffles once (the per-language ranking) and no more") {
    val p = plan("q_weighted_sample")
    assert(p.contains("hashpartitioning(lang"),
      s"the quota window must partition by lang:\n$p")
    assert(!p.contains("SinglePartition"),
      s"per-stratum ranking must never funnel into one partition:\n$p")
    // exactly one exchange: the window's. Key derivation rides the scan.
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      s"expected only the ranking exchange (plus AQE read):\n$p")
  }

  test("segment dedup joins segments by key, never all-pairs") {
    val p = plan("q_segment_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      s"segment-frequency join must be a hash equi-join:\n$p")
  }

  test("classifier scoring is a shuffle-free pass over the narrow feature table") {
    val p = plan("q_quality_classifier")
    assert(!p.contains("Exchange"),
      s"scoring with frozen weights must ride the feature scan:\n$p")
  }

  test("triplet mining broadcasts the anchor set against the candidate scan") {
    val p = plan("q_triplet_mine")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the anchor side must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(vec_id)") ||
      p.contains("LessThan(vec_id"),
      s"the anchor split must push to parquet:\n$p")
  }

  test("k-anonymity: one rollup pass, ladder broadcast onto the fact scan") {
    val p = plan("q_k_anonymize")
    assert(p.contains("Expand"),
      s"the ladder counts must come from ONE rollup expand pass:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-group ladder must broadcast into the fact side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the fact table must never shuffle for the ladder join:\n$p")
  }

  test("cluster sampling broadcasts the codebook; only the cell window shuffles") {
    val p = plan("q_cluster_sample")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the codebook must broadcast into the assignment pass:\n$p")
    assert(p.contains("hashpartitioning(c_id"),
      s"the cap window must partition by cell:\n$p")
    assert(!p.contains("SinglePartition"),
      s"per-cell ranking must never funnel into one partition:\n$p")
  }

  test("ohlc bars: both direction windows and the aggregate share ONE exchange") {
    val p = plan("q_ohlc_bars")
    assert(p.split("Exchange").length - 1 === 1,
      s"asc window, desc window, and groupBy must reuse one (type, day) exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
  }

  test("time-weighted average: lead window and per-user aggregate share ONE exchange") {
    val p = plan("q_time_weighted_avg")
    assert(p.split("Exchange").length - 1 === 1,
      s"gap window + groupBy must share the user_id exchange:\n$p")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
  }

  test("markov transitions: per-user lag, then matrix-sized aggregates only") {
    val p = plan("q_markov_transitions")
    assert(!p.contains("Join"), s"no self-join for adjacency:\n$p")
    assert(p.split("Exchange").length - 1 <= 3,
      s"user window + two matrix-sized aggregates, no more:\n$p")
  }

  test("KS drift: distinct-value aggregate feeds per-type windows; totals broadcast") {
    val p = plan("q_drift_ks")
    assert(p.contains("BroadcastExchange"),
      s"the |types|-row totals must broadcast back:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-side shuffle join:\n$p")
    assert(!p.contains("SinglePartition"),
      s"cumulative counts must window per type, never one partition:\n$p")
  }

  test("winsorize: threshold table broadcasts onto a shuffle-free clip scan") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-group [p05,p95] table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the clip side must never shuffle for the join:\n$p")
  }

  test("pareto: suffix-max prune broadcasts; dominance verify is candidates-only broadcast") {
    val p = plan("q_pareto_select")
    assert(p.contains("BroadcastHashJoin"),
      s"the bucket suffix-max table must broadcast onto the scan:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the dominance anti-join must broadcast the candidate set:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast quadratic verify:\n$p")
  }

  test("curriculum order: offsets broadcast; no single-partition corpus window") {
    val p = plan("q_curriculum_order")
    assert(p.contains("BroadcastHashJoin"),
      s"the (stage, shard) offset table must broadcast:\n$p")
    assert(p.contains("hashpartitioning(stage"),
      s"ranking must window by (stage, shard):\n$p")
    // the only SinglePartition allowed is the |stages|x|shards|-row
    // offset cumulation, never the corpus rank itself
    assert(p.split("Exchange SinglePartition").length - 1 <= 1,
      s"at most the tiny offset table may single-partition:\n$p")
  }

  test("bigram LM: shuffle-free pair generation, model joins never all-pairs") {
    val p = plan("q_bigram_lm")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs anywhere in LM scoring:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"the corpus scan must prune to doc_id+text:\n$p")
  }

  test("ngram diversity: two-phase distinct aggregate, no join") {
    val p = plan("q_ngram_diversity")
    assert(!p.contains("Join"), s"no join belongs in this plan:\n$p")
    assert(p.split("Exchange").length - 1 <= 2,
      s"partial-distinct + final aggregate = at most two exchanges:\n$p")
  }

  test("engagement analytics: no cartesian products, marginals broadcast") {
    for (q <- Seq("q_active_users", "q_new_returning", "q_item_cooccur",
        "q_cohort_ltv", "q_survival_hazard")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q must not plan an all-pairs join:\n$p")
    }
    // co-occurrence marginals and the user count ride broadcasts; the
    // only shuffled join is the per-user self-join
    val p = plan("q_item_cooccur")
    assert(p.contains("BroadcastExchange"),
      s"item marginals must broadcast:\n$p")
  }

  test("triangle counting: wedge and closing joins are equi-joins only") {
    val p = plan("q_triangle_count")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"triangle counting must stay equi-join shaped:\n$p")
  }

  test("doc outlier: centroids broadcast onto a scoring scan, scan prunes") {
    val p = plan("q_doc_outlier")
    assert(p.contains("BroadcastExchange"),
      s"the |labels|-row centroid table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
  }

  test("ABC analysis: ranking reads the staged revenue table, total broadcasts") {
    // the lineitem aggregation runs ONCE into the staged parquet; the
    // ranking plan itself scans only the |parts|-row (partkey, revenue)
    // relation
    val p = plan("q_abc_analysis")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,rev_cents:bigint>"),
      s"ranking must scan the staged 2-column revenue table:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast:\n$p")
    assert(!p.contains("l_extendedprice"),
      s"the corpus aggregation must not re-run inside the ranking plan:\n$p")
  }

  test("data split is a shuffle-free pruned scan") {
    val p = plan("q_data_split")
    assert(!p.contains("Exchange"), s"split assignment must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"),
      s"scan must prune to doc_id+lang+source (no text):\n$p")
  }

  test("source cap shuffles once, on the source partition key") {
    val p = plan("q_source_cap")
    assert(p.contains("hashpartitioning(source"),
      s"window must partition by source:\n$p")
    assert(!p.contains("text"), s"scan must not read text:\n$p")
  }

  test("embedding health audits broadcast their single-row stats") {
    for (q <- Seq("q_embed_norms", "q_source_mix_kl")) {
      val p = plan(q)
      assert(p.contains("BroadcastExchange") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$q: corpus stats must ride a broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: no shuffled join for a 1-row side:\n$p")
    }
  }

  test("word entropy and repetition stats never join corpus-wide") {
    for (q <- Seq("q_word_entropy", "q_repetition_stats")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay per-doc shaped:\n$p")
    }
  }

  test("PMI scoring broadcasts the vocab-bounded marginals") {
    val p = plan("q_pmi_bigrams")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"unigram marginals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
  }

  test("chunk BM25: df/stats broadcast, no corpus-wide cartesian") {
    val p = plan("q_chunk_bm25")
    assert(p.contains("BroadcastExchange"),
      s"term-df and corpus stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the only nested-loop is the broadcast 1-row stats join:\n$p")
  }

  test("maintained chunk retrieval: term filter reaches the postings scan") {
    // the index's whole point: steady-state retrieval touches the |Q|
    // query terms' postings, never the corpus — the tok IN (...)
    // filter must push into the postings parquet scan, the df slice
    // and 1-row stats must broadcast, and the global top-K must plan
    // TakeOrderedAndProject (per-partition K-row merge), never a
    // single-partition sort of all scored chunks
    SparkEntry.prepares.get("q_chunk_refresh").foreach(_(spark, sf))
    val p = plan("q_chunk_index")
    assert("PushedFilters:.*In\\(tok".r.findFirstIn(p).isDefined,
      s"tok IN (...) must push into the postings scan:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"df slice and corpus stats must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-K must be TakeOrderedAndProject:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the broadcast 1-row stats nested loop is allowed:\n$p")
  }

  test("tokenizer fertility folds beside the scan; only the lang aggregate shuffles") {
    val p = plan("q_tokenizer_fertility")
    // one hash-aggregate exchange on lang, nothing else
    assert(p.split("Exchange hashpartitioning").length - 1 <= 1,
      s"exactly one shuffle (the |langs|-row aggregate):\n$p")
    assert(!p.contains("Join"), s"merge table is a literal, not a join:\n$p")
  }

  test("Holt forecast: one (type,day) aggregate then constant-bounded per-type fold") {
    val p = plan("q_holt_forecast")
    assert(!p.contains("Join"), s"no join anywhere:\n$p")
    assert(!p.contains("CartesianProduct"), s"no all-pairs:\n$p")
  }

  test("Markov anomaly: model broadcasts onto the per-user frame, no all-pairs") {
    val p = plan("q_markov_anomaly")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the |types|^2-row model must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-wide join:\n$p")
  }

  test("global-order rows plan NO partition-less window anywhere") {
    // The r9 scale hazard: a Window with an empty partition spec drags
    // the whole relation into ONE task. Every row that used to carry
    // one now goes through RankOps.withGlobalOrder (bucketed
    // distributed sort) or orderBy+limit (TakeOrderedAndProject), and
    // this test keeps them that way. Checked on the OPTIMIZED logical
    // plan so the assertion is AQE-independent and covers subqueries.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val fixed = Seq(
      "q_score_calibrate", "q_quantile_norm", "q_gini", "q_rfm",
      "q_abc_analysis", "q_budget_select", "q_chunk_bm25",
      "q_expand_context", "q_zipf_fit", "q_vocab_coverage",
      "q_pmi_bigrams", "q_top_terms")
    for (q <- fixed) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val bad = lp.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q plans ${bad.size} partition-less Window node(s):\n$lp")
    }
  }

  test("RRF legs and every rerank window plan a map-side group-limit trim") {
    // VERDICT r12 #1: the unfiltered RRF legs were the one remaining
    // corpus-scale full sort on a |Q|-cardinality key. With the
    // per-leg top-C cap (RRF over per-system top-C lists), EVERY
    // ranking window in both plans must carry Spark's two-phase
    // WindowGroupLimit — Partial below the exchange (map-side per-group
    // top-k pre-trim) and Final above — so reducer input is bounded at
    // partitions×C per query instead of the whole corpus.
    for (q <- Seq("q_hybrid_rrf", "q_rerank")) {
      val p = plan(q)
      val windows = "\\bWindow \\[".r.findAllIn(p).size
      val partial = "WindowGroupLimit.*Partial".r.findAllIn(p).size
      val fin = "WindowGroupLimit.*Final".r.findAllIn(p).size
      assert(windows > 0, s"$q plans no Window at all?\n$p")
      assert(partial == windows && fin == windows,
        s"$q: $windows windows but $partial Partial / $fin Final " +
          s"WindowGroupLimit trims — an unbounded per-group sort is back:\n$p")
    }
  }
}
