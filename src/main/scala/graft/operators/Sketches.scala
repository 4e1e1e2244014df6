package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryModule, Tables}

/** Approximate, MERGEABLE aggregate sketches — the single-pass answer
  * to "how many distinct users / what's the p99" at 100 TB, where exact
  * distinct counting shuffles every key and exact percentiles sort the
  * world.
  *
  * The operative property is mergeability, not just approximation:
  * `hll_sketch_agg` (Apache DataSketches HLL, built into Spark 4)
  * produces a BINARY sketch per group that `hll_union_agg` combines
  * without leaving the HLL error envelope (register states may differ
  * from a one-shot sketch — sparse→dense promotion timing — but the
  * accuracy bound survives the merge, which is the property that
  * matters) — partial aggregation works map-side like any sum, daily
  * sketches roll up into monthly ones without rescanning history, and a
  * grand total falls out of the per-group sketches instead of a second
  * pass over the input. `q_hll_distinct` demonstrates exactly that
  * shape: one scan → per-group sketches → estimates, plus an ALL row
  * computed by unioning the group sketches.
  *
  * Estimates are deterministic (HLL register updates are
  * order-independent maxima, so cluster parallelism and row order don't
  * change the result) but engine-specific, so the sketch bytes and raw
  * estimates cannot be hashed cross-engine. The driver gate instead
  * verifies the accuracy CONTRACT quantitatively: the query emits the
  * exact distinct count beside a `within_2pct` flag derived from the
  * sketch, and the DuckDB oracle computes the same exact count with
  * `within_2pct = TRUE` — a sketch outside its error envelope (or a
  * lossy union) flips the flag and fails the hash. SketchesSpec
  * additionally pins the raw estimates, the lossless union property,
  * and `percentile_approx`'s rank-error bound. The exact counts here
  * exist only to power the gate; production callers use
  * [[hllEstimates]], which is the one-scan sketch-only path.
  */
object Sketches extends QueryModule {
  import Tables._

  /** Per-returnflag HLL sketches + estimates, with the grand total
    * unioned FROM the group sketches (no second scan). The production
    * shape: one pass, mergeable partials, ALL row from sketch union. */
  def hllEstimates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketches = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
    val perGroup = sketches.select($"l_returnflag",
      hll_sketch_estimate($"sk").as("approx_distinct"))
    val total = sketches.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("approx_distinct"))
      .select(lit("ALL").as("l_returnflag"), $"approx_distinct")
    perGroup.unionAll(total)
  }

  /** Driver-gate variant: joins the sketch estimates with exact
    * distinct counts and reduces the engine-specific estimate to a
    * cross-engine-hashable accuracy verdict. An order's lineitems can
    * carry different return flags, so the ALL exact count is its own
    * aggregation, not a sum of the groups — same as the oracle's. */
  private def qHllDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val exactGroups = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact_distinct"))
    val exactAll = lineitem(s, d)
      .agg(countDistinct($"l_orderkey").as("exact_distinct"))
      .select(lit("ALL").as("l_returnflag"), $"exact_distinct")
    hllEstimates(s, d)
      .join(exactGroups.unionAll(exactAll), Seq("l_returnflag"))
      .select($"l_returnflag", $"exact_distinct",
        (abs($"approx_distinct" - $"exact_distinct") <=
          $"exact_distinct" * 0.02).as("within_2pct"))
  }

  private val qHllDistinctSql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_distinct,
      |       TRUE AS within_2pct
      |FROM lineitem GROUP BY l_returnflag
      |UNION ALL
      |SELECT 'ALL', count(DISTINCT l_orderkey), TRUE FROM lineitem""".stripMargin

  // ---------------------------------------------------- q_hist_quantiles
  /** Mergeable histogram quantile sketch — the single-pass answer to
    * "what's the p99" at 100 TB, where the exact answer
    * (q15_percentiles) sorts every group. A fixed 256-bucket equi-width
    * histogram over the column's global [min, max]:
    *
    *   - '''one scan''': bucket assignment is per-row arithmetic and
    *     the (group, bucket) counts aggregate with map-side partials
    *     like any sum;
    *   - '''mergeable''': a histogram is a count vector, so partial
    *     histograms add — the ALL row here is derived by RE-AGGREGATING
    *     the per-group histogram (never a second scan), exactly like
    *     the HLL union above, and daily histograms roll up into monthly
    *     ones the same way;
    *   - '''bounded error''': the returned bucket-midpoint estimate is
    *     within one bucket width, (max−min)/256, of a true quantile
    *     value (SketchesSpec pins it against the exact percentiles).
    *
    * Unlike HLL (engine-private register states), every step here is
    * deterministic IEEE arithmetic both engines replay identically —
    * so the oracle hashes the ESTIMATES exactly, not just an accuracy
    * flag. The global [min, max] is one tiny pre-aggregation (2
    * doubles to the driver — metadata-scale, like the SQ8 stats). */
  private val HIST_BUCKETS = 256
  private val HIST_QS = Seq(0.5, 0.9, 0.99)

  private def qHistQuantiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d).select($"l_returnflag", $"l_extendedprice")
    val Array(mnR) = li.agg(
      min($"l_extendedprice").cast("double"),
      max($"l_extendedprice").cast("double")).collect()
    val (mn, mx) = (mnR.getDouble(0), mnR.getDouble(1))
    val bucket =
      if (mx == mn) lit(0L)
      else least(floor(($"l_extendedprice".cast("double") - lit(mn))
          / lit(mx - mn) * HIST_BUCKETS).cast("long"),
        lit((HIST_BUCKETS - 1).toLong))
    // ---- the sketch: one scan -> per-(group, bucket) counts
    val hist = li.withColumn("b", bucket)
      .groupBy($"l_returnflag", $"b").agg(count(lit(1)).as("c"))
    // ---- ALL row: merge the per-group histograms (count-vector add)
    val merged = hist.unionAll(
      hist.groupBy($"b").agg(sum($"c").as("c"))
        .select(lit("ALL").as("l_returnflag"), $"b", $"c"))
    // ---- quantile extraction from the histogram
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag").orderBy($"b")
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
    val cum = merged.withColumn("cum", sum($"c").over(w))
      .withColumn("n", sum($"c").over(wAll))
    val qs = HIST_QS.toDF("q")
    cum.join(broadcast(qs), $"cum" >= ceil($"q" * $"n"))
      .groupBy($"l_returnflag", $"q", $"n")
      .agg(min($"b").as("qb"))
      .select($"l_returnflag", $"q",
        round(lit(mn) + ($"qb".cast("double") + 0.5) / HIST_BUCKETS
          * lit(mx - mn), 6).as("est"),
        $"n")
  }

  private val qHistQuantilesSql = {
    // ::DOUBLE on the quantile literals (DuckDB would infer DECIMAL —
    // a schema mismatch against Spark's double column), ::BIGINT on n
    // (DuckDB window sum of BIGINT is HUGEINT)
    val qsValues = HIST_QS.map(q => s"($q::DOUBLE)").mkString(", ")
    s"""WITH st AS (SELECT min(l_extendedprice)::DOUBLE AS mn,
      |                   max(l_extendedprice)::DOUBLE AS mx FROM lineitem),
      |h AS (SELECT l_returnflag,
      |        CASE WHEN mx = mn THEN 0::BIGINT
      |             ELSE least(floor((l_extendedprice::DOUBLE - mn)
      |                    / (mx - mn) * $HIST_BUCKETS)::BIGINT,
      |                  ${HIST_BUCKETS - 1}::BIGINT) END AS b,
      |        count(*) AS c
      |      FROM lineitem, st GROUP BY 1, 2),
      |merged AS (SELECT l_returnflag, b, c FROM h
      |           UNION ALL
      |           SELECT 'ALL', b, sum(c) FROM h GROUP BY b),
      |cum AS (SELECT l_returnflag, b,
      |          sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS cum,
      |          sum(c) OVER (PARTITION BY l_returnflag) AS n
      |        FROM merged),
      |qs AS (SELECT * FROM (VALUES $qsValues) AS t(q)),
      |sel AS (SELECT l_returnflag, q, n, min(b) AS qb
      |        FROM cum JOIN qs ON cum >= ceil(q * n)
      |        GROUP BY l_returnflag, q, n)
      |SELECT l_returnflag, q,
      |       round(mn + (qb::DOUBLE + 0.5) / $HIST_BUCKETS * (mx - mn), 6) AS est,
      |       n::BIGINT AS n
      |FROM sel, st""".stripMargin
  }

  // -------------------------------------------------------- q_cms_counts
  /** Count-Min sketch point-frequency estimation — the third mergeable
    * sketch beside HLL (distinct counts) and the histogram (quantiles):
    * "how often does this token appear in 100 TB" from a CMS_D×256
    * counter grid instead of a full frequency table.
    *
    *   - '''one scan''': each token increments CMS_D counters chosen by
    *     independent md5-derived hashes (bucket = first two hex chars —
    *     256 buckets, no numeric conversion, portable to any engine);
    *     the grid aggregates with map-side partials like any groupBy;
    *   - '''mergeable''': the grid is a count matrix, so per-shard
    *     sketches ADD — the queried sketch here is the RE-AGGREGATION
    *     of per-lang sketches (never a second scan), the same roll-up
    *     contract as the HLL union and histogram add;
    *   - '''one-sided bounded error''': estimates = min over the CMS_D
    *     counters ≥ true count, with overshoot ~2N/W per row
    *     (SketchesSpec pins both against exact counts).
    *
    * Every step is md5 + integer arithmetic, so unlike HLL the oracle
    * hashes the ESTIMATES exactly. Probes are the CMS_K most frequent
    * tokens (count DESC, token ASC — a total order). */
  private val CMS_D = 4
  private val CMS_K = 15

  /** (i, bucket) pairs for a token column expression. */
  private def cmsEntries(t: String) =
    expr(s"""transform(sequence(0, ${CMS_D - 1}), i -> struct(i AS i,
       |  substring(md5(concat(cast(i AS string), '|', $t)), 1, 2) AS b))"""
      .stripMargin)

  private def qCmsCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = documents(s, d)
      .select(explode(split(lower($"text"), " ")).as("t"), $"lang")
      .filter(length($"t") > 0)
    // ---- the sketch: one scan -> per-(lang, row, bucket) counters
    val perLang = toks.select($"lang", explode(cmsEntries("t")).as("e"))
      .groupBy($"lang", $"e.i".as("i"), $"e.b".as("b"))
      .agg(count(lit(1)).as("c"))
    // ---- merged global sketch: count-matrix add over the shards
    val merged = perLang.groupBy($"i", $"b").agg(sum($"c").as("c"))
    // ---- probes: exact top-K tokens, estimated from the sketch alone
    val exact = toks.groupBy($"t").agg(count(lit(1)).as("n_exact"))
    val probes = exact.orderBy($"n_exact".desc, $"t".asc).limit(CMS_K)
    val probeBuckets = probes
      .select($"t", $"n_exact", explode(cmsEntries("t")).as("e"))
      .select($"t", $"n_exact", $"e.i".as("i"), $"e.b".as("b"))
    merged.join(broadcast(probeBuckets), Seq("i", "b"))
      .groupBy($"t", $"n_exact").agg(min($"c").as("n_est"))
      .select($"t".as("term"), $"n_exact", $"n_est")
  }

  private val qCmsCountsSql =
    s"""WITH toks AS (
      |  SELECT lang, t
      |  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS t
      |        FROM documents)
      |  WHERE length(t) > 0),
      |perlang AS (
      |  SELECT lang, i, substr(md5(i::VARCHAR || '|' || t), 1, 2) AS b,
      |         count(*) AS c
      |  FROM toks, generate_series(0, ${CMS_D - 1}) AS g(i)
      |  GROUP BY 1, 2, 3),
      |merged AS (
      |  SELECT i, b, CAST(sum(c) AS BIGINT) AS c
      |  FROM perlang GROUP BY 1, 2),
      |exact AS (SELECT t, count(*) AS n_exact FROM toks GROUP BY t),
      |probes AS (SELECT t, n_exact FROM exact
      |           ORDER BY n_exact DESC, t ASC LIMIT $CMS_K),
      |pb AS (
      |  SELECT t, n_exact, i, substr(md5(i::VARCHAR || '|' || t), 1, 2) AS b
      |  FROM probes, generate_series(0, ${CMS_D - 1}) AS g(i))
      |SELECT pb.t AS term, pb.n_exact, CAST(min(merged.c) AS BIGINT) AS n_est
      |FROM pb JOIN merged USING (i, b)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- q_drift_psi
  /** Distribution-drift monitor: Population Stability Index per column
    * between a reference window and the current window — the standing
    * data-quality check in front of every continuously-ingested
    * training corpus (did the feed's value distribution / class mix
    * shift since the snapshot the filters were tuned on?).
    *
    *   PSI(col) = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref)
    *
    * with Laplace-smoothed proportions p = (n + 1)/(N + B) so empty
    * buckets stay finite. Buckets: fixed-width for numeric columns
    * (edges are monitor config, frozen with the reference), category
    * values for categorical columns. Convention: PSI < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted.
    *
    * 100 TB shape: ONE scan with conditional aggregation fills
    * ref+current counts for every monitored column simultaneously
    * (map-side partials; the windows are predicates, not separate
    * reads); the PSI fold then runs on ≤ Σ bucket-counts rows —
    * hundreds, regardless of corpus size. Mergeable across shards by
    * construction (counts sum). Determinism: counts are exact
    * integers; each bucket's term is ln/division of identical doubles;
    * the ≤10-term sum is rounded 4dp (the q_dsir_weights precedent).
    *
    * Fixture: events' first 15 days (reference) vs the rest (current),
    * monitoring `value` (10 × width-50 buckets) and `event_type`
    * (categorical). */
  private val PSI_SPLIT_US = 1705363200000000L // 2024-01-16T00:00:00Z
  private val PSI_W = 50.0
  private val PSI_NB = 10

  private def qDriftPsi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = events(s, d)
      .withColumn("is_ref", unix_micros($"ts") < PSI_SPLIT_US)
    def psi(buckets: DataFrame, colName: String, nBuckets: Int): DataFrame = {
      // buckets: (bucket, ref_n, cur_n) exact longs
      val tot = buckets.agg(
        sum($"ref_n").as("ref_tot"), sum($"cur_n").as("cur_tot"))
      buckets.crossJoin(broadcast(tot))
        .select((
          (($"cur_n" + 1L).cast("double") / ($"cur_tot" + nBuckets) -
            ($"ref_n" + 1L).cast("double") / ($"ref_tot" + nBuckets)) *
          log((($"cur_n" + 1L).cast("double") / ($"cur_tot" + nBuckets)) /
            (($"ref_n" + 1L).cast("double") / ($"ref_tot" + nBuckets))))
          .as("term"))
        .agg(
          count(lit(1)).cast("long").as("n_buckets"),
          round(sum($"term"), 4).as("psi"))
        .select(lit(colName).as("column"), $"n_buckets", $"psi")
    }
    val valueBuckets = ev
      .withColumn("bucket", least(lit(PSI_NB - 1L),
        floor($"value" / PSI_W).cast("long")))
      .groupBy($"bucket").agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("ref_n"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("cur_n"))
    val typeBuckets = ev.groupBy($"event_type".as("bucket")).agg(
      sum(when($"is_ref", 1L).otherwise(0L)).as("ref_n"),
      sum(when(!$"is_ref", 1L).otherwise(0L)).as("cur_n"))
    psi(valueBuckets, "value", PSI_NB)
      .unionAll(psi(typeBuckets, "event_type", 5))
  }
  private val qDriftPsiSql = {
    def block(bucketed: String, colName: String, nb: Int) =
      s"""SELECT '$colName' AS "column", count(*) AS n_buckets,
        |  round(sum(
        |    (CAST(cur_n + 1 AS DOUBLE) / (cur_tot + $nb)
        |      - CAST(ref_n + 1 AS DOUBLE) / (ref_tot + $nb))
        |    * ln((CAST(cur_n + 1 AS DOUBLE) / (cur_tot + $nb))
        |         / (CAST(ref_n + 1 AS DOUBLE) / (ref_tot + $nb)))), 4) AS psi
        |FROM (SELECT *, sum(ref_n) OVER () AS ref_tot,
        |             sum(cur_n) OVER () AS cur_tot
        |      FROM ($bucketed))""".stripMargin
    val vb =
      s"""SELECT least(${PSI_NB - 1}, CAST(floor(value / $PSI_W) AS BIGINT))
        |         AS bucket,
        |       CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
        |       CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
        |FROM events GROUP BY 1""".stripMargin
    val tb =
      s"""SELECT event_type AS bucket,
        |       CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
        |       CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 0 ELSE 1 END) AS BIGINT) AS cur_n
        |FROM events GROUP BY 1""".stripMargin
    s"""${block(vb, "value", PSI_NB)}
      |UNION ALL
      |${block(tb, "event_type", 5)}""".stripMargin
  }

  // ------------------------------------------------------ q_drift_incr
  /** The drift monitor MAINTAINED INCREMENTALLY: the per-(column,
    * bucket) ref/current counts live in an [[graft.table.AggView]]
    * over a CDF-tracked bucket-event table, so arriving data updates
    * the monitor at O(Δ) merge cost instead of a full rescan, and the
    * PSI readout folds over the (tiny) view — continuous data-quality
    * monitoring as a standing incremental view, the same AggView
    * machinery as q_funnel_incr. The fixture appends the reference
    * window, builds the view, appends the current window, runs ONE
    * signed-delta refresh, and reads PSI — which must equal (and
    * shares the oracle of) the from-scratch q_drift_psi. */
  private def qDriftIncr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    import graft.table.{AggView, VersionedTable}
    val root = graft.Scratch.dir("graft-driftv")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("metric_col", StringType),
      StructField("bucket", StringType),
      StructField("is_ref", IntegerType)))
    val t = VersionedTable.create(s, root.resolve("t").toString, schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    val ev = events(s, d)
      .withColumn("is_ref", (unix_micros($"ts") < PSI_SPLIT_US).cast("int"))
    def bucketRows(e: DataFrame): DataFrame =
      e.select($"event_id", lit("value").as("metric_col"),
          least(lit(PSI_NB - 1L), floor($"value" / PSI_W).cast("long"))
            .cast("string").as("bucket"), $"is_ref")
        .unionAll(e.select($"event_id", lit("event_type").as("metric_col"),
          $"event_type".as("bucket"), $"is_ref"))
    t.append(bucketRows(ev.filter($"is_ref" === 1)))
    val v = AggView.build(t, root.resolve("v").toString,
      Seq("metric_col", "bucket"),
      Seq("ref" -> "CAST(is_ref AS BIGINT)",
        "cur" -> "CAST(1 - is_ref AS BIGINT)"))
    t.append(bucketRows(ev.filter($"is_ref" === 0)))
    v.refresh(t)
    val counts = v.table.snapshot().select($"metric_col",
      coalesce($"sum_ref", lit(0L)).as("ref_n"),
      coalesce($"sum_cur", lit(0L)).as("cur_n"),
      when($"metric_col" === "value", PSI_NB).otherwise(5).as("nb"))
    val tot = counts.groupBy($"metric_col").agg(
      sum($"ref_n").as("ref_tot"), sum($"cur_n").as("cur_tot"))
    counts.join(broadcast(tot), "metric_col")
      .select($"metric_col", (
        (($"cur_n" + 1L).cast("double") / ($"cur_tot" + $"nb") -
          ($"ref_n" + 1L).cast("double") / ($"ref_tot" + $"nb")) *
        log((($"cur_n" + 1L).cast("double") / ($"cur_tot" + $"nb")) /
          (($"ref_n" + 1L).cast("double") / ($"ref_tot" + $"nb"))))
        .as("term"))
      .groupBy($"metric_col")
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        round(sum($"term"), 4).as("psi"))
      .select($"metric_col".as("column"), $"n_buckets", $"psi")
  }

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_hll_distinct" -> (qHllDistinct _),
    "q_hist_quantiles" -> (qHistQuantiles _),
    "q_cms_counts" -> (qCmsCounts _),
    "q_drift_psi" -> (qDriftPsi _),
    "q_drift_incr" -> (qDriftIncr _))

  override def oracles: Seq[(String, String)] = Seq(
    "q_hll_distinct" -> qHllDistinctSql,
    "q_hist_quantiles" -> qHistQuantilesSql,
    "q_cms_counts" -> qCmsCountsSql,
    "q_drift_psi" -> qDriftPsiSql,
    // the incremental monitor must converge to exactly the from-scratch
    // PSI — one oracle pins both paths
    "q_drift_incr" -> qDriftPsiSql)
}
