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
    * shape: one pass, mergeable partials, ALL row from sketch union.
    *
    * lgConfigK is sized FOR the 2% accuracy gate the driver hashes:
    * k = 2^16 registers gives RSE ≈ 1.04/√k ≈ 0.41%, so the ±2% gate
    * sits at ~5σ — it holds at ANY cardinality, not just the sf the
    * gate was tuned at (Spark's lgK=12 default is 1.6% RSE; its union
    * estimate drifted past 2% at sf0.1's 147k distincts). 64 KiB per
    * group is still metadata-scale at 100 TB. */
  private val HLL_LGK = 16
  def hllEstimates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sketches = lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey", HLL_LGK).as("sk"))
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

  // ---------------------------------------------------- q_join_estimate
  /** Sketch-based JOIN-CARDINALITY estimation (AMS / count-sketch inner
    * product, Alon-Matias-Szegedy 1996; the "fast-AGMS" variant of
    * Cormode & Garofalakis 2005): predict |A ⋈ B| from one scan of each
    * side, never executing the join — the statistic a cost-based
    * planner needs before committing 100 TB to a shuffle strategy.
    *
    * Each side folds its join-key column into a JE_D×4096 grid of
    * SIGNED counts: row i hashes key k to bucket
    * `md5(i|k)[1..3]` and sign `±1` from the next hex digit's parity.
    * The inner product of two grids' matching rows is an unbiased
    * estimate of Σ_k n_A(k)·n_B(k) = |A ⋈ B| (collision terms carry
    * random signs and cancel in expectation); the MEDIAN over the JE_D
    * independent rows controls variance (~√(F2_A·F2_B/W) per row).
    *
    * 100 TB shape: each sketch is ONE scan + a groupBy onto ≤ JE_D·4096
    * cells (map-side partials — the grid is mergeable across shards by
    * addition, so per-file sketches union for free); the estimate joins
    * two ≤20k-row grids. The `n_exact` column beside the estimate is
    * the verification baseline (computed as Σ n_A(k)·n_B(k) over the
    * key-count aggregates — itself join-free); a planner at scale reads
    * only `n_est`. Everything is md5 + integer arithmetic — the oracle
    * replays the grid exactly, signs and all (q_cms_counts precedent),
    * and SketchesSpec pins the relative-error envelope. */
  private val JE_D = 5

  /** (i, bucket, sign) triples for join key `k`, i in [0, JE_D). The
    * inner transform materializes each row's md5 ONCE; bucket and sign
    * then slice it (halves the hot-path hashing vs recomputing the
    * digest per field). */
  private def amsEntries(k: String) = expr(
    s"""transform(
       |  transform(sequence(0, ${JE_D - 1}), i -> struct(i AS i,
       |    md5(concat(cast(i AS string), '|', cast($k AS string))) AS h)),
       |  e -> struct(e.i AS i, substring(e.h, 1, 3) AS b,
       |    IF(CAST(conv(substring(e.h, 4, 1), 16, 10) AS INT) % 2 = 0,
       |       CAST(1 AS BIGINT), CAST(-1 AS BIGINT)) AS sg))""".stripMargin)

  /** Signed count grid of `df`'s column `k`: (i, b, v). */
  def amsSketch(df: DataFrame, k: String): DataFrame =
    df.select(explode(amsEntries(k)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.b").as("b"))
      .agg(sum(col("e.sg")).as("v"))

  /** Median-of-rows inner product of two sketches: a 1-row (est) DF.
    * The median of the ≤ JE_D per-row estimates folds through ONE
    * aggregate (`sort_array(collect_list)` + `element_at` — bounded by
    * sketch depth, never relation size) instead of a partition-less
    * ranking window — same (est asc, i asc) order, same picked row,
    * but window-free, so the plan clears the ShapeGate without an
    * exemption (VERDICT r13 #7). */
  def amsJoinEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.withColumnRenamed("v", "w"), Seq("i", "b"))
      .groupBy(col("i")).agg(sum(col("v") * col("w")).as("est"))
      .agg(sort_array(collect_list(struct(col("est"), col("i")))).as("xs"))
      // degenerate grids (empty relation → < median-rank rows) keep
      // the old rank-filter contract: ZERO output rows, not a null-est
      // row (which would also throw under spark.sql.ansi.enabled)
      .where(size(col("xs")) >= (JE_D + 1) / 2)
      .select(element_at(col("xs"), (JE_D + 1) / 2).getField("est").as("est"))

  private def qJoinEstimate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def exactJoinSize(a: DataFrame, ka: String, b: DataFrame, kb: String) =
      a.groupBy(col(ka).as("k")).agg(count(lit(1)).as("na"))
        .join(b.groupBy(col(kb).as("k")).agg(count(lit(1)).as("nb")), "k")
        .agg(coalesce(sum($"na" * $"nb"), lit(0L)).as("n_exact"))
    def row(name: String, a: DataFrame, ka: String, b: DataFrame, kb: String) =
      amsJoinEstimate(amsSketch(a, ka), amsSketch(b, kb))
        .crossJoin(exactJoinSize(a, ka, b, kb))
        .select(lit(name).as("join_name"),
          $"est".cast("long").as("n_est"), $"n_exact")
    row("lineitem_orders", lineitem(s, d), "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(row("orders_customer", orders(s, d), "o_custkey",
        customer(s, d), "c_custkey"))
  }

  private val qJoinEstimateSql = {
    def grid(table: String, k: String) =
      s"""SELECT i, substr(md5(i::VARCHAR || '|' || $k::VARCHAR), 1, 3) AS b,
         |  CAST(sum(CASE WHEN (strpos('0123456789abcdef',
         |      substr(md5(i::VARCHAR || '|' || $k::VARCHAR), 4, 1)) - 1) % 2 = 0
         |    THEN 1 ELSE -1 END) AS BIGINT) AS v
         |FROM $table, generate_series(0, ${JE_D - 1}) AS g(i)
         |GROUP BY 1, 2""".stripMargin
    def block(name: String, ta: String, ka: String, tb: String, kb: String) =
      s"""SELECT '$name' AS join_name,
         |  (SELECT CAST(est AS BIGINT) FROM (
         |     SELECT i, sum(a.v * b.v) AS est
         |     FROM (${grid(ta, ka)}) a JOIN (${grid(tb, kb)}) b USING (i, b)
         |     GROUP BY i ORDER BY est ASC, i ASC
         |     LIMIT 1 OFFSET ${(JE_D + 1) / 2 - 1})) AS n_est,
         |  (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) FROM
         |     (SELECT $ka AS k, count(*) AS na FROM $ta GROUP BY 1) x
         |     JOIN (SELECT $kb AS k, count(*) AS nb FROM $tb GROUP BY 1) y
         |     USING (k)) AS n_exact""".stripMargin
    s"""${block("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")}
      |UNION ALL
      |${block("orders_customer", "orders", "o_custkey", "customer", "c_custkey")}"""
      .stripMargin
  }

  // ---------------------------------------------- q_join_estimate_incr
  /** The AMS grid MAINTAINED INCREMENTALLY — the property that makes
    * this sketch special among the family: signed counts are a pure
    * SUM, so inserts add `+sg`, deletes subtract it, and the grid
    * tracks arbitrary churn at O(Δ) cost with no recompute (HLL cannot
    * subtract; a histogram can, but says nothing about joins). Each
    * side's entry stream (key → JE_D (i, b, ±1) cells) lands in a
    * CDF-tracked [[graft.table.VersionedTable]] and the grid is an
    * [[graft.table.AggView]] over it grouped by (i, b) — the same
    * signed-delta machinery as the Gold views, re-used to keep a
    * PLANNER STATISTIC current. The fixture seeds both sides, then
    * appends the remaining keys AND deletes a slice, runs one refresh
    * per side, and estimates from the two view snapshots; the oracle
    * replays the batch grid over the post-churn content, so the hash
    * match proves maintained ≡ rebuilt. */
  private def qJoinEstimateIncr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    import graft.table.{AggView, VersionedTable}
    val root = graft.Scratch.dir("graft-amsincr")
    val entrySchema = StructType(Seq(
      StructField("rk", LongType), StructField("i", IntegerType),
      StructField("b", StringType), StructField("sg", LongType)))
    // entry rows pre-combined per (key, i): cells are additive, so the
    // ingest stream can carry one row per key/row-of-grid with the
    // key's multiplicity folded into sg — a 4× smaller entry table
    // (lineitem repeats each orderkey ~4×) means 4× cheaper appends,
    // delete rewrites, and view refreshes, with an unchanged grid
    def entries(df: DataFrame, k: String): DataFrame =
      df.select(col(k).cast("long").as("rk"), explode(amsEntries(k)).as("e"))
        .groupBy($"rk", $"e.i".as("i"), $"e.b".as("b"))
        .agg(sum($"e.sg").as("sg"))
    def entryTable(name: String): VersionedTable =
      VersionedTable.create(s, root.resolve(name).toString,
        entrySchema, Map(VersionedTable.PROP_CDF -> "true"))
    // supplier ⋈ lineitem(l_suppkey): the incremental fixture's point is
    // the MAINTENANCE machinery, so it runs on the join whose entry
    // streams collapse hardest under the per-key pre-combine (suppkey
    // multiplicity ~60 in lineitem) — the batch row (q_join_estimate)
    // keeps estimating the corpus-scale lineitem⋈orders pair.
    // side A: supplier keys — seed 2/3, then append the rest and
    // delete a slice (the subtract path)
    val ta = entryTable("a")
    val su = supplier(s, d)
    ta.append(entries(su.filter($"s_suppkey" % 3 =!= 0), "s_suppkey"))
    val va = AggView.build(ta, root.resolve("va").toString,
      Seq("i", "b"), Seq("v" -> "sg"))
    ta.append(entries(su.filter($"s_suppkey" % 3 === 0), "s_suppkey"))
    ta.deleteWhere($"rk" % 17 === 3)
    va.refresh(ta)
    // side B: lineitem suppkeys — seed half, append the rest (the add
    // path; each batch is ≤ 5·|distinct suppkeys| rows, not 5·|rows|)
    val tb = entryTable("b")
    val li = lineitem(s, d)
    tb.append(entries(li.filter($"l_suppkey" % 2 === 0), "l_suppkey"))
    val vb = AggView.build(tb, root.resolve("vb").toString,
      Seq("i", "b"), Seq("v" -> "sg"))
    tb.append(entries(li.filter($"l_suppkey" % 2 =!= 0), "l_suppkey"))
    vb.refresh(tb)
    def grid(v: AggView) = v.table.snapshot()
      .select($"i", $"b", coalesce($"sum_v", lit(0L)).as("v"))
    val exact = su.filter($"s_suppkey" % 17 =!= 3)
      .groupBy($"s_suppkey".as("k")).agg(count(lit(1)).as("na"))
      .join(li.groupBy($"l_suppkey".as("k")).agg(count(lit(1)).as("nb")), "k")
      .agg(coalesce(sum($"na" * $"nb"), lit(0L)).as("n_exact"))
    amsJoinEstimate(grid(va), grid(vb)).crossJoin(exact)
      .select(lit("supplier_lineitem").as("join_name"),
        $"est".cast("long").as("n_est"), $"n_exact")
  }

  private val qJoinEstimateIncrSql = {
    def grid(from: String, k: String) =
      s"""SELECT i, substr(md5(i::VARCHAR || '|' || $k::VARCHAR), 1, 3) AS b,
         |  CAST(sum(CASE WHEN (strpos('0123456789abcdef',
         |      substr(md5(i::VARCHAR || '|' || $k::VARCHAR), 4, 1)) - 1) % 2 = 0
         |    THEN 1 ELSE -1 END) AS BIGINT) AS v
         |FROM $from, generate_series(0, ${JE_D - 1}) AS g(i)
         |GROUP BY 1, 2""".stripMargin
    s"""WITH ta AS (SELECT s_suppkey FROM supplier
      |            WHERE NOT (s_suppkey % 17 = 3)),
      |ga AS (${grid("ta", "s_suppkey")}),
      |gb AS (${grid("lineitem", "l_suppkey")})
      |SELECT 'supplier_lineitem' AS join_name,
      |  (SELECT CAST(est AS BIGINT) FROM (
      |     SELECT i, sum(a.v * b.v) AS est
      |     FROM ga a JOIN gb b USING (i, b)
      |     GROUP BY i ORDER BY est ASC, i ASC
      |     LIMIT 1 OFFSET ${(JE_D + 1) / 2 - 1})) AS n_est,
      |  (SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) FROM
      |     (SELECT s_suppkey AS k, count(*) AS na FROM ta GROUP BY 1) x
      |     JOIN (SELECT l_suppkey AS k, count(*) AS nb FROM lineitem GROUP BY 1) y
      |     USING (k)) AS n_exact""".stripMargin
  }

  // ------------------------------------------------------ q_key_overlap
  /** KMV (k-minimum-values, Bar-Yossef et al. 2002 / Beyer et al. 2007)
    * key-set OVERLAP estimation: how much do two tables' key domains
    * intersect, from two 64-row sketches instead of a distinct-join of
    * the full domains — the data-integration profiling question ("can
    * these feeds join? on what fraction?") asked before committing a
    * 100 TB join. Complements the family: HLL counts ONE set, AMS
    * estimates a JOIN SIZE (multiset inner product), KMV compares SET
    * MEMBERSHIP across sources.
    *
    * Each side keeps the KMV_K smallest md5 values over its DISTINCT
    * keys. The k smallest of the UNION are then a uniform sample of
    * A∪B, and any sampled element of A is provably inside A's own
    * bottom-k (h(x) ≤ kth-min of the union ≤ kth-min of A), so
    * membership resolves against the sketches alone:
    * `J ≈ |{x ∈ U_k : x∈sig_A ∧ x∈sig_B}| / k`.
    *
    * 100 TB shape: per side one distinct-aggregate then a global
    * bottom-k (TakeOrdered — no full sort); sketches are mergeable
    * (bottom-k of per-shard bottom-ks). Everything is md5 + integer
    * counts; the exact Jaccard columns beside the estimate power the
    * gate and the accuracy spec. */
  private val KMV_K = 64

  /** Bottom-`KMV_K` md5 signature of `df.k`'s distinct values. */
  def kmvSignature(df: DataFrame, k: String): DataFrame =
    df.select(col(k).cast("long").as("key")).distinct()
      .withColumn("h", md5(concat(lit("k|"), col("key").cast("string"))))
      .orderBy(col("h")).limit(KMV_K)

  private def qKeyOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val evKeys = events(s, d).select($"user_id".cast("long").as("key")).distinct()
    val cuKeys = customer(s, d).select($"c_custkey".cast("long").as("key")).distinct()
    val sa = kmvSignature(events(s, d), "user_id")
    val sb = kmvSignature(customer(s, d), "c_custkey")
    val u = sa.unionAll(sb).dropDuplicates("key")
      .orderBy($"h").limit(KMV_K)
    val both = u
      .join(sa.select($"key"), Seq("key"), "left_semi")
      .join(sb.select($"key"), Seq("key"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val m = u.agg(count(lit(1)).as("mk"))
    val inter = evKeys.join(cuKeys, Seq("key"), "left_semi")
      .agg(count(lit(1)).as("n_inter"))
    val union = evKeys.unionAll(cuKeys).distinct()
      .agg(count(lit(1)).as("n_union"))
    both.crossJoin(m).crossJoin(inter).crossJoin(union)
      .select(lit(KMV_K.toLong).as("k"), $"n_both",
        round($"n_both".cast("double") / $"mk", 4).as("jaccard_est"),
        $"n_inter", $"n_union",
        round($"n_inter".cast("double") / $"n_union", 4).as("jaccard_exact"))
  }

  private val qKeyOverlapSql =
    s"""WITH a AS (SELECT DISTINCT user_id::BIGINT AS key FROM events),
      |b AS (SELECT DISTINCT c_custkey::BIGINT AS key FROM customer),
      |ha AS (SELECT key, md5('k|' || key::VARCHAR) AS h FROM a
      |       ORDER BY h LIMIT $KMV_K),
      |hb AS (SELECT key, md5('k|' || key::VARCHAR) AS h FROM b
      |       ORDER BY h LIMIT $KMV_K),
      |u AS (SELECT key, h FROM (
      |        SELECT DISTINCT key, h FROM (
      |          SELECT * FROM ha UNION ALL SELECT * FROM hb))
      |      ORDER BY h LIMIT $KMV_K),
      |nb AS (SELECT count(*) AS n_both FROM u
      |       WHERE key IN (SELECT key FROM ha)
      |         AND key IN (SELECT key FROM hb)),
      |m AS (SELECT count(*) AS mk FROM u),
      |ex AS (SELECT
      |  (SELECT count(*) FROM (SELECT key FROM a INTERSECT SELECT key FROM b)) AS n_inter,
      |  (SELECT count(*) FROM (SELECT key FROM a UNION SELECT key FROM b)) AS n_union)
      |SELECT CAST($KMV_K AS BIGINT) AS k, n_both,
      |  round(CAST(n_both AS DOUBLE) / mk, 4) AS jaccard_est,
      |  n_inter, n_union,
      |  round(CAST(n_inter AS DOUBLE) / n_union, 4) AS jaccard_exact
      |FROM nb, m, ex""".stripMargin

  // ------------------------------------------------ q_seasonal_anomaly
  /** SEASONAL volume anomaly detection: each (event_type, day) scores
    * against its own DAY-OF-WEEK baseline instead of the trailing
    * window [[anomalyScores]] uses — weekly periodicity (weekend dips,
    * Monday spikes) saturates a trailing-7 z-score but is exactly what
    * a per-weekday baseline absorbs; the pair covers the two standing
    * volume monitors a feed dashboard runs. Day-of-week is pure
    * integer arithmetic (epoch-days mod 7 — no engine-private DOW
    * numbering), the baseline is exact Σn/Σn² over that weekday's
    * observations, and z rounds 4dp from identical integers (the
    * [[qDriftPsi]] recipe). Cost: the same (type, day) aggregate as
    * the trailing monitor plus a |types|·7-row baseline join. */
  private def qSeasonalAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("CAST(datediff(day, DATE'1970-01-01') % 7 AS BIGINT)"))
    val base = daily.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).as("m"), sum($"n").as("s"),
        sum($"n" * $"n").as("s2"))
      .filter($"m" >= 2)
    daily.join(broadcast(base), Seq("event_type", "dow"))
      .withColumn("mean", $"s".cast("double") / $"m")
      .withColumn("vr",
        ($"s2".cast("double") - $"s".cast("double") * $"s" / $"m") / $"m")
      .withColumn("z", when($"vr" > 0.0,
        round(($"n".cast("double") - $"mean") / sqrt($"vr"), 4))
        .otherwise(lit(0.0)))
      .select($"event_type", $"day".cast("string").as("day"),
        $"dow", $"n", $"z".as("zscore"), (abs($"z") > 3.0).as("is_anomaly"))
  }
  private val qSeasonalAnomalySql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |dd AS (SELECT *, (day - DATE '1970-01-01') % 7 AS dow FROM daily),
      |base AS (
      |  SELECT event_type, dow, count(*) AS m,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS s2
      |  FROM dd GROUP BY 1, 2 HAVING count(*) >= 2),
      |sc AS (
      |  SELECT dd.event_type, dd.day, dd.dow, dd.n,
      |    CAST(s AS DOUBLE) / m AS mean,
      |    (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / m) / m AS vr
      |  FROM dd JOIN base USING (event_type, dow)),
      |z AS (
      |  SELECT event_type, day, dow, n,
      |    CASE WHEN vr > 0.0
      |         THEN round((CAST(n AS DOUBLE) - mean) / sqrt(vr), 4)
      |         ELSE 0.0 END AS zscore
      |  FROM sc)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, CAST(dow AS BIGINT) AS dow,
      |  n, zscore, abs(zscore) > 3.0 AS is_anomaly
      |FROM z""".stripMargin

  // --------------------------------------------------- q_ewma_control
  /** EWMA control chart over daily event volumes — the exponentially-
    * weighted monitor that completes the volume family: the trailing-z
    * window forgets abruptly, CUSUM integrates level shifts, the
    * weekday baseline absorbs seasonality; EWMA tracks a smoothly
    * drifting level and flags days that break from it. α = 1/2 in
    * integer milli-units: s₀ = n₀·1000, sₜ = (sₜ₋₁ + nₜ·1000) div 2 —
    * a RECURSIVE statistic, re-expressed relationally as a per-type
    * linear fold over the sorted (day, n) list with an ARRAY
    * accumulator (each step reads only the previous element), so the
    * whole trajectory is exact integers and the DuckDB oracle replays
    * it with a recursive CTE stepping the same recurrence. The alert
    * compares |nₜ·1000 − sₜ₋₁| against sₜ₋₁/2 in pure integer
    * cross-products.
    *
    * 100 TB shape: the corpus-scale work is ONE (type, day) hash
    * aggregate; the fold runs per type over the ≤day-span list —
    * constant-bounded state, the [[graft.streaming.EventWindows]]
    * funnel-fold idiom applied to a time series. */
  private def qEwmaControl(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type",
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("n"))
    val folded = daily
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day", $"n"))).as("seq"))
      .select($"event_type", explode(expr(
        """aggregate(seq,
          |  CAST(array() AS ARRAY<STRUCT<day: BIGINT, n: BIGINT, s: BIGINT>>),
          |  (acc, e) -> array_append(acc, named_struct(
          |    'day', e.day, 'n', e.n,
          |    's', CASE WHEN size(acc) = 0 THEN e.n * 1000L
          |         ELSE (element_at(acc, size(acc)).s + e.n * 1000L) div 2L
          |         END)))""".stripMargin)).as("r"))
      .select($"event_type", $"r.day", $"r.n", $"r.s".as("ewma_milli"))
    val w = Window.partitionBy($"event_type").orderBy($"day".asc)
    folded.withColumn("prev_s", lag($"ewma_milli", 1).over(w))
      .select($"event_type", $"day", $"n", $"ewma_milli",
        coalesce($"n" * 1000 - $"prev_s", lit(0L)).as("resid_milli"),
        ($"prev_s".isNotNull &&
          abs($"n" * 1000 - $"prev_s") * 2 > $"prev_s").as("alert"))
  }
  private val qEwmaControlSql =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY day) AS i
      |  FROM daily),
      |r AS (
      |  SELECT event_type, day, n, i, n * 1000 AS s
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT d.event_type, d.day, d.n, d.i, (r.s + d.n * 1000) // 2
      |  FROM idx d JOIN r ON d.event_type = r.event_type AND d.i = r.i + 1),
      |lg AS (
      |  SELECT event_type, day, n, s AS ewma_milli,
      |    lag(s) OVER (PARTITION BY event_type ORDER BY day) AS prev_s
      |  FROM r)
      |SELECT event_type, day, n, ewma_milli,
      |  coalesce(n * 1000 - prev_s, 0) AS resid_milli,
      |  prev_s IS NOT NULL AND abs(n * 1000 - prev_s) * 2 > prev_s
      |    AS alert
      |FROM lg""".stripMargin

  // --------------------------------------------------- q_holt_forecast
  /** HOLT double-exponential forecast over the per-(event_type, day)
    * volume series — the projection step the volume family feeds: EWMA
    * tracks the level; Holt also carries a TREND state so the h-step
    * projection `l_T + h·b_T` extrapolates growth instead of flat-
    * lining. α = β = 1/2 in integer milli-units with `div`-truncated
    * recurrences (both engines truncate integer division toward zero,
    * so the signed trend state stays bit-identical):
    *
    *   l₁ = y₁·1000, b₁ = 0
    *   lₜ = (yₜ·1000 + lₜ₋₁ + bₜ₋₁) div 2
    *   bₜ = (lₜ − lₜ₋₁ + bₜ₋₁) div 2
    *
    * Output: per type, the final (level, trend) state and the next
    * [[HOLT_H]] daily forecasts. Same 100 TB shape as the EWMA chart:
    * ONE (type, day) hash aggregate, then a constant-bounded per-type
    * fold; the oracle replays the recurrence with a recursive CTE. */
  private val HOLT_H = 7
  private def qHoltForecast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type",
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("n"))
    daily
      .groupBy($"event_type")
      .agg(sort_array(collect_list(struct($"day", $"n"))).as("seq"))
      .select($"event_type", expr(
        """aggregate(seq,
          |  named_struct('day', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
          |               'b', CAST(0 AS BIGINT), 'init', false),
          |  (acc, e) -> CASE WHEN NOT acc.init
          |    THEN named_struct('day', e.day, 'l', e.n * 1000L,
          |                      'b', CAST(0 AS BIGINT), 'init', true)
          |    ELSE named_struct('day', e.day,
          |      'l', (e.n * 1000L + acc.l + acc.b) div 2L,
          |      'b', ((e.n * 1000L + acc.l + acc.b) div 2L - acc.l + acc.b)
          |             div 2L,
          |      'init', true) END)""".stripMargin).as("st"))
      .select($"event_type", explode(expr(
        s"sequence(1L, ${HOLT_H}L)")).as("h"),
        $"st.day".as("last_day"), $"st.l".as("level_milli"),
        $"st.b".as("trend_milli"))
      .select($"event_type", $"h",
        ($"last_day" + $"h").as("forecast_day"),
        ($"level_milli" + $"h" * $"trend_milli").as("forecast_milli"),
        $"level_milli", $"trend_milli")
  }
  private val qHoltForecastSql =
    s"""WITH RECURSIVE daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |idx AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY day) AS i
      |  FROM daily),
      |r AS (
      |  SELECT event_type, day, i, n * 1000 AS l, CAST(0 AS BIGINT) AS b
      |  FROM idx WHERE i = 1
      |  UNION ALL
      |  SELECT d.event_type, d.day, d.i,
      |    (d.n * 1000 + r.l + r.b) // 2,
      |    ((d.n * 1000 + r.l + r.b) // 2 - r.l + r.b) // 2
      |  FROM idx d JOIN r ON d.event_type = r.event_type AND d.i = r.i + 1),
      |fin AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |                               ORDER BY i DESC) AS rk
      |  FROM r)
      |SELECT event_type, h, day + h AS forecast_day,
      |  l + h * b AS forecast_milli,
      |  l AS level_milli, b AS trend_milli
      |FROM fin, unnest(generate_series(1, $HOLT_H)) AS t(h)
      |WHERE rk = 1""".stripMargin

  // ----------------------------------------------------- q_wow_volume
  /** Week-over-week volume growth per event type — the reporting row
    * every monitor family ends in: weekly totals with the previous
    * week's count and an integer-ppm growth rate ((n−prev)·10⁶ div
    * prev; both engines truncate signed integer division toward zero,
    * so shrinking weeks are exact too). First week of a type reports
    * NULL prev/growth in both engines. ONE (type, week) aggregate then
    * a |weeks|-row per-type lag window. */
  private def qWowVolume(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val weekly = events(s, d)
      .groupBy($"event_type",
        expr("CAST(unix_micros(ts) div 604800000000 AS BIGINT)").as("week"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"week".asc)
    weekly.withColumn("prev_n", lag($"n", 1).over(w))
      .select($"event_type", $"week", $"n", $"prev_n",
        expr("(n - prev_n) * 1000000L div prev_n").as("wow_ppm"))
  }
  private val qWowVolumeSql =
    """WITH weekly AS (
      |  SELECT event_type, epoch_us(ts) // 604800000000 AS week,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, week, n,
      |  lag(n) OVER w AS prev_n,
      |  (n - lag(n) OVER w) * 1000000 // lag(n) OVER w AS wow_ppm
      |FROM weekly
      |WINDOW w AS (PARTITION BY event_type ORDER BY week)""".stripMargin

  // ------------------------------------------------ q_cusum_changepoint
  /** CUSUM CHANGEPOINT detection over the per-(event_type, day) volume
    * series: the cumulative sum of deviations from the series mean
    * peaks (in absolute value) at the most likely LEVEL-SHIFT point —
    * the retrospective "when did this feed change" monitor that
    * completes the volume family (trailing z = sudden spike, weekday
    * baseline = seasonality, CUSUM = sustained shift a per-day z never
    * trips on).
    *
    * All-integer until the readout: deviations are scaled by the day
    * count (`n_i·m − s` instead of `n_i − s/m`), so the running sum,
    * its argmax, and the tiebreak (earliest day) are exact; the
    * normalized statistic divides once by `m·√(m·var)` and rounds 4dp.
    * Cost: the same (type, day) aggregate as every monitor here plus a
    * per-type window over |days| rows. */
  private def qCusumChangepoint(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val daily = events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy($"event_type")
    val wCum = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("s", sum($"n").over(wAll))
      .withColumn("s2", sum($"n" * $"n").over(wAll))
      .withColumn("cusum", sum($"n" * $"m" - $"s").over(wCum))
      .withColumn("ac", abs($"cusum"))
    val wBest = Window.partitionBy($"event_type")
      .orderBy($"ac".desc, $"day".asc)
    scored
      .withColumn("rk", row_number().over(wBest))
      .filter($"rk" === 1)
      .select($"event_type", $"day".cast("string").as("change_day"),
        $"ac".as("cusum_scaled"),
        round($"ac".cast("double") / ($"m".cast("double") *
          sqrt($"m".cast("double") *
            (($"s2".cast("double") - $"s".cast("double") * $"s" / $"m") / $"m"))),
          4).as("stat"))
  }
  private val qCusumChangepointSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, day, n,
      |    count(*) OVER w1 AS m,
      |    CAST(sum(n) OVER w1 AS BIGINT) AS s,
      |    CAST(sum(n * n) OVER w1 AS BIGINT) AS s2
      |  FROM daily
      |  WINDOW w1 AS (PARTITION BY event_type)),
      |sc AS (
      |  SELECT *,
      |    CAST(sum(n * m - s)
      |      OVER (PARTITION BY event_type ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cusum
      |  FROM st),
      |best AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY abs(cusum) DESC, day ASC) AS rk
      |  FROM sc)
      |SELECT event_type, CAST(day AS VARCHAR) AS change_day,
      |  abs(cusum) AS cusum_scaled,
      |  round(CAST(abs(cusum) AS DOUBLE) / (CAST(m AS DOUBLE) *
      |    sqrt(CAST(m AS DOUBLE) *
      |      ((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / m) / m))), 4)
      |    AS stat
      |FROM best WHERE rk = 1""".stripMargin

  // -------------------------------------------------- q_anomaly_windows
  /** Trailing-window anomaly detection over the event stream: for each
    * (event_type, day), the z-score of that day's event count against
    * the preceding 7 observed days — the standing volume monitor that
    * catches feed outages, bot floods, and dedup regressions before
    * they poison a training snapshot. Complements q_drift_psi: PSI
    * watches the VALUE distribution between two windows, this watches
    * the VOLUME time series continuously.
    *
    * 100 TB shape: the raw stream collapses to (type, day) counts in
    * one aggregation (map-side partials), and the window arithmetic
    * runs on that aggregate — #types × #days rows, thousands at most,
    * regardless of corpus size. Trailing mean/variance come from exact
    * integer sums over the frame (Σn, Σn²), so cross-engine the
    * doubles agree bit-for-bit: both engines evaluate the same
    * (s2 − s·s/7)/7 expression on the same integers (the q_drift_psi
    * determinism recipe). Days with fewer than 7 prior observations
    * are warm-up and not scored. */
  def anomalyScores(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("m", count(col("n")).over(w))
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("m") === 7)
      .withColumn("mean", col("s").cast("double") / 7.0)
      .withColumn("vr",
        (col("s2").cast("double") - col("s").cast("double") * col("s") / 7.0) / 7.0)
      .withColumn("z", when(col("vr") > 0.0,
        round((col("n").cast("double") - col("mean")) / sqrt(col("vr")), 4))
        .otherwise(lit(0.0)))
      // day leaves as its ISO string: parquet date32 and DuckDB's DATE
      // canonicalize differently in the driver's pandas compare
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n"), col("z").as("zscore"), (abs(col("z")) > 3.0).as("is_anomaly"))
  }

  private def qAnomalyWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    anomalyScores(events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  // ----------------------------------------------------------- q_gap_fill
  /** Date-spine GAP FILL: re-sample the per-(event_type, day) count
    * series onto a dense daily spine, making missing days explicit
    * zero rows. A feed outage produces NO rows — the one anomaly a
    * monitor over observed days can never see — so gap-filling is the
    * step in front of [[anomalyScores]] (a filled zero day then scores
    * as a hard negative z). `is_gap` marks synthesized rows.
    *
    * Scale shape: the spine is |types| × |days| — generated from a
    * broadcast 1-row bounds aggregate and a distinct-types aggregate,
    * never from the raw stream — and the fill join runs on the daily
    * AGGREGATE (thousands of rows at any corpus scale). Dates stay
    * integer arithmetic; the output day is the ISO string (the
    * q_anomaly_windows convention). */
  def gapFill(daily: DataFrame): DataFrame = {
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day").cast("string").as("day"),
        coalesce(col("n"), lit(0L)).as("n"), col("n").isNull.as("is_gap"))
  }

  private def qGapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    gapFill(events(s, d)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n")))
  }

  private val qGapFillSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |spine AS (
      |  SELECT event_type,
      |    CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
      |                                INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM types, b)
      |SELECT s.event_type, CAST(s.day AS VARCHAR) AS day,
      |  coalesce(daily.n, 0) AS n, daily.n IS NULL AS is_gap
      |FROM spine s LEFT JOIN daily USING (event_type, day)""".stripMargin

  private val qAnomalyWindowsSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |fr AS (
      |  SELECT event_type, day, n,
      |    count(n) OVER w AS m, sum(n) OVER w AS s, sum(n * n) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (PARTITION BY event_type ORDER BY day
      |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |sc AS (
      |  SELECT event_type, day, n,
      |    CAST(s AS DOUBLE) / 7.0 AS mean,
      |    (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * s / 7.0) / 7.0 AS vr
      |  FROM fr WHERE m = 7),
      |z AS (
      |  SELECT event_type, day, n,
      |    CASE WHEN vr > 0.0
      |         THEN round((CAST(n AS DOUBLE) - mean) / sqrt(vr), 4)
      |         ELSE 0.0 END AS zscore
      |  FROM sc)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, n, zscore,
      |  abs(zscore) > 3.0 AS is_anomaly
      |FROM z""".stripMargin

  // ------------------------------------------------------ q_quantile_view
  /** CONTINUOUS percentile monitoring: the [[qHistQuantiles]] histogram
    * kept as an incrementally-maintained [[graft.table.AggView]] —
    * per-(group, bucket) counts are pure sums, so the sketch tracks
    * arbitrary insert/delete churn at O(Δ) merge cost, and any P50/P90/
    * P99 readout folds over ≤ groups·256 count rows, never the data.
    * This is the standing "what is p99 latency/length RIGHT NOW"
    * dashboard query, served from a view that one CDF-driven refresh
    * keeps current.
    *
    * The bucket EDGES are frozen at view build from the seed window
    * (monitor config, the [[qDriftPsi]] convention — an equi-width
    * histogram whose edges chased the live min/max would re-bucket
    * history on every refresh and stop being incrementally
    * maintainable). The fixture seeds 2/3 of lineitem, builds the
    * view, appends the rest, DELETES an orderkey slice, refreshes
    * once, and reads the quantile grid; the oracle replays frozen
    * seed-window edges + the final row set declaratively, so the hash
    * match proves maintained ≡ rebuilt through add AND subtract. */
  private def qQuantileView(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.table.{AggView, VersionedTable}
    val root = graft.Scratch.dir("graft-quantv")
    val schema = StructType(Seq(
      StructField("rk", LongType),
      StructField("grp", StringType),
      StructField("b", LongType)))
    val t = VersionedTable.create(s, root.resolve("t").toString, schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    val li = lineitem(s, d)
      .select($"l_orderkey".as("rk"), $"l_returnflag".as("grp"),
        $"l_extendedprice".cast("double").as("x"))
    val seed = li.filter($"rk" % 3 =!= 0)
    // frozen edges: one 2-double aggregate over the SEED window
    val Array(stR) = seed.agg(min($"x"), max($"x")).collect()
    val (mn, mx) = (stR.getDouble(0), stR.getDouble(1))
    def bucketRows(e: DataFrame): DataFrame =
      e.select($"rk", $"grp",
        (if (mx == mn) lit(0L)
         else least(greatest(floor(($"x" - lit(mn)) / lit(mx - mn)
             * HIST_BUCKETS).cast("long"), lit(0L)),
           lit((HIST_BUCKETS - 1).toLong))).as("b"))
    t.append(bucketRows(seed))
    val v = AggView.build(t, root.resolve("v").toString,
      Seq("grp", "b"), Seq.empty)
    t.append(bucketRows(li.filter($"rk" % 3 === 0)))
    t.deleteWhere($"rk" % 17 === 3)
    v.refresh(t)
    // readout: per-group + re-aggregated ALL quantiles off the view
    val hist = v.table.snapshot()
      .select($"grp", $"b", $"n_rows".cast("long").as("c"))
      .filter($"c" > 0L)
    val merged = hist.unionAll(
      hist.groupBy($"b").agg(sum($"c").as("c"))
        .select(lit("ALL").as("grp"), $"b", $"c"))
    val w = Window.partitionBy($"grp").orderBy($"b")
    val wAll = Window.partitionBy($"grp")
    val cum = merged.withColumn("cum", sum($"c").over(w))
      .withColumn("n", sum($"c").over(wAll))
    val qs = HIST_QS.toDF("q")
    cum.join(broadcast(qs), $"cum" >= ceil($"q" * $"n"))
      .groupBy($"grp", $"q", $"n")
      .agg(min($"b").as("qb"))
      .select($"grp", $"q",
        round(lit(mn) + ($"qb".cast("double") + 0.5) / HIST_BUCKETS
          * lit(mx - mn), 6).as("est"),
        $"n")
  }
  private val qQuantileViewSql = {
    val qsValues = HIST_QS.map(q => s"($q::DOUBLE)").mkString(", ")
    s"""WITH seed AS (SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS x
      |              FROM lineitem WHERE l_orderkey % 3 <> 0),
      |st AS (SELECT min(x) AS mn, max(x) AS mx FROM seed),
      |fin AS (SELECT l_returnflag AS grp, l_extendedprice::DOUBLE AS x
      |        FROM lineitem WHERE NOT (l_orderkey % 17 = 3)),
      |h AS (SELECT grp,
      |        CASE WHEN mx = mn THEN 0::BIGINT
      |             ELSE least(greatest(floor((x - mn) / (mx - mn)
      |                    * $HIST_BUCKETS)::BIGINT, 0::BIGINT),
      |                  ${HIST_BUCKETS - 1}::BIGINT) END AS b,
      |        count(*) AS c
      |      FROM fin, st GROUP BY 1, 2),
      |merged AS (SELECT grp, b, c FROM h
      |           UNION ALL
      |           SELECT 'ALL', b, sum(c) FROM h GROUP BY b),
      |cum AS (SELECT grp, b,
      |          sum(c) OVER (PARTITION BY grp ORDER BY b) AS cum,
      |          sum(c) OVER (PARTITION BY grp) AS n
      |        FROM merged),
      |qs AS (SELECT * FROM (VALUES $qsValues) AS t(q)),
      |sel AS (SELECT grp, q, n, min(b) AS qb
      |        FROM cum JOIN qs ON cum >= ceil(q * n)
      |        GROUP BY grp, q, n),
      |e AS (SELECT mn, mx FROM st)
      |SELECT grp, q,
      |       round(mn + (qb::DOUBLE + 0.5) / $HIST_BUCKETS * (mx - mn), 6)
      |         AS est,
      |       n::BIGINT AS n
      |FROM sel, e""".stripMargin
  }

  // ---------------------------------------------------------- q_drift_ks
  /** EXACT two-sample Kolmogorov–Smirnov statistic per event_type
    * between the reference and current windows (the [[qDriftPsi]]
    * split) — the UNBINNED companion of PSI: PSI needs frozen bucket
    * edges and misses within-bucket shifts; KS is the sup-norm
    * distance between the two empirical CDFs, parameter-free.
    *
    *   KS = max_v |F_ref(v) − F_cur(v)|
    *
    * Computed exactly and all-integer: values collapse to per-(type,
    * value-cent) ref/cur counts in one aggregation (map-side partial —
    * the working set is DISTINCT values, not rows), cumulative counts
    * come from a window partitioned by event_type ordered by value,
    * and the sup is `max |cum_ref·n_cur − cum_cur·n_ref|` over exact
    * longs (cross-multiplied so no division happens until the final
    * |types|-row readout; overflow-safe to ~3·10⁹ rows per side —
    * beyond that the two factors move to DECIMAL, same plan). The
    * final `ks` is one division of identical integers, rounded 4dp.
    *
    * 100 TB shape: one scan → distinct-value aggregate → per-type
    * ordered window. The window partitions by event_type, so its
    * parallelism is |types| — right when types are plentiful (the
    * monitored-column case); for a SINGLE high-cardinality column the
    * distinct-value table is still ≤ |domain| rows (here: 49k cent
    * values max), orders of magnitude under the row count. */
  private def qDriftKs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val pv = events(s, d)
      .select($"event_type",
        (unix_micros($"ts") < PSI_SPLIT_US).as("is_ref"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"event_type", $"cents")
      .agg(
        sum(when($"is_ref", 1L).otherwise(0L)).as("r"),
        sum(when(!$"is_ref", 1L).otherwise(0L)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = pv.groupBy($"event_type")
      .agg(sum($"r").as("n_ref"), sum($"c").as("n_cur"))
    pv.withColumn("cr", sum($"r").over(w))
      .withColumn("cc", sum($"c").over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("dnum", abs($"cr" * $"n_cur" - $"cc" * $"n_ref"))
      .groupBy($"event_type")
      .agg(max($"n_ref").as("n_ref"), max($"n_cur").as("n_cur"),
        max($"dnum").as("d_num"))
      .select($"event_type", $"n_ref", $"n_cur", $"d_num",
        round($"d_num".cast("double") / ($"n_ref" * $"n_cur"), 4).as("ks"))
  }
  private val qDriftKsSql =
    s"""WITH pv AS (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 1 ELSE 0 END) AS BIGINT) AS r,
      |    CAST(sum(CASE WHEN epoch_us(ts) < $PSI_SPLIT_US THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT event_type,
      |    sum(r) OVER w AS cr, sum(c) OVER w AS cc,
      |    sum(r) OVER (PARTITION BY event_type) AS n_ref,
      |    sum(c) OVER (PARTITION BY event_type) AS n_cur
      |  FROM pv
      |  WINDOW w AS (PARTITION BY event_type ORDER BY cents
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type,
      |  CAST(max(n_ref) AS BIGINT) AS n_ref,
      |  CAST(max(n_cur) AS BIGINT) AS n_cur,
      |  CAST(max(abs(cr * n_cur - cc * n_ref)) AS BIGINT) AS d_num,
      |  round(CAST(max(abs(cr * n_cur - cc * n_ref)) AS DOUBLE)
      |        / (max(n_ref) * max(n_cur)), 4) AS ks
      |FROM cum GROUP BY 1""".stripMargin

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_hll_distinct" -> (qHllDistinct _),
    "q_hist_quantiles" -> (qHistQuantiles _),
    "q_quantile_view" -> (qQuantileView _),
    "q_cms_counts" -> (qCmsCounts _),
    "q_drift_psi" -> (qDriftPsi _),
    "q_drift_ks" -> (qDriftKs _),
    "q_drift_incr" -> (qDriftIncr _),
    "q_join_estimate" -> (qJoinEstimate _),
    "q_join_estimate_incr" -> (qJoinEstimateIncr _),
    "q_key_overlap" -> (qKeyOverlap _),
    "q_anomaly_windows" -> (qAnomalyWindows _),
    "q_seasonal_anomaly" -> (qSeasonalAnomaly _),
    "q_ewma_control"     -> (qEwmaControl _),
    "q_holt_forecast"    -> (qHoltForecast _),
    "q_wow_volume"       -> (qWowVolume _),
    "q_cusum_changepoint" -> (qCusumChangepoint _),
    "q_gap_fill" -> (qGapFill _))

  override def oracles: Seq[(String, String)] = Seq(
    "q_hll_distinct" -> qHllDistinctSql,
    "q_hist_quantiles" -> qHistQuantilesSql,
    "q_quantile_view" -> qQuantileViewSql,
    "q_cms_counts" -> qCmsCountsSql,
    "q_drift_psi" -> qDriftPsiSql,
    "q_drift_ks" -> qDriftKsSql,
    // the incremental monitor must converge to exactly the from-scratch
    // PSI — one oracle pins both paths
    "q_drift_incr" -> qDriftPsiSql,
    "q_join_estimate" -> qJoinEstimateSql,
    "q_join_estimate_incr" -> qJoinEstimateIncrSql,
    "q_key_overlap" -> qKeyOverlapSql,
    "q_anomaly_windows" -> qAnomalyWindowsSql,
    "q_seasonal_anomaly" -> qSeasonalAnomalySql,
    "q_ewma_control"     -> qEwmaControlSql,
    "q_holt_forecast"    -> qHoltForecastSql,
    "q_wow_volume"       -> qWowVolumeSql,
    "q_cusum_changepoint" -> qCusumChangepointSql,
    "q_gap_fill" -> qGapFillSql)
}
