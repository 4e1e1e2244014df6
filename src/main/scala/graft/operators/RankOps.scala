package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global-order statistics — tie-aware `rank()`,
  * `row_number()`, inclusive running sums, and the total row count —
  * over an arbitrarily large relation with NO single-partition window
  * anywhere in the plan.
  *
  * A plain `Window.orderBy(k)` with no partition key is exact but
  * funnels the whole relation through ONE task (Spark logs
  * `WindowExec: No Partition Defined` and moves every row to a single
  * partition) — the canonical 100 TB scale-killer. This helper keeps
  * the exact semantics and distributes the sort:
  *
  *   1. ''Bucket'': estimated balanced range boundaries of the leading
  *      sort key come from one `approx_percentile` aggregate
  *      (column-pruned to the key) that is evaluated EAGERLY — the
  *      single boundary row (at most `#buckets − 1` doubles) is
  *      collected at construction time and embedded as a literal
  *      array, so the window pass and the offset pass provably share
  *      ONE set of boundaries. (An in-plan broadcast branch would
  *      appear under both passes and rely on exchange reuse to
  *      deduplicate it; `approx_percentile`'s merge is shuffle-
  *      arrival-order dependent, so two live evaluations could
  *      disagree on a boundary value and bucket a boundary row
  *      inconsistently — unacceptable in an exactness primitive.)
  *      Every row's bucket id is `size(filter(bounds, b -> b < key))`
  *      — a codegen'd O(#buckets) scalar. Equal keys ALWAYS land in
  *      the same bucket and bucket ids are monotone in the key, so
  *      correctness never depends on the estimate's quality — a bad
  *      estimate only unbalances the buckets (and a constant key
  *      degenerates to one bucket, exactly like any range scheme).
  *   2. ''Local pass'': one hash shuffle on the bucket id, then ordinary
  *      partitioned windows compute the per-bucket rank / row number /
  *      running sums — each bucket sorts independently in parallel.
  *   3. ''Offsets'': per-bucket row counts and value totals collapse to
  *      ONE broadcast row holding a `#buckets`-element struct array —
  *      a plain aggregate whose map-side partial combine reduces each
  *      input partition to `#buckets` rows before a tiny shuffle, so
  *      the relation itself is shuffled exactly once (by step 2). Each
  *      output row adds the offsets of all earlier buckets with an
  *      `aggregate(filter(...))` pair over the broadcast array —
  *      again codegen'd O(#buckets) per row.
  *
  * Global rank of a row is then `offset_count + local_rank` (exact:
  * ties never straddle buckets), the running sum is
  * `offset_sum + local_running_sum`, and the total count is the array
  * total — all plain integer arithmetic, bit-identical to the
  * single-window form (RankOpsSpec proves equivalence property-style).
  *
  * Cost model at scale: ONE full shuffle of the relation (same as any
  * grouped window), two column-pruned side evaluations of the input
  * (the eager boundary sketch; bucket totals), and O(#buckets) extra
  * work per row. The only driver-side materialization is the single
  * `#buckets − 1`-element boundary array — bounded by configuration,
  * never by data. No partition-less WindowExec (PlanAuditSpec pins
  * this for every adopted query).
  *
  * Callers that request `rowNumCol` or `runningSums` must pass
  * `tiebreaks` that make the order total, or the result is
  * tie-order-dependent — same contract as the window form. `rankCol`
  * (tie-aware) is well-defined without tiebreaks. The leading sort key
  * must be non-null and castable to double (any numeric / date /
  * timestamp key qualifies).
  *
  * NOTE: construction is EAGER — the boundary sketch runs one Spark
  * job when this method is called (not when the result is acted on),
  * so even `.explain` on the returned frame implies one pass over
  * `df`'s key column.
  */
object RankOps {
  private val BKT = "__rk_bucket"
  private val BNDS = "__rk_bounds"
  private val LRN = "__rk_lrn"
  private val LRK = "__rk_lrk"
  private val STATS = "__rk_stats"

  /** `df` plus the requested exact global-order columns; see object doc.
    *
    * @param primary     leading sort expression (non-null, numeric-castable)
    * @param ascending   direction of `primary` in the global order
    * @param tiebreaks   remaining sort expressions (ascending), making the
    *                    order total where row-position semantics need it
    * @param rankCol     name for tie-aware `rank()` over the global order
    * @param rowNumCol   name for `row_number()` over the global order
    * @param runningSums (value expression, output name) pairs: inclusive
    *                    running `sum(value)` in ROWS frame over the order
    * @param countCol    name for the total row count (constant column)
    * @param runningMins (value expression, output name) pairs: inclusive
    *                    running `min(value)` in ROWS frame (integer
    *                    contract, like runningSums: values cast to long)
    * @param runningMaxs same, running `max(value)`
    * @param runningAvgs same, running `avg(value)` — emitted as the
    *                    IEEE division of the exact running long sum by
    *                    the global row number, so it is bit-replayable
    *                    by any engine that states it the same way
    * @param percentRankCol name for exact `percent_rank()` over the
    *                    global order: (rank − 1) / (n − 1) as an IEEE
    *                    double of exact integers (0.0 when n == 1) —
    *                    the SQL definition, ties share
    * @param ntile       (k, output name): exact `ntile(k)` over the
    *                    global order — first n mod k buckets hold
    *                    ceil(n/k) rows, the SQL definition, derived
    *                    from the exact global row number by integer
    *                    arithmetic
    * @param buckets     parallelism of the distributed sort; defaults to
    *                    `spark.sql.shuffle.partitions`
    */
  def withGlobalOrder(
      df: DataFrame,
      primary: Column,
      ascending: Boolean,
      tiebreaks: Seq[Column] = Nil,
      rankCol: Option[String] = None,
      rowNumCol: Option[String] = None,
      runningSums: Seq[(Column, String)] = Nil,
      countCol: Option[String] = None,
      runningMins: Seq[(Column, String)] = Nil,
      runningMaxs: Seq[(Column, String)] = Nil,
      runningAvgs: Seq[(Column, String)] = Nil,
      percentRankCol: Option[String] = None,
      ntile: Option[(Int, String)] = None,
      buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nb =
      if (buckets > 0) buckets else spark.sessionState.conf.numShufflePartitions
    val pd = primary.cast("double")
    // estimated bucket boundaries, computed ONCE eagerly and embedded
    // as a literal: both downstream passes see identical bounds by
    // construction (quality affects balance only, never the result —
    // see object doc). One bounded driver row: ≤ nb−1 doubles.
    val probs = (1 until nb).map(i => i.toDouble / nb)
    val bounds: Seq[Double] = df.agg(coalesce(
        percentile_approx(pd, typedLit(probs), lit(1000)),
        typedLit(Seq.empty[Double])).as(BNDS))
      .head().getSeq[Double](0)
    val lb = typedLit(bounds)
    val bucketOf =
      if (ascending) size(filter(lb, b => b < pd))
      else size(filter(lb, b => b > pd))
    val pre = df.withColumn(BKT, bucketOf.cast("int"))

    val primaryOrder = if (ascending) primary.asc else primary.desc
    val order = primaryOrder +: tiebreaks.map(_.asc)
    val w = Window.partitionBy(col(BKT)).orderBy(order: _*)
    // rank() ties on the PRIMARY key only (the window form's semantics
    // when callers write rank().over(orderBy(key))); tiebreaks serve
    // row_number / running sums
    val wRank = Window.partitionBy(col(BKT)).orderBy(primaryOrder)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var local = pre.withColumn(LRN, row_number().over(w).cast("long"))
    if (rankCol.isDefined || percentRankCol.isDefined)
      local = local.withColumn(LRK, rank().over(wRank).cast("long"))
    runningSums.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"__rk_ls_$i",
        sum(v.cast("long")).over(wRows))
    }
    runningMins.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"__rk_lmn_$i",
        min(v.cast("long")).over(wRows))
    }
    runningMaxs.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"__rk_lmx_$i",
        max(v.cast("long")).over(wRows))
    }
    runningAvgs.zipWithIndex.foreach { case ((v, _), i) =>
      local = local.withColumn(s"__rk_las_$i",
        sum(v.cast("long")).over(wRows))
    }

    // per-bucket counts/totals → ONE broadcast row. A plain aggregate
    // over the bucketed input: map-side partial combine reduces it to
    // #buckets rows per input partition before its (tiny) shuffle, so
    // the relation itself is shuffled only once — by the window.
    val statAggs: Seq[Column] =
      (count(lit(1)).cast("long").as("cnt") +:
        runningSums.zipWithIndex.map { case ((v, _), i) =>
          coalesce(sum(v.cast("long")), lit(0L)).as(s"s_$i")
        }) ++
        runningMins.zipWithIndex.map { case ((v, _), i) =>
          min(v.cast("long")).as(s"mn_$i")
        } ++
        runningMaxs.zipWithIndex.map { case ((v, _), i) =>
          max(v.cast("long")).as(s"mx_$i")
        } ++
        runningAvgs.zipWithIndex.map { case ((v, _), i) =>
          coalesce(sum(v.cast("long")), lit(0L)).as(s"as_$i")
        }
    val statFields: Seq[Column] =
      (col(BKT).as("b") +: col("cnt") +:
        runningSums.indices.map(i => col(s"s_$i"))) ++
        runningMins.indices.map(i => col(s"mn_$i")) ++
        runningMaxs.indices.map(i => col(s"mx_$i")) ++
        runningAvgs.indices.map(i => col(s"as_$i"))
    val statsRow = pre.groupBy(col(BKT))
      .agg(statAggs.head, statAggs.tail: _*)
      .agg(sort_array(collect_list(struct(statFields: _*))).as(STATS))

    def below = filter(col(STATS), x => x("b") < col(BKT))
    def sumOf(arr: Column, field: String): Column =
      coalesce(
        aggregate(arr, lit(0L), (acc, x) => acc + x(field)), lit(0L))

    var out = local.crossJoin(broadcast(statsRow))
    rankCol.foreach { c =>
      out = out.withColumn(c, sumOf(below, "cnt") + col(LRK))
    }
    rowNumCol.foreach { c =>
      out = out.withColumn(c, sumOf(below, "cnt") + col(LRN))
    }
    runningSums.zipWithIndex.foreach { case ((_, c), i) =>
      out = out.withColumn(c, sumOf(below, s"s_$i") + col(s"__rk_ls_$i"))
    }
    // earlier-bucket extremum: array_min/max over the broadcast prefix
    // (NULL when this is the first non-empty bucket); least/greatest
    // skip NULLs, so the local running extremum carries through
    runningMins.zipWithIndex.foreach { case ((_, c), i) =>
      out = out.withColumn(c,
        least(array_min(transform(below, x => x(s"mn_$i"))),
          col(s"__rk_lmn_$i")))
    }
    runningMaxs.zipWithIndex.foreach { case ((_, c), i) =>
      out = out.withColumn(c,
        greatest(array_max(transform(below, x => x(s"mx_$i"))),
          col(s"__rk_lmx_$i")))
    }
    runningAvgs.zipWithIndex.foreach { case ((_, c), i) =>
      out = out.withColumn(c,
        (sumOf(below, s"as_$i") + col(s"__rk_las_$i")) /
          (sumOf(below, "cnt") + col(LRN)))
    }
    countCol.foreach { c =>
      out = out.withColumn(c, sumOf(col(STATS), "cnt"))
    }
    percentRankCol.foreach { c =>
      val n = sumOf(col(STATS), "cnt")
      val grk = sumOf(below, "cnt") + col(LRK)
      out = out.withColumn(c,
        when(n <= 1L, lit(0.0))
          .otherwise((grk - lit(1L)).cast("double") / (n - lit(1L))))
    }
    ntile.foreach { case (k, c) =>
      require(k >= 1, s"NTILE bucket count must be >= 1, got $k")
      val n = sumOf(col(STATS), "cnt")
      val rn = sumOf(below, "cnt") + col(LRN)
      val kL = lit(k.toLong)
      // Column `/` is IEEE double division; floor() recovers the
      // integer quotient (exact for counts < 2^53)
      val q = floor(n / kL)   // base bucket size
      val r = n % kL          // first r buckets hold q + 1 rows
      out = out.withColumn(c,
        when(rn <= r * (q + lit(1L)),
          floor((rn - lit(1L)) / (q + lit(1L))))
          .otherwise(r + floor((rn - lit(1L) - r * (q + lit(1L))) / q))
          + lit(1L))
    }
    val temps = Seq(BKT, LRN, LRK, STATS) ++
      runningSums.indices.map(i => s"__rk_ls_$i") ++
      runningMins.indices.map(i => s"__rk_lmn_$i") ++
      runningMaxs.indices.map(i => s"__rk_lmx_$i") ++
      runningAvgs.indices.map(i => s"__rk_las_$i")
    out.drop(temps: _*)
  }

  private val stagedCache = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String, String), String]

  /** Stage a (typically pre-aggregated) relation to scratch parquet
    * once and return a reader over it — the checkpoint-before-
    * multi-pass move for [[withGlobalOrder]] inputs whose COMPUTATION
    * is expensive: the primitive's three passes (boundary probe,
    * bucket stats, main) would otherwise re-run the upstream
    * aggregation three times. At scale this is exactly how a feature
    * table feeds a ranking stage — materialized once, scanned
    * cheaply per pass. Use for computed inputs; inputs that are
    * already a column projection of a parquet table gain nothing.
    *
    * NOTE: EAGER — the first call per (session, label, sfDir) runs
    * the upstream plan as a parquet write job at construction time
    * (merely building the downstream DataFrame, e.g. for `.explain`,
    * executes it). Repeat calls with the same key — bench passes,
    * plan audits — reuse the one materialization, so scratch disk is
    * bounded by the number of distinct staged relations, not by the
    * number of invocations. `label` must uniquely identify the
    * computation; `sfDir` the input data it was derived from. */
  def staged(df: DataFrame, label: String, sfDir: String): DataFrame = {
    val dir = stagedCache.getOrElseUpdate((df.sparkSession, label, sfDir), {
      val d = graft.Scratch.dir(s"graft-rank-$label").resolve("t").toString
      df.write.parquet(d)
      d
    })
    df.sparkSession.read.parquet(dir)
  }

  /** Exact, ranked global top-`k` with NO window anywhere: the top-K
    * itself is `orderBy(...).limit(k)` — Catalyst plans
    * `TakeOrderedAndProject`, a per-partition top-K followed by a
    * K-row merge, never a single-partition sort of the input — and the
    * rank (plus optional running sums) attaches by collapsing the
    * bounded K-row result into ONE `array_sort`ed row and
    * `posexplode`-ing it back. (A `Window.partitionBy(lit(0))` over
    * the limited rows would be equivalent, but Catalyst folds the
    * constant away and leaves a partition-less WindowExec — the exact
    * plan shape this helper exists to banish.)
    *
    * @param keys        (column name, ascending) sort keys; must total-
    *                    order the rows for a deterministic result. NULL
    *                    keys order as Spark's defaults (asc = nulls
    *                    first, desc = nulls last), matching the
    *                    `orderBy` that selects the K rows.
    * @param rankName    output position column (1-based, long)
    * @param runningSums (source column, output name): inclusive prefix
    *                    sum over the sorted top-K — O(k²) on k rows
    */
  def topK(
      df: DataFrame,
      k: Int,
      keys: Seq[(String, Boolean)],
      rankName: String,
      runningSums: Seq[(String, String)] = Nil): DataFrame = {
    val order = keys.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val cols = df.columns.toSeq
    // comparator mirrors the orderBy exactly, including null placement
    // (asc = nulls first, desc = nulls last); a both-NULL key falls
    // through to the next key, like an equal key. Names are backtick-
    // quoted so non-identifier column names survive the SQL splice.
    val cmp = keys.map { case (c, asc) =>
      val q = s"`${c.replace("`", "``")}`"
      val (lt, gt) = if (asc) ("-1", "1") else ("1", "-1")
      s"WHEN l.$q IS NULL AND r.$q IS NOT NULL THEN $lt " +
        s"WHEN l.$q IS NOT NULL AND r.$q IS NULL THEN $gt " +
        s"WHEN l.$q < r.$q THEN $lt WHEN l.$q > r.$q THEN $gt"
    }.mkString(" ")
    val sorted = df.orderBy(order: _*).limit(k)
      .agg(collect_list(struct(cols.map(col): _*)).as("__tk"))
      .select(expr(s"array_sort(__tk, (l, r) -> CASE $cmp ELSE 0 END)")
        .as("__tk"))
    val exploded = sorted
      .select(col("__tk"), posexplode(col("__tk")).as(Seq("__pos", "__row")))
    val base: Seq[Column] =
      (col("__pos") + 1).cast("long").as(rankName) +:
        cols.map(c => col(s"__row.$c").as(c))
    val sums = runningSums.map { case (src, out) =>
      val q = s"`${src.replace("`", "``")}`"
      expr(s"aggregate(slice(__tk, 1, __pos + 1), 0L, (acc, x) -> acc + x.$q)")
        .as(out)
    }
    exploded.select(base ++ sums: _*)
  }
}
