package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic properties of the round-9 analytics/ordering batch:
  * Markov transitions, OHLC bars, exact KS drift, bigram LM scoring,
  * n-gram diversity, Pareto-front selection, and curriculum ordering.
  * The oracle rows pin cross-engine content; these pin the invariants
  * a user relies on (probability normalization, dominance soundness &
  * completeness, permutation validity, the exact KS definition).
  */
class OrderingAnalyticsSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------- markov transitions
  test("markov: transitions count every consecutive pair, rows normalize to ~1") {
    val out = run("q_markov_transitions").cache()
    try {
      val ev = Tables.events(spark, sf)
      val nPairs = out.agg(sum("n")).head.getLong(0)
      val expected = ev.count() - ev.select("user_id").distinct().count()
      assert(nPairs === expected) // one transition per non-first event
      // each row of the matrix sums to 1 within integer-ppm truncation
      val rows = out.groupBy("prev_type")
        .agg(sum("p_ppm").as("s"), count(lit(1)).as("k")).collect()
      rows.foreach { r =>
        val (s, k) = (r.getLong(1), r.getLong(2))
        assert(s <= 1000000L && s > 1000000L - k,
          s"row ${r.getString(0)}: ppm sum $s with $k cells")
      }
    } finally out.unpersist()
  }

  test("markov anomaly: covers every multi-event user, ppm fields bounded and consistent") {
    val out = run("q_markov_anomaly").cache()
    try {
      val ev = Tables.events(spark, sf)
      // every user with >= 2 events scores; transition totals reconcile
      val multi = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      assert(out.count() === multi.count())
      assert(out.agg(sum("n_transitions")).head.getLong(0) ===
        ev.count() - ev.select("user_id").distinct().count())
      out.collect().foreach { r =>
        val (imp, minP) = (r.getLong(2), r.getLong(3))
        assert(imp >= 0L && imp < 1000000L, s"improb ppm out of range: $imp")
        assert(minP >= 1L && minP <= 1000000L, s"min p ppm out of range: $minP")
        assert(imp <= 1000000L - minP,
          "mean improbability cannot exceed the rarest transition's")
      }
    } finally out.unpersist()
  }

  // -------------------------------------------------------- OHLC bars
  test("ohlc: bounds ordered, volume conserved, open/close from time order") {
    val out = run("q_ohlc_bars").cache()
    try {
      assert(out.filter(col("high_cents") < col("low_cents") ||
        col("open_cents") > col("high_cents") || col("open_cents") < col("low_cents") ||
        col("close_cents") > col("high_cents") || col("close_cents") < col("low_cents"))
        .count() === 0)
      val ev = Tables.events(spark, sf)
      assert(out.agg(sum("n")).head.getLong(0) === ev.count())
      assert(out.agg(sum("sum_cents")).head.getLong(0) ===
        ev.agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).head.getLong(0))
      // spot-check one bar's open against the raw first-by-time event
      val bar = out.orderBy("event_type", "day_us").head
      val first = ev
        .filter(col("event_type") === bar.getString(0))
        .withColumn("t", unix_micros(col("ts")))
        .filter(col("t") >= bar.getLong(1) && col("t") < bar.getLong(1) + 86400000000L)
        .orderBy("t", "event_id")
        .select(expr("CAST(round(value * 100) AS BIGINT)")).head.getLong(0)
      assert(bar.getLong(2) === first)
    } finally out.unpersist()
  }

  // ------------------------------------------------------- KS drift
  test("drift KS: matches the naive per-type sup of |F_ref - F_cur|") {
    val split = 1705363200000000L
    val raw = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val naive = raw.groupBy(_._1).map { case (ty, rows) =>
      val ref = rows.filter(_._2 < split).map(_._3).sorted
      val cur = rows.filter(_._2 >= split).map(_._3).sorted
      val ks = (ref ++ cur).distinct.map { v =>
        val fr = ref.count(_ <= v).toDouble / ref.length
        val fc = cur.count(_ <= v).toDouble / cur.length
        math.abs(fr - fc)
      }.max
      ty -> ks
    }
    val got = run("q_drift_ks").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    naive.foreach { case (ty, ks) =>
      assert(math.abs(got(ty) - ks) < 1e-4, s"$ty: got ${got(ty)} want $ks")
    }
  }

  // ------------------------------------------------------ bigram LM
  test("bigram LM: positive finite nll for every multi-token doc") {
    val out = run("q_bigram_lm").cache()
    try {
      val eligible = Tables.documents(spark, sf)
        .filter(size(expr("filter(split(lower(text), ' '), x -> length(x) > 0)")) >= 2)
        .count()
      assert(out.count() === eligible)
      // every interpolated P < 1 (vocab > 1), so mean -ln P > 0; and the
      // unigram floor keeps P >= 0.3/N, bounding nll above by ln(N/0.3)
      assert(out.filter(col("nll") <= 0.0).count() === 0)
      val nTok = Tables.documents(spark, sf)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0).count()
      val bound = math.log(nTok / 0.3) + 1e-4
      assert(out.filter(col("nll") > bound).count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------- n-gram diversity
  test("ngram diversity: ratios bounded, every language profiled") {
    val out = run("q_ngram_diversity").collect()
    assert(out.length === Tables.documents(spark, sf)
      .select("lang").distinct().count())
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // distinct <= total
      assert(r.getLong(3) > 0L && r.getLong(3) <= 1000000L)
    }
  }

  // ---------------------------------------------------- Pareto front
  test("pareto: sound (nothing dominated) and complete (all else dominated)") {
    val ptsDf = Tables.documents(spark, sf)
      .withColumn("ft", expr("filter(split(lower(text), ' '), t -> length(t) > 0)"))
      .select(col("doc_id"), col("n_chars").cast("long").as("x"),
        expr("size(array_distinct(ft)) * 1000L div size(ft)").as("y"))
    val pts = ptsDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(p: (Long, Long, Long)) = pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val front = run("q_pareto_select").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(front.nonEmpty)
    front.foreach(p => assert(!dominated(p), s"front point $p is dominated"))
    pts.filterNot(front).foreach(p =>
      assert(dominated(p), s"excluded point $p is undominated"))
  }

  // ---------------------------------------------------- ANN recall
  test("ann recall: bounded ppm, trained IVF finds most true neighbors") {
    val out = run("q_ann_recall").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 5L) // n_hit <= K
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
    }
    val mean = out.map(_.getLong(2)).sum.toDouble / out.length
    assert(mean >= 500000.0, s"mean recall_ppm $mean unexpectedly low")
  }

  // ----------------------------------------------- time-weighted avg
  test("TWA: inside each user's value envelope, holds = events - 1") {
    val out = run("q_time_weighted_avg").cache()
    try {
      val env = Tables.events(spark, sf)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          min(expr("CAST(round(value * 100) AS BIGINT)")).as("lo"),
          max(expr("CAST(round(value * 100) AS BIGINT)")).as("hi"))
      val j = out.join(env, "user_id")
      assert(j.filter(col("n_holds") =!= col("n") - 1).count() === 0)
      assert(j.filter(col("twa_cents") < col("lo") - 0.001 ||
        col("twa_cents") > col("hi") + 0.001).count() === 0)
      assert(out.filter(col("span_us") <= 0L).count() === 0)
    } finally out.unpersist()
  }

  // -------------------------------------------------- winsorization
  test("winsorize: identity inside the band, ~10% clipped, bounds honored") {
    val out = run("q_winsorize").cache()
    try {
      assert(out.count() === Tables.documents(spark, sf).count())
      assert(out.filter(!col("clipped") && col("w_chars") =!= col("n_chars"))
        .count() === 0)
      assert(out.filter(col("clipped") && col("w_chars") === col("n_chars"))
        .count() === 0)
      val fracClipped = out.filter(col("clipped")).count().toDouble / out.count()
      assert(fracClipped <= 0.25, s"clipped fraction $fracClipped")
      // clipping is order-preserving: w monotone in x within a language
      val viol = out.as("a").join(out.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.n_chars") < col("b.n_chars") &&
          col("a.w_chars") > col("b.w_chars"))
      assert(viol.count() === 0)
    } finally out.unpersist()
  }

  // ------------------------------------------------ windowed funnel
  test("windowed funnel: dominated by the unbounded funnel, view step equal") {
    val unbounded = run("q_funnel").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val windowed = run("q_funnel_windowed").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(windowed(1) === unbounded(1)) // stage 1 has no deadline
    assert(windowed(2) <= unbounded(2))
    assert(windowed(3) <= unbounded(3))
    assert(windowed(3) <= windowed(2) && windowed(2) <= windowed(1))
  }

  // ------------------------------------------------- conversion lag
  test("conversion lag: histogram mass equals the funnel's converted users") {
    val lag = run("q_conversion_lag").agg(sum("n_users")).head.getLong(0)
    val funnel3 = run("q_funnel").collect()
      .find(_.getInt(0) == 3).get.getLong(2)
    assert(lag === funnel3)
    assert(run("q_conversion_lag").filter(col("lag_days") < 0).count() === 0)
  }

  // ---------------------------------------------- seasonal anomaly
  test("seasonal anomaly: weekday buckets valid, scores finite") {
    val out = run("q_seasonal_anomaly").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 6L)
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite)
    }
  }

  // ------------------------------------------------- A/B test readout
  test("abtest: variants partition the users, rates bounded, z finite") {
    val r = run("q_abtest_metrics").head
    val totalUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(4) === totalUsers)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
    assert(r.getLong(7) >= 0L && r.getLong(7) <= 1000000L)
    assert(!r.getDouble(8).isNaN && !r.getDouble(8).isInfinite)
    // the synthetic feed has no real treatment effect: a |z| that
    // clears 5 sigma would mean the bucketing itself is biased
    assert(math.abs(r.getDouble(8)) < 5.0)
  }

  // ----------------------------------------------- RFM segmentation
  test("rfm: tercile scores populated, segment encodes the three digits") {
    val out = run("q_rfm").cache()
    try {
      val n = out.count()
      assert(n > 0)
      for (c <- Seq("r_score", "f_score", "m_score"); v <- 1L to 3L) {
        val k = out.filter(col(c) === v).count()
        assert(k > 0, s"$c=$v empty")
        assert(k <= 2 * n / 3 + 1, s"$c=$v holds $k of $n")
      }
      assert(out.filter(col("segment") =!=
        concat(col("r_score"), col("f_score"), col("m_score"))).count() === 0)
      // best recency tercile really is the most recent third
      val r3max = out.filter(col("r_score") === 3)
        .agg(max("recency_days")).head.getLong(0)
      val r1min = out.filter(col("r_score") === 1)
        .agg(min("recency_days")).head.getLong(0)
      assert(r3max <= r1min)
    } finally out.unpersist()
  }

  // ---------------------------------------------- CUSUM changepoint
  test("cusum: one changepoint per type, max |cusum| is the argmax") {
    val out = run("q_cusum_changepoint").collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(out.length === types)
    out.foreach { r =>
      assert(r.getLong(2) >= 0L)
      assert(r.getDouble(3) >= 0.0 && !r.getDouble(3).isNaN)
    }
  }

  // ------------------------------------------------ curriculum order
  test("curriculum: strict permutation, stage-major, deterministic") {
    val out = run("q_curriculum_order").cache()
    try {
      val n = Tables.documents(spark, sf).count()
      assert(out.count() === n)
      assert(out.select("order_idx").distinct().count() === n)
      assert(out.agg(min("order_idx"), max("order_idx")).head match {
        case r => r.getLong(0) === 1L && r.getLong(1) === n
      })
      // easy->hard: stage is non-decreasing along the global order
      val seq = out.orderBy("order_idx").select("stage").collect().map(_.getLong(0))
      seq.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => }
      // reruns yield the identical permutation (seeded md5, no RNG)
      val again = run("q_curriculum_order")
      assert(out.exceptAll(again).count() === 0)
    } finally out.unpersist()
  }

  test("ABC analysis: classes are revenue-ordered bands and conserve the total") {
    import spark.implicits._
    val rows = run("q_abc_analysis")
      .select($"l_partkey", $"rev_cents", $"cum_cents", $"abc_class")
      .as[(Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._4).toSet.subsetOf(Set("A", "B", "C")))
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).max == total, "running sum ends at the total")
    // class bands respect the revenue ordering: min A-revenue >= max
    // B-revenue >= max C-revenue (ties split by partkey, so >=)
    val byClass = rows.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
    for {
      a <- byClass.get("A"); b <- byClass.get("B")
    } assert(a.min >= b.max)
    for {
      b <- byClass.get("B"); c <- byClass.get("C")
    } assert(b.min >= c.max)
    // the A band's share really is <= 80% (and B's cumulative <= 95%)
    byClass.get("A").foreach { a =>
      assert(a.sum * 100 <= total * 80)
    }
    assert(rows.count(_._4 == "A") < rows.length,
      "the Pareto cut must be proper on a skewed revenue distribution")
  }

  test("drawdown: high-water is a running max, drawdowns are non-negative") {
    import spark.implicits._
    val rows = run("q_drawdown")
      .orderBy($"event_type", $"day_us")
      .select($"event_type", $"day_us", $"close_cents",
        $"high_water_cents", $"drawdown_cents", $"max_drawdown_cents")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { series =>
      var hw = Long.MinValue
      var mdd = 0L
      series.foreach { case (_, _, close, gotHw, dd, gotMdd) =>
        hw = math.max(hw, close)
        assert(gotHw == hw, "high-water mark is the running max of closes")
        assert(dd == hw - close && dd >= 0)
        mdd = math.max(mdd, dd)
        assert(gotMdd == mdd, "max drawdown is the running max of drawdowns")
      }
    }
  }
}
