package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Correctness contract for the sketch aggregates. The driver gate
  * (q_hll_distinct) hash-verifies exact counts + a within-2% verdict
  * cross-engine; these tests pin the RAW estimates the gate reduces
  * away — sketch bytes and estimates are engine-specific, so only the
  * verdict is oracle-able. */
class SketchesSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // cached across the three tests, UNPERSISTED after: a leaked cache
  // entry here hijacks every later read of the same parquet path in
  // the shared session (CacheManager plan-matching turns the scan into
  // an InMemoryRelation with no pushed filters — observed breaking
  // PlanAuditSpec's pushdown assertions)
  private lazy val li = Tables.lineitem(spark, sf).cache()

  override def afterAll(): Unit = li.unpersist()

  test("HLL per-group estimates are within 2% of exact distinct counts") {
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.hllEstimates(spark, sf)
      .filter($"l_returnflag" =!= "ALL")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((k, est) <- approx) {
      val err = math.abs(est.toDouble - exact(k)) / exact(k)
      assert(err <= 0.02, s"group $k: estimate $est vs exact ${exact(k)} (err $err)")
    }
  }

  test("driver-gate query reports within_2pct on every row incl. the unioned ALL") {
    val gate = Sketches.queries.toMap.apply("q_hll_distinct")(spark, sf)
      .as[(String, Long, Boolean)].collect()
    assert(gate.length === 4) // 3 return flags + ALL
    assert(gate.forall(_._3), s"sketch outside 2% envelope: ${gate.mkString(", ")}")
  }

  test("union of group sketches stays in the one-shot sketch's error envelope") {
    val grouped = li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .as[Long].head()
    val oneShot = li.agg(hll_sketch_estimate(hll_sketch_agg($"l_orderkey")))
      .as[Long].head()
    // registers are NOT bit-identical (sparse→dense promotion happens
    // at different points when the scan is split by group — measured:
    // 1467 vs 1473 here), but the union contract is that merging adds
    // no error beyond the HLL envelope: both estimates sit within 2%
    // of exact and within 1% of each other
    val exact = li.agg(countDistinct($"l_orderkey")).as[Long].head()
    assert(math.abs(grouped.toDouble - oneShot) / oneShot <= 0.01,
      s"union $grouped vs one-shot $oneShot")
    assert(math.abs(grouped.toDouble - exact) / exact <= 0.02)
    assert(math.abs(oneShot.toDouble - exact) / exact <= 0.02)
  }

  test("approx percentile respects the rank-error bound") {
    val accuracy = 10000 // default; rank error <= 1/accuracy
    val n = li.count()
    val approxP50 = li
      .agg(percentile_approx($"l_extendedprice", lit(0.5), lit(accuracy)))
      .as[Double].head()
    // rank of the returned value must sit within eps*N of the true
    // median rank — the GK-sketch contract, checked directly
    val rank = li.filter($"l_extendedprice" <= approxP50).count()
    val eps = 1.0 / accuracy
    assert(math.abs(rank - 0.5 * n) <= eps * n + 1,
      s"rank $rank of approx median vs target ${0.5 * n} (n=$n)")
  }

  test("histogram quantile estimates land within one bucket width of exact") {
    val (mn, mx) = li
      .agg(min($"l_extendedprice").cast("double"),
        max($"l_extendedprice").cast("double"))
      .as[(Double, Double)].head()
    val width = (mx - mn) / 256
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    val rows = graft.SparkEntry.queries("q_hist_quantiles")(spark, sf)
      .filter($"l_returnflag" =!= "ALL")
      .select($"l_returnflag", $"q", $"est")
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, q, est) =>
      val idx = Seq(0.5, 0.9, 0.99).indexOf(q)
      val truth = exact(flag)(idx)
      assert(math.abs(est - truth) <= width + 1e-9,
        f"$flag p$q: est $est%.2f vs exact $truth%.2f exceeds bucket width $width%.2f")
    }
    // and the ALL row merges the group histograms, not a rescan: its n
    // equals the total row count
    val allN = graft.SparkEntry.queries("q_hist_quantiles")(spark, sf)
      .filter($"l_returnflag" === "ALL").select($"n").as[Long].head()
    assert(allN === li.count())
  }

  test("count-min estimates are one-sided and within the CMS error bound") {
    val rows = graft.SparkEntry.queries("q_cms_counts")(spark, sf)
      .select("term", "n_exact", "n_est")
      .as[(String, Long, Long)].collect()
    assert(rows.length === 15)
    val totalTokens = graft.Tables.documents(spark, sf)
      .select(explode(split(lower($"text"), " ")).as("t"))
      .filter(length($"t") > 0).count()
    rows.foreach { case (term, exact, est) =>
      // CMS never undercounts
      assert(est >= exact, s"'$term': estimate $est under exact $exact")
      // overshoot bound: expected collision mass per counter is N/256;
      // the min over 4 independent rows stays well under 4x that
      assert(est - exact <= totalTokens * 4 / 256,
        s"'$term': overshoot ${est - exact} breaks the CMS bound")
    }
  }

  test("AMS join estimate lands within the variance envelope of exact") {
    val rows = graft.SparkEntry.queries("q_join_estimate")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 2)
    rows.foreach { case (name, est, exact) =>
      assert(exact > 0, s"$name: fixture join must be non-empty")
      // per-row sd is ~sqrt(F2_A*F2_B/4096); the median of 5 rows on
      // these fixtures sits well within 20% of truth
      val rel = math.abs(est.toDouble / exact - 1.0)
      assert(rel < 0.2, s"$name: estimate $est vs exact $exact (rel $rel)")
    }
  }

  test("AMS join estimate of a degenerate (empty-relation) sketch is empty") {
    // ADVICE r14: the window-free median pick must preserve the old
    // rank-filter contract — an empty relation's sketch has no grid
    // rows, so the estimate yields ZERO rows, not a null-est row
    import org.apache.spark.sql.functions.lit
    val empty = graft.Tables.orders(spark, sf).filter(lit(false))
    val est = Sketches.amsJoinEstimate(
      Sketches.amsSketch(empty, "o_orderkey"),
      Sketches.amsSketch(graft.Tables.lineitem(spark, sf), "l_orderkey"))
    assert(est.isEmpty, "degenerate sketch join must produce no estimate row")
  }

  test("AMS sketches merge by addition (per-shard grids sum to the global grid)") {
    val oa = graft.Tables.orders(spark, sf)
    val lo = oa.filter($"o_orderkey" % 2 === 0)
    val hi = oa.filter($"o_orderkey" % 2 =!= 0)
    val whole = Sketches.amsSketch(oa, "o_orderkey")
      .as[(Int, String, Long)].collect().toSet
    val merged = Sketches.amsSketch(lo, "o_orderkey")
      .unionAll(Sketches.amsSketch(hi, "o_orderkey"))
      .groupBy($"i", $"b").agg(sum($"v").as("v"))
      .filter($"v" =!= 0L)
      .as[(Int, String, Long)].collect().toSet
    assert(merged === whole.filter(_._3 != 0L),
      "summed per-shard grids must equal the one-shot grid")
  }

  test("incrementally-maintained AMS grid estimates exactly like a rebuild") {
    val incr = graft.SparkEntry.queries("q_join_estimate_incr")(spark, sf)
      .as[(String, Long, Long)].collect().head
    val su = graft.Tables.supplier(spark, sf).filter($"s_suppkey" % 17 =!= 3)
    val li = graft.Tables.lineitem(spark, sf)
    val batch = Sketches.amsJoinEstimate(
      Sketches.amsSketch(su, "s_suppkey"),
      Sketches.amsSketch(li, "l_suppkey")).as[Long].collect().head
    assert(incr._2 === batch,
      "grid maintained through append+delete churn must estimate like a rebuild")
    assert(incr._3 > 0)
  }

  test("KMV overlap estimate lands within the 1/sqrt(k) envelope of exact Jaccard") {
    val r = graft.SparkEntry.queries("q_key_overlap")(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double)].collect().head
    val (k, nBoth, est, nInter, nUnion, exact) = r
    assert(k === 64L && nBoth <= k)
    assert(nUnion >= nInter && nUnion > 0)
    // sd of the estimator is ~sqrt(J(1-J)/k) <= 0.0625; allow 4 sd
    assert(math.abs(est - exact) <= 0.25,
      s"KMV Jaccard $est too far from exact $exact")
  }

  test("KMV signatures merge: bottom-k of shard signatures equals the global signature") {
    val ev = graft.Tables.events(spark, sf)
    val whole = Sketches.kmvSignature(ev, "user_id")
      .as[(Long, String)].collect().toSet
    val lo = Sketches.kmvSignature(ev.filter($"user_id" % 2 === 0), "user_id")
    val hi = Sketches.kmvSignature(ev.filter($"user_id" % 2 =!= 0), "user_id")
    val merged = lo.unionAll(hi).dropDuplicates("key")
      .orderBy($"h").limit(64).as[(Long, String)].collect().toSet
    assert(merged === whole, "per-shard bottom-k must merge losslessly")
  }

  test("gap fill synthesizes exactly the missing spine days as zero rows") {
    import java.sql.Date
    val daily = Seq(
      ("click", Date.valueOf("2024-03-01"), 10L),
      ("click", Date.valueOf("2024-03-04"), 12L), // 02, 03 missing
      ("view", Date.valueOf("2024-03-02"), 7L))   // 01, 03, 04 missing
      .toDF("event_type", "day", "n")
    val got = Sketches.gapFill(daily)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === 8, "spine must be |types| x |days|")
    assert(got(("click", "2024-03-02")) === ((0L, true)))
    assert(got(("click", "2024-03-03")) === ((0L, true)))
    assert(got(("click", "2024-03-01")) === ((10L, false)))
    assert(got(("view", "2024-03-02")) === ((7L, false)))
    assert(got(("view", "2024-03-04")) === ((0L, true)))
    // a filled zero day chained into the anomaly monitor scores negative
    assert(got.values.count(_._2) === 5)
  }

  test("shard manifest checksums are order-independent and shard-complete") {
    val m = graft.SparkEntry.queries("q_shard_manifest")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val docs = graft.Tables.documents(spark, sf)
    assert(m.map(_._2).sum === docs.count(), "manifest must cover every doc")
    assert(m.map(_._1).distinct.length === m.length)
    assert(m.forall(r => r._1 >= 0 && r._1 < 16))
    assert(m.map(_._3).sum ===
      docs.agg(sum($"n_chars")).as[Long].collect().head)
    // order-independence: per-doc hash terms summed in reverse order
    // reproduce each shard's checksum exactly
    val byHand = docs
      .selectExpr(
        s"CAST(conv(substring(md5(concat(cast(doc_id AS string), '#42')), 1, 4), 16, 10) AS BIGINT) % 16 AS shard",
        "CAST(conv(substring(md5(concat(cast(doc_id AS string), '|', text)), 1, 8), 16, 10) AS BIGINT) AS h")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (sh, rs) =>
        sh -> rs.map(_._2).sortBy(-_).sum } // reversed summation order
    m.foreach { case (sh, _, _, ck) =>
      assert(byHand(sh) === ck, s"shard $sh checksum must be order-free") }
  }

  test("trailing-window anomaly detection flags a planted spike, and only it") {
    import java.sql.Date
    val base = (1 to 20).map { day =>
      val n = if (day == 15) 500L else 40L + (day % 3) // spike on day 15
      ("click", Date.valueOf(f"2024-03-$day%02d"), n)
    }
    val daily = base.toDF("event_type", "day", "n")
    val got = Sketches.anomalyScores(daily)
      .as[(String, String, Long, Double, Boolean)].collect()
      .map(r => r._2 -> r).toMap
    // warm-up: first 7 days unscored
    assert(got.size === 13)
    assert(!got.contains("2024-03-01") && !got.contains("2024-03-07"))
    val anomalous = got.values.filter(_._5).map(_._2.toString).toSet
    assert(anomalous === Set("2024-03-15"),
      s"exactly the planted spike must flag: $anomalous")
    assert(got("2024-03-15")._4 > 3.0)
    // steady days score near zero
    assert(math.abs(got("2024-03-12")._4) < 3.0)
  }

  test("Holt forecast: final state replays the recurrence, projections extrapolate it") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_holt_forecast")(spark, sf)
      .select($"event_type", $"h", $"forecast_day", $"forecast_milli",
        $"level_milli", $"trend_milli")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // recompute the daily series and replay the integer recurrence
    val daily = graft.Tables.events(spark, sf)
      .groupBy($"event_type",
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (ty, xs) =>
        val series = xs.sortBy(_._2)
        var l = series.head._3 * 1000L; var b = 0L
        series.tail.foreach { case (_, _, n) =>
          val l2 = (n * 1000L + l + b) / 2
          b = (l2 - l + b) / 2; l = l2
        }
        ty -> ((series.last._2, l, b))
      }
    rows.groupBy(_._1).foreach { case (ty, fs) =>
      val (lastDay, l, b) = daily(ty)
      assert(fs.map(_._2).sorted.toSeq === (1L to 7L),
        s"$ty: horizons must be exactly 1..7")
      fs.foreach { case (_, h, fDay, fMilli, lm, bm) =>
        assert(lm === l && bm === b, s"$ty: final Holt state mismatch")
        assert(fDay === lastDay + h)
        assert(fMilli === l + h * b, s"$ty: projection arithmetic")
      }
    }
  }

  test("WoW volume: totals reconcile, first weeks null, growth arithmetic exact") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_wow_volume")(spark, sf)
      .select($"event_type", $"week", $"n", $"prev_n", $"wow_ppm")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum ===
      graft.Tables.events(spark, sf).count())
    rows.groupBy(_.getString(0)).values.foreach { series =>
      val sorted = series.sortBy(_.getLong(1))
      assert(sorted.head.isNullAt(3) && sorted.head.isNullAt(4),
        "first week must report null prev/growth")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) === a.getLong(2), "prev_n must chain")
          assert(b.getLong(4) ===
            (b.getLong(2) - b.getLong(3)) * 1000000L / b.getLong(3))
        case _ =>
      }
    }
  }

  test("EWMA control: trajectory replays the integer recurrence exactly") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("q_ewma_control")(spark, sf)
      .orderBy($"event_type", $"day")
      .select($"event_type", $"day", $"n", $"ewma_milli", $"resid_milli",
        $"alert")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { series =>
      var prev: Option[Long] = None
      series.foreach { case (_, _, n, s, resid, alert) =>
        val expected = prev match {
          case None    => n * 1000L
          case Some(p) => (p + n * 1000L) / 2
        }
        assert(s == expected, "EWMA recurrence must replay exactly")
        prev match {
          case None =>
            assert(resid == 0L && !alert, "first point never alerts")
          case Some(p) =>
            assert(resid == n * 1000L - p)
            assert(alert == (math.abs(resid) * 2 > p))
        }
        prev = Some(s)
      }
    }
  }
}
