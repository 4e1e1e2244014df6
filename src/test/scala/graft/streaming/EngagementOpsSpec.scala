package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Structural properties of the round-9 engagement/graph analytics
  * batch — q_survival_hazard, q_cohort_ltv, q_gini, q_active_users,
  * q_item_cooccur, q_triangle_count. The DuckDB oracle proves value
  * equality; these pin the INVARIANTS that make the numbers meaningful
  * (monotonicity, conservation, bounds, and a brute-force triangle
  * recount), so a refactor that stays hash-stable on one fixture but
  * breaks the math elsewhere still fails here.
  */
class EngagementOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("survival: risk set shrinks, cumulative hazard grows, deaths bounded") {
    val rows = run("q_survival_hazard")
      .orderBy($"lifetime_days")
      .select($"lifetime_days", $"n_risk", $"n_deaths", $"hazard_ppm",
        $"cum_hazard_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "fixture must produce at least one death time")
    rows.sliding(2).foreach {
      case Array((_, r1, _, _, c1), (_, r2, _, _, c2)) =>
        assert(r1 > r2, "n_risk must strictly shrink over death times")
        assert(c2 >= c1, "cumulative hazard is non-decreasing")
      case _ =>
    }
    rows.foreach { case (_, nRisk, d, h, _) =>
      assert(d > 0 && d <= nRisk)
      assert(h == d * 1000000L / nRisk)
    }
    // deaths can't exceed the population (= the largest risk set)
    assert(rows.map(_._3).sum <= rows.map(_._2).max)
  }

  test("cohort LTV: cumulative is a running sum; triangle mass = total purchase cents") {
    val ltv = run("q_cohort_ltv").cache()
    try {
      val perCohort = ltv.orderBy($"cohort_week_us", $"week_offset")
        .select($"cohort_week_us", $"week_cents", $"cum_cents")
        .as[(Long, Long, Long)].collect().groupBy(_._1)
      perCohort.values.foreach { rows =>
        var running = 0L
        rows.foreach { case (_, wk, cum) =>
          running += wk
          assert(cum == running, "cum_cents must be the running week sum")
        }
      }
      val triangleMass = ltv.agg(sum($"week_cents")).as[Long].head()
      val totalPurchase = graft.Tables.events(spark, sf)
        .filter($"event_type" === "purchase")
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)"))).as[Long].head()
      assert(triangleMass == totalPurchase,
        "every purchase cent lands in exactly one triangle cell")
    } finally ltv.unpersist()
  }

  test("gini: bounded to [0, 1e6); equals a driver-side recount") {
    val out = run("q_gini")
      .select($"metric", $"n", $"total", $"gini_ppm")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet == Set("revenue_cents", "event_count"))
    out.foreach { case (_, n, total, g) =>
      assert(n > 0 && total > 0)
      assert(g >= 0 && g < 1000000L)
    }
    // brute recount of the revenue metric from the raw events
    val perUser = graft.Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .as[(Long, Long)].collect().map(_._2).sorted
    // users with zero purchases still count: rebuild the full vector
    val nUsers = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    val xs = (Array.fill((nUsers - perUser.length).toInt)(0L) ++ perUser)
    val n = xs.length.toLong
    val total = xs.sum
    val wsum = xs.zipWithIndex.map { case (x, i) => (2L * (i + 1) - 1) * x }.sum
    val expected = (1000000L * (wsum - n * total)) / (n * total)
    val got = out.find(_._1 == "revenue_cents").get._4
    assert(got == expected, s"gini recount: got $got expected $expected")
  }

  test("active users: WAU dominates DAU and trailing-7 union bounds hold") {
    val rows = run("q_active_users").orderBy($"day")
      .select($"day", $"dau", $"wau", $"stickiness_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // contiguous day spine
    rows.sliding(2).foreach {
      case Array((d1, _, _, _), (d2, _, _, _)) => assert(d2 == d1 + 1)
      case _ =>
    }
    val dauByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, dau, wau, stick) =>
      val window = (day - 6 to day).map(d => dauByDay.getOrElse(d, 0L))
      assert(wau >= window.max, "WAU >= any single day's DAU in window")
      assert(wau <= window.sum, "WAU <= sum of window DAUs")
      assert(dau <= wau)
      if (wau > 0) assert(stick == dau * 1000000L / wau) else assert(stick == 0)
    }
  }

  test("new vs returning: decomposes DAU and conserves the population") {
    val nr = run("q_new_returning").orderBy($"day")
      .select($"day", $"n_new", $"n_returning", $"cum_users")
      .as[(Long, Long, Long, Long)].collect()
    assert(nr.nonEmpty)
    val dau = run("q_active_users")
      .select($"day", $"dau").as[(Long, Long)].collect().toMap
    nr.foreach { case (day, nNew, nRet, _) =>
      assert(nNew + nRet == dau(day), "dau = new + returning")
    }
    var cum = 0L
    nr.foreach { case (_, nNew, _, c) => cum += nNew; assert(c == cum) }
    val population = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(nr.last._4 == population,
      "cumulative acquisition curve ends at the distinct-user population")
  }

  test("event paths: rank order, user/occurrence nesting, trigram mass bound") {
    val rows = run("q_event_paths").orderBy($"rnk")
      .select($"rnk", $"path", $"n_occurrences", $"n_users")
      .as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.head._1 == 1L)
    rows.sliding(2).foreach {
      case Array((r1, p1, n1, _), (r2, p2, n2, _)) =>
        assert(r2 == r1 + 1)
        assert(n1 > n2 || (n1 == n2 && p1 < p2), "rank = (count desc, path asc)")
      case _ =>
    }
    rows.foreach { case (_, p, n, u) =>
      assert(p.split(">").length == 3, "paths are trigrams")
      assert(u >= 1 && u <= n, "a path's users can't exceed its occurrences")
    }
    // total trigram mass across ALL paths = sum over users of (n_i - 2)+
    val totalTrigrams = graft.Tables.events(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .select(sum(greatest($"n" - 2, lit(0L)))).as[Long].head()
    assert(rows.map(_._3).sum <= totalTrigrams)
  }

  test("peak concurrency: matches a brute-force sweep over the session set") {
    val DAY = 86400000000L
    val sessions = run("q_sessionize")
      .select($"session_start_us", $"session_end_us")
      .as[(Long, Long)].collect()
    // naive recount: evaluate concurrency at every session start within
    // each day (the max is always attained at some start mark)
    val byDay = sessions.flatMap { case (s0, e0) =>
      (s0 / DAY to e0 / DAY).map(d => (d, s0, e0))
    }.groupBy(_._1)
    val expected = byDay.map { case (day, ss) =>
      val marks = ss.map { case (_, s0, _) => math.max(s0, day * DAY) }
      val peak = marks.map { t =>
        ss.count { case (_, s0, e0) => math.max(s0, day * DAY) <= t && t <= e0 }
      }.max
      day -> (ss.length.toLong, peak.toLong)
    }
    val got = run("q_peak_concurrency")
      .select($"day", $"n_sessions", $"peak_concurrency")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (day, n, p) =>
      val (en, ep) = expected(day)
      assert(n == en, s"session count mismatch on day $day")
      assert(p == ep, s"peak mismatch on day $day: got $p expected $ep")
      assert(p >= 1 && p <= n)
    }
    assert(got.length == expected.size)
  }

  test("variant funnel: arms partition the overall funnel at every step") {
    val overall = run("q_funnel")
      .select($"step", $"n_users").as[(Int, Long)].collect().toMap
    val byVariant = run("q_funnel_by_variant")
      .select($"variant", $"step", $"n_users", $"conv_ppm")
      .as[(String, Int, Long, Long)].collect()
    assert(byVariant.map(_._1).toSet == Set("A", "B"))
    (1 to 3).foreach { step =>
      val arms = byVariant.filter(_._2 == step).map(_._3).sum
      assert(arms == overall(step),
        s"step $step: variant counts must partition the funnel")
    }
    byVariant.groupBy(_._1).values.foreach { arm =>
      val byStep = arm.map(r => r._2 -> r._3).toMap
      assert(byStep(1) >= byStep(2) && byStep(2) >= byStep(3),
        "each arm's funnel is monotone")
      arm.foreach { case (_, _, _, ppm) => assert(ppm >= 0 && ppm <= 1000000L) }
    }
  }

  test("hour heatmap: cell mass conserves events and bounds users") {
    val cells = run("q_hour_heatmap")
      .select($"dow", $"hour", $"n_events", $"n_users", $"sum_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(cells.nonEmpty && cells.length <= 168)
    cells.foreach { case (dow, hour, n, u, _) =>
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23)
      assert(u >= 1 && u <= n)
    }
    val totalEvents = graft.Tables.events(spark, sf).count()
    assert(cells.map(_._3).sum == totalEvents,
      "every event lands in exactly one cell")
  }

  test("feature matrix: rolling windows age out, recency and deltas replay") {
    val rows = run("q_feature_matrix")
      .orderBy($"user_id", $"day")
      .select($"user_id", $"day", $"n", $"day_cents", $"roll7_n",
        $"roll7_cents", $"gap_days", $"delta_n")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { series =>
      var prev: Option[(Long, Long)] = None // (day, n)
      series.foreach { case (_, day, n, cents, r7n, r7c, gap, dn) =>
        // recount the trailing-7-day window from the series itself
        val win = series.filter(r => r._2 >= day - 6 && r._2 <= day)
        assert(r7n == win.map(_._3).sum, "roll7_n must be a calendar range")
        assert(r7c == win.map(_._4).sum)
        assert(r7n >= n && r7c >= cents || cents < 0)
        prev match {
          case None =>
            assert(gap == 0L && dn == 0L, "first active day has no lags")
          case Some((pd, pn)) =>
            assert(gap == day - pd && gap >= 1)
            assert(dn == n - pn)
        }
        prev = Some((day, n))
      }
    }
  }

  test("item co-occurrence: counts nest and lift matches the marginals") {
    val rows = run("q_item_cooccur")
      .select($"item_x", $"item_y", $"n_x", $"n_y", $"n_xy", $"lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nUsers = graft.Tables.events(spark, sf)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id").distinct().count()
    rows.foreach { case (x, y, nx, ny, nxy, lift) =>
      assert(x < y, "pairs are emitted once, ordered")
      assert(nxy >= 2 && nxy <= math.min(nx, ny))
      assert(lift == nxy * nUsers * 1000000L / (nx * ny))
    }
  }

  test("triangles: per-node counts match a brute-force recount of the edge set") {
    // the same verified sims relation, counted naively in the driver
    val edges = SparkEntry.queries("q_minhash_lsh")(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val expected = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      // triangle {a,b,c} surfaces once per edge, each time crediting
      // the opposite corner — so every node ends with exactly its
      // per-triangle membership count
      (adj(a) intersect adj(b)).foreach(c => expected(c) += 1)
    }
    val got = run("q_triangle_count")
      .select($"doc_id", $"deg", $"n_tri", $"clustering_ppm")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, deg, tri, cc) =>
      assert(deg == adj(id).size, s"degree mismatch for $id")
      assert(tri == expected(id), s"triangle count mismatch for $id")
      assert(tri <= deg * (deg - 1) / 2)
      if (deg >= 2) assert(cc == 2 * tri * 1000000L / (deg * (deg - 1)))
      else assert(cc == 0)
    }
    assert(got.map(_._3).sum % 3 == 0, "triangle mass divides by 3")
  }
}
