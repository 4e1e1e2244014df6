package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Test event shape (top-level: inner case classes have no encoder). */
private[streaming] case class Ev(
    user_id: Long, ts: Timestamp, event_type: String, value: Double)

/** Event-time semantics of [[EventWindows]]: watermark-closed windows,
  * late-row dropping, and streaming/batch convergence of the
  * `flatMapGroupsWithState` sessionizer (value-level parity of the batch
  * path is the DuckDB oracle gate — `q_event_windows`/`q_sessionize`).
  *
  * Watermark mechanics the sequences below rely on: the watermark used
  * DURING batch N is computed from event times seen through batch N−1
  * (max event time − delay); an aggregation window is emitted (append
  * mode) and its rows start being dropped once the watermark passes the
  * WINDOW END; an event-time timeout fires in the first batch whose
  * in-effect watermark exceeds the timeout timestamp. */
class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-03-01 $hhmm:00")

  test("windowed agg: a window emits once the watermark passes its end; late rows drop") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.windowedAgg(mem.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      // hour 10 gets two click events
      mem.addData(Ev(1, t("10:05"), "click", 1.10),
        Ev(1, t("10:20"), "click", 2.20), Ev(2, t("11:05"), "view", 3.00))
      q.processAllAvailable()
      mem.addData(Ev(2, t("12:00"), "view", 4.00)) // watermark -> 11:30
      q.processAllAvailable()
      // this batch runs under watermark 11:30 > 11:00: hour 10 closes
      // and emits with its 2 events
      mem.addData(Ev(2, t("13:00"), "view", 5.00))
      q.processAllAvailable()
      // hour 10 is now CLOSED (end 11:00 < watermark 12:30): the 10:10
      // arrival must be dropped, not appended to an emitted window
      mem.addData(Ev(3, t("10:10"), "click", 99.0), Ev(2, t("14:00"), "view", 6.00))
      q.processAllAvailable()
      mem.addData(Ev(2, t("15:00"), "view", 7.00))
      q.processAllAvailable()

      val clicks = spark.table("win_out")
        .filter($"event_type" === "click")
        .select("window_start_us", "n_events", "sum_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(clicks === Set((t("10:00").getTime * 1000L, 2L, 3.30)),
        "exactly the hour-10 click window, WITHOUT the late 10:10 row")
    } finally q.stop()
  }

  test("sessionizer: event-time timeouts close sessions; streaming equals batch") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.sessionize(mem.toDF(), gapMinutes = 60,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    val rows = Seq(
      // user 1: two sessions (gap 09:30->11:30 > 60m); user 2: one
      Ev(1, t("09:00"), "click", 1.00), Ev(1, t("09:30"), "click", 2.00),
      Ev(2, t("09:45"), "view", 10.00),
      Ev(1, t("11:30"), "click", 4.00), Ev(2, t("10:15"), "view", 20.00))
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      // push the watermark far past every end+gap so all state times out
      mem.addData(Ev(9, t("20:00"), "x", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(9, t("23:00"), "x", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_out").as[Session].collect()
        .filter(_.user_id != 9).toSet
      val batch = EventWindows.sessionize(
          rows.toDF(), gapMinutes = 60).collect().toSet
      assert(streamed === batch)
      assert(streamed.count(_.user_id == 1) === 2, "gap splits user 1")
      assert(streamed.count(_.user_id == 2) === 1, "user 2 stays one session")
    } finally q.stop()
  }

  test("sessionizer: a row later than the watermark is dropped, not mis-sessioned") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.sessionize(mem.toDF(), gapMinutes = 60,
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, t("09:00"), "click", 1.00), Ev(1, t("12:00"), "click", 2.00))
      q.processAllAvailable()
      // watermark 11:50 — a 09:05 arrival is below it: dropped before state
      mem.addData(Ev(1, t("09:05"), "click", 99.0))
      q.processAllAvailable()
      mem.addData(Ev(9, t("23:00"), "x", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(9, t("23:30"), "x", 0.0)) // fires the 13:00 timeout
      q.processAllAvailable()

      val sessions = spark.table("sess_late").as[Session].collect()
        .filter(_.user_id == 1)
      assert(sessions.map(_.n_events).toSeq.sorted === Seq(1L, 1L))
      assert(!sessions.exists(_.sum_value == 100.0),
        "the late 09:05 row must not have merged into the 09:00 session")
    } finally q.stop()
  }

  test("stream-stream interval join matches batch and drops watermark-late rows") {
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = EventWindows.intervalJoin(
      purchases.toDF().select($"user_id", $"ts".as("pts"), $"value".as("pv")),
      clicks.toDF().select($"user_id", $"ts".as("cts"), $"value".as("cv")),
      Seq("user_id"), "pts", "cts", "30 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, t("09:50"), "click", 1.0), Ev(1, t("09:00"), "click", 2.0))
      purchases.addData(Ev(1, t("10:00"), "purchase", 50.0))
      q.processAllAvailable()
      // out-of-order but within watermark: still joins
      clicks.addData(Ev(1, t("09:55"), "click", 3.0))
      q.processAllAvailable()
      // advance both watermarks far past 10:00
      clicks.addData(Ev(9, t("12:00"), "click", 0.0))
      purchases.addData(Ev(9, t("12:00"), "purchase", 0.0))
      q.processAllAvailable()
      // a click this late is below the watermark: dropped, no pair
      clicks.addData(Ev(1, t("09:59"), "click", 99.0))
      q.processAllAvailable()

      val streamed = spark.table("ssj_out")
        .filter($"user_id" === 1).select("cv").as[Double].collect().toSet
      assert(streamed === Set(1.0, 3.0),
        "clicks within 30m join; 09:00 is outside the interval; 09:59 arrived late")
      // batch plan over the same (non-late) rows agrees
      val bp = Seq(Ev(1, t("10:00"), "purchase", 50.0))
        .toDF().select($"user_id", $"ts".as("pts"), $"value".as("pv"))
      val bc = Seq(Ev(1, t("09:50"), "click", 1.0), Ev(1, t("09:00"), "click", 2.0),
          Ev(1, t("09:55"), "click", 3.0))
        .toDF().select($"user_id", $"ts".as("cts"), $"value".as("cv"))
      val batch = EventWindows.intervalJoin(bp, bc, Seq("user_id"),
        "pts", "cts", "30 minutes").select("cv").as[Double].collect().toSet
      assert(batch === streamed)
    } finally q.stop()
  }

  test("dedup within watermark collapses stream duplicates with bounded state") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventWindows.dedupWithinWatermark(mem.toDF(), Seq("event_type"),
        "30 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // same key twice in one batch and again in the next (within the
      // watermark): one survivor
      mem.addData(Ev(1, t("10:00"), "click", 1.0), Ev(2, t("10:05"), "click", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(3, t("10:10"), "click", 3.0), Ev(4, t("10:20"), "view", 4.0))
      q.processAllAvailable()
      mem.addData(Ev(5, t("15:00"), "x", 0.0)) // expire the dedup state
      q.processAllAvailable()
      // far past the watermark: the key's state is gone, so this is a
      // NEW occurrence (the documented bounded-state trade)
      mem.addData(Ev(6, t("15:05"), "click", 6.0))
      q.processAllAvailable()

      val clicks = spark.table("dedup_out").filter($"event_type" === "click")
        .select("value").as[Double].collect().sorted.toSeq
      assert(clicks === Seq(1.0, 6.0),
        "one survivor inside the window, a fresh one after state expiry")
    } finally q.stop()
  }

  test("stream-static enrichment equals batch, stateless and broadcast") {
    implicit val ctx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val evs = Seq(
      Ev(1, t("10:00"), "click", 1.0),
      Ev(2, t("10:05"), "view", 2.0),
      Ev(9, t("10:10"), "click", 3.0)) // no dim row: left join keeps it
    val mem = MemoryStream[Ev]
    val q = EventWindows.enrichWithDim(mem.toDF(), dim, "user_id", "c_custkey")
      .select($"user_id", $"value", $"c_mktsegment")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData(evs.take(2): _*)
      q.processAllAvailable()
      mem.addData(evs.drop(2): _*)
      q.processAllAvailable()

      val streamed = spark.table("enrich_out")
        .as[(Long, Double, Option[String])].collect().toSet
      val batch = EventWindows
        .enrichWithDim(evs.toDF(), dim, "user_id", "c_custkey")
        .select($"user_id", $"value", $"c_mktsegment")
        .as[(Long, Double, Option[String])].collect().toSet
      assert(streamed === batch, "stream-static join must equal the batch join")
      assert(streamed.exists(_._3.isEmpty), "unmatched fact row survives (left join)")

      // stateless: no streaming state operator; map-side: broadcast join
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty,
        s"stream-static broadcast join must keep NO state: ${p.prettyJson}")
    } finally q.stop()
    val bp = EventWindows.enrichWithDim(evs.toDF(), dim, "user_id", "c_custkey")
      .queryExecution.executedPlan.toString
    assert(bp.contains("BroadcastHashJoin"), s"dim side must broadcast:\n$bp")
  }

  test("batch sessionize over the real events table is a partition of the events") {
    val events = Tables.events(spark, sf)
    val sessions = EventWindows.sessionize(events).cache()
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events.count())
    // sessions of one user never overlap: end + gap < next start
    val gapUs = EventWindows.DefaultGapMinutes * 60L * 1000000L
    val overlaps = sessions.toDF().alias("a").join(sessions.toDF().alias("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_end_us") + gapUs >= col("b.session_start_us") &&
        col("a.session_start_us") < col("b.session_start_us")).count()
    assert(overlaps === 0L)
  }

  test("funnel steps are monotone and bounded by per-type user counts") {
    val events = Tables.events(spark, sf)
    val steps = graft.SparkEntry.queries("q_funnel")(spark, sf)
      .orderBy("step").select("n_users").as[Long].collect()
    assert(steps.length === 3)
    // each step's population is a subset of the previous step's
    assert(steps(0) >= steps(1) && steps(1) >= steps(2))
    // step 1 is exactly the users with any 'view'; later steps can never
    // exceed the users that have the step's event type at all
    val byType = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(steps(0) === byType("view"))
    assert(steps(1) <= byType("click") && steps(2) <= byType("purchase"))
  }

  test("retention triangle: offsets are non-negative, week 0 covers every user") {
    val events = Tables.events(spark, sf)
    val ret = graft.SparkEntry.queries("q_retention")(spark, sf).cache()
    try {
      assert(ret.filter(col("week_offset") < 0).count() === 0)
      // every user is active in their own cohort week, so the offset-0
      // diagonal sums to the total user population
      val diag = ret.filter(col("week_offset") === 0)
        .agg(sum("n_users")).head().getLong(0)
      assert(diag === events.select("user_id").distinct().count())
      // no (cohort, offset) cell can exceed its cohort's diagonal size
      val d = ret.filter(col("week_offset") === 0)
        .select(col("cohort_week_us"), col("n_users").as("cohort_size"))
      assert(ret.join(d, "cohort_week_us")
        .filter(col("n_users") > col("cohort_size")).count() === 0)
    } finally { ret.unpersist(); () }
  }

  test("last-touch attribution equals the naive join+argmax formulation") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("value"))
    val attr = graft.SparkEntry.queries("q_attribution")(spark, sf).cache()
    try {
      // one output row per purchase event
      assert(attr.count() ===
        events.filter(col("event_type") === "purchase").count())
      // naive reference: purchases x touches banded theta join, argmax
      // by (t, event_id) per purchase
      val p = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("t").as("pt"), col("value"))
      val touches = events
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id").as("tid"),
          col("event_type").as("tty"), col("t").as("tt"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("purchase_id"))
        .orderBy(col("tt").desc, col("tid").desc)
      val best = p.join(touches, Seq("user_id"))
        .filter(col("tt") < col("pt") ||
          (col("tt") === col("pt") && col("tid") < col("purchase_id")))
        .filter(col("pt") - col("tt") <= EventWindows.ATTR_US)
        .withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
        .select(col("purchase_id"), col("tty"), col("tid"),
          (col("pt") - col("tt")).as("gap"))
      val expected = p.join(best, Seq("purchase_id"), "left_outer")
        .select(col("purchase_id"), col("user_id"),
          coalesce(col("tty"), lit("direct")).as("channel"),
          coalesce(col("tid"), lit(-1L)).as("touch_id"),
          coalesce(col("gap"), lit(-1L)).as("gap_us"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      assert(attr.exceptAll(expected).isEmpty &&
        expected.exceptAll(attr).isEmpty,
        "running-window attribution must equal the per-purchase argmax")
      // and the fixture exercises both branches
      val channels = attr.select("channel").distinct()
        .as[String].collect().toSet
      assert(channels.contains("direct") && (channels - "direct").nonEmpty)
    } finally { attr.unpersist(); () }
  }
}
