package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.{QueryModule, Tables}

/** One input row of [[EventWindows.sessionize]] (typed for the
  * `KeyValueGroupedDataset` state function). */
private[streaming] case class SessionEvent(
    user_id: Long, ts: Timestamp, value: Double)

/** The open (not yet gap-closed) session kept in [[GroupState]].
  * `sum_cents` is the value sum in exact integer cents — `value` is an
  * exact 2-decimal double, so the sum is order-independent and
  * bit-reproducible across engines (the decimal-sum idiom of
  * [[graft.queries.Relational]] in streaming-state form). */
private[streaming] case class OpenSession(
    start_us: Long, end_us: Long, n: Long, sum_cents: Long)

/** One emitted session: closed by the event-time gap (streaming: by the
  * watermark passing `end + gap`; batch: by the next event or group
  * end). Times are epoch microseconds — the cross-engine-stable
  * timestamp representation used throughout the repo. */
case class Session(
    user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, sum_value: Double)

/** Event-time streaming analytics over the `events` shape (`user_id`,
  * `ts`, `event_type`, `value`) — the two Structured-Streaming
  * capabilities the driver brief names beyond the CDC pipeline
  * ([[CdcStreams]]): watermarked windowed aggregation, and custom
  * per-key state via `flatMapGroupsWithState`.
  *
  * Both operators run IDENTICALLY on batch and streaming inputs: the
  * watermark/timeout plumbing is attached only when `isStreaming`, so
  * the DuckDB oracle rows (`q_event_windows`, `q_sessionize`) exercise
  * the very same code the streaming specs drive through `MemoryStream`
  * — the batch result is the ground truth the streaming run must
  * converge to once the watermark closes every window/session
  * (EventWindowsSpec asserts exactly that equality).
  *
  * == 100 TB design ==
  * Windowed aggregation is a plain hash aggregate on `(window,
  * event_type)` — partial-agg friendly, state bounded by watermark
  * eviction. Sessionization shuffles once on `user_id` and keeps ONE
  * tiny [[OpenSession]] per active key, evicted by event-time timeout —
  * state size is O(active users), not O(events), which is what lets a
  * billion-event/day stream run on fixed executor memory. Late rows
  * beyond the watermark are dropped by Spark before they reach state —
  * the documented trade of bounded state for bounded lateness.
  */
object EventWindows extends QueryModule {

  /** Tumbling event-time windows × event_type: count + exact-decimal
    * value sum. Streaming inputs get `withWatermark(ts, delay)`; with
    * append-mode sinks a window emits exactly once, when the watermark
    * passes its end. */
  def windowedAgg(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermarkDelay: String = "30 minutes",
      slide: Option[String] = None): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    val win = slide.fold(window(col("ts"), windowDur))(
      s => window(col("ts"), windowDur, s))
    src.groupBy(win, col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Default session gap: a new session starts when a user is idle
    * longer than this. */
  val DefaultGapMinutes = 120

  private def toSession(key: Long, o: OpenSession): Session =
    Session(key, o.start_us, o.end_us, o.n, o.sum_cents / 100.0)

  /** Epoch microseconds of a `java.sql.Timestamp` (getTime is millis
    * already including the nanos' millis part). */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** The per-key state fold. In-order events extend the open session
    * while the gap allows; an out-of-order event (possible only within
    * the watermark) merges by min/max. `emitTrailing` is the batch mode:
    * the group iterator holds everything, so the final open session is
    * emitted instead of parked in state for a timeout that will never
    * fire. */
  private def sessionFold(gapUs: Long, emitTrailing: Boolean)(
      key: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val closed = toSession(key, state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val out = Seq.newBuilder[Session]
      var cur = state.getOption
      events.toSeq.sortBy(e => (micros(e.ts), e.value))
        .foreach { e =>
          val t = micros(e.ts)
          val cents = Math.round(e.value * 100)
          cur match {
            case Some(o) if t <= o.end_us + gapUs =>
              cur = Some(OpenSession(math.min(o.start_us, t),
                math.max(o.end_us, t), o.n + 1, o.sum_cents + cents))
            case Some(o) =>
              out += toSession(key, o)
              cur = Some(OpenSession(t, t, 1, cents))
            case None =>
              cur = Some(OpenSession(t, t, 1, cents))
          }
        }
      cur.foreach { o =>
        if (emitTrailing) out += toSession(key, o)
        else {
          state.update(o)
          state.setTimeoutTimestamp(o.end_us / 1000 + gapUs / 1000)
        }
      }
      if (emitTrailing) state.remove()
      out.result().iterator
    }
  }

  /** Gap-based sessionization per `user_id`: shuffle once on the key,
    * fold each user's events into `(start, end, n, sum)` sessions, close
    * a session when the next event is more than `gapMinutes` away —
    * streaming closes by EVENT-TIME TIMEOUT (the watermark passing
    * `end + gap`), batch by the group fold itself. */
  def sessionize(
      events: DataFrame,
      gapMinutes: Int = DefaultGapMinutes,
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    val session = events.sparkSession
    import session.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val streaming = events.isStreaming
    // project FIRST, watermark the projected column: a cast after
    // withWatermark would mint a fresh attribute without the watermark
    // tag and the event-time timeout would not resolve
    val selected = events.select(
      col("user_id").cast("long").as("user_id"),
      col("ts").cast("timestamp").as("ts"),
      col("value").cast("double").as("value"))
    val src =
      if (streaming) selected.withWatermark("ts", watermarkDelay) else selected
    val typed = src.as[SessionEvent]
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), timeout)(
        sessionFold(gapUs, emitTrailing = !streaming))
  }

  /** Streaming dedup bounded by the watermark
    * (`dropDuplicatesWithinWatermark`): duplicate keys arriving within
    * the lateness window collapse to the first; a key's state is
    * evicted once the watermark passes it, so dedup memory is bounded
    * by the watermark delay, not the stream's history. This is the
    * bounded-state complement of the CDC pipeline's TRANSACTIONAL dup
    * suppression ([[CdcStreams]] — content hash + txn batch ids, which
    * catches redeliveries at ANY distance but per merge key); use this
    * for raw event streams where the dup window is known. Batch inputs
    * fall back to a plain `dropDuplicates`. */
  def dedupWithinWatermark(
      events: DataFrame,
      keys: Seq[String],
      watermarkDelay: String = "30 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)

  /** Watermarked stream-stream interval join: every left row pairs with
    * the right rows of the same keys whose time lies in
    * `[leftTime − tol, leftTime]` (e.g. "clicks at most 30 minutes
    * before each purchase"). On streaming inputs both sides carry
    * watermarks and the bounded time condition lets Spark EVICT join
    * state — without it a stream-stream join buffers forever; inner
    * matches emit as soon as both rows have arrived. On batch inputs
    * the same plan is a plain interval join (the banded batch
    * formulation of [[graft.operators.RangeJoin]] covers the oracle
    * side of these semantics). Time columns must be named differently
    * on the two sides; the right side contributes its non-key columns. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      tol: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    require(leftTime != rightTime,
      "rename the time columns distinctly so the join output is unambiguous")
    val l =
      if (left.isStreaming) left.withWatermark(leftTime, watermarkDelay) else left
    val r =
      if (right.isStreaming) right.withWatermark(rightTime, watermarkDelay)
      else right
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      col(rightTime) >= col(leftTime) - expr(s"INTERVAL $tol") &&
      col(rightTime) <= col(leftTime)
    keys.foldLeft(l.join(r, cond, "inner"))((df, k) => df.drop(r(k)))
  }

  /** Stream-static enrichment: join each event to a slowly-changing
    * dimension snapshot (here the `customer` table). The static side is
    * explicitly `broadcast()`: every micro-batch becomes a stateless
    * map-side hash join — no shuffle of the stream, no join state
    * growing between batches (contrast [[intervalJoin]], whose
    * stream-stream state needs watermark eviction). The dimension is
    * re-read per micro-batch by Spark's stream-static contract, which
    * is what makes it a point-in-time snapshot join at 100 TB: the
    * stream never stalls on dimension size because only the (small,
    * filtered) dim ships to executors. Left join keeps unmatched
    * events — enrichment must never drop facts. */
  def enrichWithDim(
      events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "left")

  // --------------------------------------------------------- q_enrich
  /** Batch run of the stream-static enrichment plan: events × customer
    * segment/balance. EventWindowsSpec drives the same code through
    * MemoryStream and asserts the streamed result equals this. */
  private def qEnrich(s: SparkSession, d: String): DataFrame =
    enrichWithDim(
      Tables.events(s, d),
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
      "user_id", "c_custkey")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"), col("c_acctbal"))

  private val qEnrichSql =
    """SELECT event_id, user_id, event_type, value, c_mktsegment, c_acctbal
      |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin

  // --------------------------------------------------- q_event_windows
  /** Batch run of the streaming windowed-aggregation plan: 1-hour
    * tumbling windows × event_type over `events`. */
  private def qEventWindows(s: SparkSession, d: String): DataFrame =
    windowedAgg(Tables.events(s, d))

  private val qEventWindowsSql =
    """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_us,
      |       epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) + 3600000000 AS window_end_us,
      |       event_type, count(*) AS n_events,
      |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------- q_sliding_windows
  /** Sliding (hopping) windows: 1-hour windows every 30 minutes, so
    * each event lands in exactly two windows. The oracle derives the
    * same window set per row from the 30-minute bucket and its
    * predecessor hop. */
  private def qSlidingWindows(s: SparkSession, d: String): DataFrame =
    windowedAgg(Tables.events(s, d), "1 hour", slide = Some("30 minutes"))

  private val qSlidingWindowsSql =
    """SELECT epoch_us(time_bucket(INTERVAL 30 MINUTE, ts))
      |         - h * 1800000000 AS window_start_us,
      |       epoch_us(time_bucket(INTERVAL 30 MINUTE, ts))
      |         - h * 1800000000 + 3600000000 AS window_end_us,
      |       event_type, count(*) AS n_events,
      |       sum(value::DECIMAL(18,2))::DOUBLE AS sum_value
      |FROM events, generate_series(0, 1) AS t(h)
      |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------ q_sessionize
  /** Batch run of the SAME `flatMapGroupsWithState` fold the streaming
    * path uses — the custom-state operator itself sits under the oracle
    * gate. The oracle is the declarative gaps-and-islands formulation
    * (lag → break flags → running session id → per-session aggregate). */
  private def qSessionize(s: SparkSession, d: String): DataFrame =
    sessionize(Tables.events(s, d)).toDF()

  private[streaming] val qSessionizeSql = {
    val gapUs = DefaultGapMinutes * 60L * 1000000L
    s"""WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |         CAST(round(value * 100, 0) AS BIGINT) AS cents
      |  FROM events),
      |m AS (
      |  SELECT user_id, ts_us, cents,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > $gapUs
      |         THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |s AS (
      |  SELECT user_id, ts_us, cents,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM m)
      |SELECT user_id, min(ts_us) AS session_start_us,
      |       max(ts_us) AS session_end_us, count(*) AS n_events,
      |       sum(cents) / 100.0 AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin
  }

  // ---------------------------------------------------------- q_funnel
  /** Ordered conversion funnel view → click → purchase: how many users
    * reach each step, where a step only counts if it happens at-or-
    * after the previous step's first completion (the product-analytics
    * staple; same semantics as windowFunnel-style operators).
    *
    * ONE shuffle: events group to their user, each user's (ts, step)
    * pairs sort in-memory, and a linear `aggregate` fold walks the
    * timeline advancing the stage counter — per-user event counts are
    * human-activity-bounded, so the sorted list is small regardless of
    * corpus scale. The naive formulation (one aggregation + self-join
    * PER STEP, each reshuffling the full event set) is what the oracle
    * runs; deeper funnels only grow the fold's CASE, not the shuffle
    * count. Ties: the sort key is (ts, step-rank), so a click in the
    * same microsecond as the first view counts as progression —
    * exactly the oracle's `t >= t_prev` semantics. All outputs are
    * exact integer counts. */
  /** Per-user funnel progress over `(user_id, t, event_type)` rows
    * (`t` = epoch micros): the furthest ORDERED stage reached
    * (1=view, 2=click, 3=purchase; a step counts only at-or-after the
    * previous step's first completion). Users who never viewed are
    * ABSENT from the result — the per-user state unit
    * [[graft.streaming.FunnelView]] maintains incrementally and
    * [[qFunnel]] aggregates in one pass. */
  private[streaming] def userStages(ev: DataFrame): DataFrame = ev
    .filter(col("event_type").isin("view", "click", "purchase"))
    .select(col("user_id"), col("t"),
      when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .otherwise(3).as("o"))
    .groupBy(col("user_id"))
    .agg(sort_array(collect_list(struct(col("t"), col("o")))).as("evs"))
    .select(col("user_id"), expr(
      """aggregate(evs, 0, (acc, e) -> CASE
        |  WHEN acc = 0 AND e.o = 1 THEN 1
        |  WHEN acc = 1 AND e.o = 2 THEN 2
        |  WHEN acc = 2 AND e.o = 3 THEN 3
        |  ELSE acc END)""".stripMargin).as("stage"))
    .filter(col("stage") >= 1)

  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stage = userStages(Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type"))
    stage.agg(
        sum(when($"stage" >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"stage" >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"stage" >= 3, 1L).otherwise(0L)).as("n3"))
      .select(explode(expr(
        """array(named_struct('step', 1, 'step_name', 'view',     'n_users', n1),
          |      named_struct('step', 2, 'step_name', 'click',    'n_users', n2),
          |      named_struct('step', 3, 'step_name', 'purchase', 'n_users', n3))"""
          .stripMargin)).as("r"))
      .select($"r.step", $"r.step_name", $"r.n_users")
  }
  private val qFunnelSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM ev e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.t >= s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM ev e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.t >= s2.t2 GROUP BY 1)
      |SELECT 1 AS step, 'view' AS step_name,
      |       (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'click',    (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin

  // ------------------------------------------------------- q_retention
  /** Cohort retention: users bucket into epoch-aligned 7-day cohorts by
    * their FIRST event, and each (cohort, week-offset) cell counts the
    * cohort's users active that week — the classic retention triangle.
    * Weeks are epoch-aligned microsecond buckets (`t - t % 7d`), pure
    * integer arithmetic with no calendar/timezone semantics to diverge
    * across engines.
    *
    * ONE wide shuffle: events group to their user and `collect_set`
    * dedups active weeks map-side (partial aggregation collapses the
    * per-partition repeats before the exchange), then the exploded
    * (cohort, offset) pairs — already ≤ a few hundred per user — feed
    * the small triangle aggregate. The naive three-shuffle formulation
    * (first-event aggregate ⋈ distinct user-weeks, then re-aggregate)
    * is what the oracle runs. */
  private[streaming] val WEEK_US = 604800000000L

  /** Per-user cohort/activity rows over `(user_id, t)` (`t` = epoch
    * micros): one row per (user, active epoch-aligned week) carrying
    * the user's cohort week and the week offset — the per-user state
    * unit [[graft.streaming.RetentionView]] maintains incrementally
    * and [[qRetention]] aggregates into the triangle. */
  private[streaming] def userCohortWeeks(ev: DataFrame): DataFrame = ev
    .select(col("user_id"), col("t"))
    .groupBy(col("user_id"))
    .agg(min(col("t")).as("t0"),
      collect_set(col("t") - col("t") % WEEK_US).as("weeks"))
    .select(col("user_id"),
      (col("t0") - col("t0") % WEEK_US).as("cohort_week_us"),
      explode(col("weeks")).as("week_us"))
    .withColumn("week_offset",
      expr(s"(week_us - cohort_week_us) div ${WEEK_US}L"))

  private def qRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    userCohortWeeks(
        Tables.events(s, d).select($"user_id", unix_micros($"ts").as("t")))
      .groupBy($"cohort_week_us", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
  }
  private val qRetentionSql =
    s"""WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |first AS (
      |  SELECT user_id, min(t) - (min(t) % $WEEK_US) AS cohort_week_us
      |  FROM ev GROUP BY 1),
      |act AS (SELECT DISTINCT user_id, t - (t % $WEEK_US) AS week_us FROM ev)
      |SELECT f.cohort_week_us,
      |       (a.week_us - f.cohort_week_us) // $WEEK_US AS week_offset,
      |       count(*) AS n_users
      |FROM first f JOIN act a USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------- q_attribution
  /** LAST-TOUCH conversion attribution: each purchase credits the most
    * recent preceding marketing touch (view/click) by the same user
    * within a 24 h lookback, else counts as 'direct' — the
    * product-analytics sibling of the funnel, and the same shape as
    * campaign/revenue attribution over a clickstream.
    *
    * ONE shuffle: events hash to their user and a single running
    * `last(touch, ignoreNulls)` window over (t, event_id) row order
    * carries the latest touch struct; purchases then read it with a
    * strictly-preceding frame (`rows between unbounded preceding and 1
    * preceding`), so a touch in the same microsecond as the purchase
    * attributes only when its event_id orders first — exactly the
    * oracle's frame semantics. No join, no per-conversion probe: the
    * naive formulation (purchases ⋈ touches on user + time-band, then a
    * per-purchase argmax) reshuffles the full touch set and blows up on
    * hot users; the running-window form is O(events) with
    * human-activity-bounded per-user state. Revenue lands in exact
    * integer cents (the [[qSessionize]] idiom); gaps are exact integer
    * micros. */
  private[streaming] val ATTR_US = 86400000000L // 24 h lookback

  /** The attribution derive over a pre-projected
    * (event_id, user_id, event_type, t, value) frame — shared by the
    * batch query and [[EventStateViews]]' maintained view (whose
    * changed-user refresh re-runs exactly this window over one user's
    * history). */
  private[streaming] def userAttribution(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      .rowsBetween(Long.MinValue, -1)
    val touch = when(col("event_type").isin("view", "click"),
      struct(col("t").as("tt"), col("event_id").as("tid"),
        col("event_type").as("tty")))
    val attributed = col("lt").isNotNull && col("t") - col("lt.tt") <= ATTR_US
    ev.withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        when(attributed, col("lt.tty")).otherwise("direct").as("channel"),
        when(attributed, col("lt.tid")).otherwise(-1L).as("touch_id"),
        when(attributed, col("t") - col("lt.tt")).otherwise(-1L).as("gap_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
  }

  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    userAttribution(Tables.events(s, d).select($"event_id", $"user_id",
      $"event_type", unix_micros($"ts").as("t"), $"value"))
  }
  private val qAttributionSql =
    s"""WITH ev AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS t, value
      |  FROM events),
      |m AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type IN ('view','click') THEN t END
      |      IGNORE NULLS) OVER w AS lt,
      |    last_value(CASE WHEN event_type IN ('view','click') THEN event_id END
      |      IGNORE NULLS) OVER w AS lid,
      |    last_value(CASE WHEN event_type IN ('view','click') THEN event_type END
      |      IGNORE NULLS) OVER w AS lty
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id,
      |  CASE WHEN lt IS NOT NULL AND t - lt <= $ATTR_US
      |       THEN lty ELSE 'direct' END AS channel,
      |  CASE WHEN lt IS NOT NULL AND t - lt <= $ATTR_US
      |       THEN lid ELSE -1 END AS touch_id,
      |  CASE WHEN lt IS NOT NULL AND t - lt <= $ATTR_US
      |       THEN t - lt ELSE -1 END AS gap_us,
      |  CAST(round(value * 100) AS BIGINT) AS cents
      |FROM m WHERE event_type = 'purchase'""".stripMargin

  // ----------------------------------------------- q_markov_transitions
  /** First-order Markov transition matrix over per-user event
    * sequences: for every ordered pair of consecutive events by the
    * same user, count `prev_type → next_type` and row-normalize into
    * transition probabilities — the behavioral model behind next-event
    * prediction, anomaly scoring ("this session's transitions are
    * improbable"), and funnel design (which paths actually occur).
    *
    * ONE shuffle: events hash to their user, a single `lag` window
    * over (t, event_id) row order pairs each event with its
    * predecessor (the [[qAttribution]] shape — no self-join, no
    * per-pair probe), then the |types|²-row count aggregate is
    * map-side partial. Probabilities are exact integer parts-per-
    * million (`n·10⁶ div row_total`), so the matrix is bit-identical
    * across engines and summation orders. */
  private def qMarkovTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"event_id")
    val counts = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"), $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy($"prev_type")
    counts
      .withColumn("row_tot", sum($"n").over(wt))
      .select($"prev_type", $"next_type", $"n",
        expr("n * 1000000L div row_tot").as("p_ppm"))
  }
  // ------------------------------------------------- q_markov_anomaly
  /** Markov SEQUENCE-ANOMALY scoring — the application of
    * [[qMarkovTransitions]]'s model: each user's event stream scores by
    * how improbable its observed transitions are under the corpus
    * matrix. All-integer (order-free, bit-exact across engines):
    *
    *   mean_improb_ppm = Σ tf·(10⁶ − p_ppm) div Σ tf
    *   min_p_ppm       = the rarest transition the user actually took
    *
    * — a bot replaying one hot loop scores near 0; a stream full of
    * never-seen-elsewhere orderings scores near 10⁶. Same shape as the
    * model build: ONE user-hash shuffle for the lag pairs, per-(user,
    * pair) counts, then a join against the |types|²-row BROADCAST
    * model and a per-user aggregate. */
  private def qMarkovAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"event_id")
    val tf = Tables.events(s, d)
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"), $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"user_id", $"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("tf"))
    val model = qMarkovTransitions(s, d)
      .select($"prev_type", $"next_type", $"p_ppm")
    tf.join(broadcast(model), Seq("prev_type", "next_type"))
      .groupBy($"user_id")
      .agg(sum($"tf").as("n_transitions"),
        expr("sum(tf * (1000000L - p_ppm)) div sum(tf)")
          .as("mean_improb_ppm"),
        min($"p_ppm").as("min_p_ppm"))
  }
  private val qMarkovAnomalySql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id
      |  FROM events),
      |pairs AS (
      |  SELECT user_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY t, event_id) AS prev_type,
      |    event_type AS next_type
      |  FROM ev),
      |tf AS (
      |  SELECT user_id, prev_type, next_type,
      |    CAST(count(*) AS BIGINT) AS tf
      |  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT prev_type, next_type,
      |    CAST(count(*) AS BIGINT) AS n FROM pairs
      |  WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |model AS (
      |  SELECT prev_type, next_type,
      |    (n * 1000000)
      |      // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
      |      AS p_ppm
      |  FROM m)
      |SELECT user_id, CAST(sum(tf) AS BIGINT) AS n_transitions,
      |  CAST(sum(tf * (1000000 - p_ppm)) AS BIGINT)
      |    // CAST(sum(tf) AS BIGINT) AS mean_improb_ppm,
      |  CAST(min(p_ppm) AS BIGINT) AS min_p_ppm
      |FROM tf JOIN model USING (prev_type, next_type)
      |GROUP BY user_id""".stripMargin

  private val qMarkovTransitionsSql =
    """WITH seq AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id
      |                          ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events),
      |c AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
      |    AS p_ppm
      |FROM c""".stripMargin

  // --------------------------------------------------------- q_ohlc_bars
  /** Time-series downsampling into per-(event_type, day) OHLC bars:
    * open / high / low / close of `value` plus volume and count — the
    * canonical "raw ticks → chartable bars" rollup every metrics or
    * market pipeline runs, and the aggregation shape (first/last BY
    * EVENT-TIME ORDER, not by arrival order) that a plain groupBy
    * cannot express without an ordered tiebreak.
    *
    * ONE shuffle on (event_type, day): both row_number windows (asc
    * for open, desc for close) share the partitioning, so Catalyst
    * plans one Exchange with two sorts; high/low/volume ride the same
    * hash aggregate. Order is total — (t, event_id) — so open/close
    * are deterministic under ties. Values aggregate in exact integer
    * cents (the [[qSessionize]] idiom). At 100 TB the bar grid is
    * |types|·|days| rows — tiny — while the scan stays one pass. */
  private val DAY_US = 86400000000L

  private def qOhlcBars(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t"), $"event_id",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("day_us", $"t" - $"t" % DAY_US)
    val p = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day_us")
    val asc  = p.orderBy($"t".asc, $"event_id".asc)
    val desc = p.orderBy($"t".desc, $"event_id".desc)
    ev.withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy($"event_type", $"day_us")
      .agg(
        max(when($"rn_a" === 1, $"cents")).as("open_cents"),
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        max(when($"rn_d" === 1, $"cents")).as("close_cents"),
        sum($"cents").as("sum_cents"),
        count(lit(1)).as("n"))
  }
  private val qOhlcBarsSql =
    s"""WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS t, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    epoch_us(ts) - epoch_us(ts) % $DAY_US AS day_us
      |  FROM events),
      |r AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY event_type, day_us
      |                       ORDER BY t ASC, event_id ASC) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type, day_us
      |                       ORDER BY t DESC, event_id DESC) AS rn_d
      |  FROM ev)
      |SELECT event_type, day_us,
      |  max(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
      |  max(cents) AS high_cents,
      |  min(cents) AS low_cents,
      |  max(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  count(*) AS n
      |FROM r GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- q_funnel_windowed
  /** The funnel with per-stage CONVERSION DEADLINES: a click counts
    * only within `FUNNEL_W` of the first view, a purchase only within
    * `FUNNEL_W` of that qualifying click — how product funnels are
    * actually measured (unbounded conversion credits a purchase months
    * later). Same single-shuffle per-user fold as [[qFunnel]], with
    * the accumulator carrying (stage, reached-at) so the window test
    * is one subtraction inside the linear walk; the oracle is the
    * per-step join formulation with the same first-completion + window
    * predicates. Deadlines only grow the fold's CASE — the shuffle
    * count never changes with funnel depth or window rules. */
  private[streaming] val FUNNEL_W = 259200000000L // 3 days

  private def qFunnelWindowed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stage = Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type")
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"t",
        when($"event_type" === "view", 1)
          .when($"event_type" === "click", 2)
          .otherwise(3).as("o"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"t", $"o"))).as("evs"))
      .select($"user_id", expr(
        s"""aggregate(evs,
          |  named_struct('st', 0, 'tt', CAST(0 AS BIGINT)),
          |  (acc, e) -> CASE
          |    WHEN acc.st = 0 AND e.o = 1
          |      THEN named_struct('st', 1, 'tt', e.t)
          |    WHEN acc.st = 1 AND e.o = 2 AND e.t - acc.tt <= ${FUNNEL_W}L
          |      THEN named_struct('st', 2, 'tt', e.t)
          |    WHEN acc.st = 2 AND e.o = 3 AND e.t - acc.tt <= ${FUNNEL_W}L
          |      THEN named_struct('st', 3, 'tt', e.t)
          |    ELSE acc END).st""".stripMargin).as("stage"))
      .filter($"stage" >= 1)
    stage.agg(
        sum(when($"stage" >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"stage" >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"stage" >= 3, 1L).otherwise(0L)).as("n3"))
      .select(explode(expr(
        """array(named_struct('step', 1, 'step_name', 'view',     'n_users', n1),
          |      named_struct('step', 2, 'step_name', 'click',    'n_users', n2),
          |      named_struct('step', 3, 'step_name', 'purchase', 'n_users', n3))"""
          .stripMargin)).as("r"))
      .select($"r.step", $"r.step_name", $"r.n_users")
  }
  private val qFunnelWindowedSql =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM ev e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.t >= s1.t1
      |         AND e.t - s1.t1 <= $FUNNEL_W GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM ev e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.t >= s2.t2
      |         AND e.t - s2.t2 <= $FUNNEL_W GROUP BY 1)
      |SELECT 1 AS step, 'view' AS step_name,
      |       (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT 2, 'click',    (SELECT count(*) FROM s2)
      |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin

  // ------------------------------------------------------------ q_rfm
  /** RFM (Recency / Frequency / Monetary) user segmentation — the
    * classic behavioral-cohort operator: per user, days since last
    * purchase, purchase count, and exact revenue cents, each scored
    * into population TERCILES with the integer ⌈p·n⌉ rank rule (the
    * [[graft.llm.CorpusQuality]] winsorize idiom — no interpolated
    * percentiles, so the cut points are engine-portable integers).
    * Segment = concatenated R/F/M scores; the readout every retention
    * team buckets its lifecycle campaigns on.
    *
    * ONE user shuffle builds the per-user features; each score needs
    * only a 2-row threshold table, broadcast back. The cut values come
    * from the exact global index over the |users|-row FEATURE table via
    * [[graft.operators.RankOps.withGlobalOrder]] — bucketed distributed
    * sort, no single-partition window even at billion-user populations.
    * Recency measures against the fixed corpus-end anchor (max event
    * time), so the result is reproducible. */
  private def qRfm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id", $"event_type",
      unix_micros($"ts").as("t"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val anchor = ev.agg(max($"t").as("t_end"))
    // staged once: the three per-feature ranking passes (and the final
    // scoring join) read the |users|-row feature table from scratch
    // parquet instead of re-aggregating the events corpus each time
    val users = graft.operators.RankOps.staged(
      ev.filter($"event_type" === "purchase")
        .crossJoin(broadcast(anchor))
        .groupBy($"user_id")
        .agg(
          expr(s"CAST((max(t_end) - max(t)) div ${DAY_US}L AS BIGINT)")
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum($"cents").as("monetary_cents")),
      "rfm-users", d)
    // tercile cut VALUES per feature: rank the users once per feature,
    // pick the values at ranks ceil(n/3) and ceil(2n/3)
    def cuts(c: String, asc: Boolean) = {
      graft.operators.RankOps.withGlobalOrder(users,
          col(c), ascending = asc, tiebreaks = Seq($"user_id"),
          rowNumCol = Some("rn"), countCol = Some("n"))
        .groupBy()
        .agg(min(when($"rn" === expr("(n + 2) div 3"), col(c))).as(s"${c}_c1"),
          min(when($"rn" === expr("(2 * n + 2) div 3"), col(c))).as(s"${c}_c2"))
    }
    // lower recency is better (score 3), higher freq/monetary better
    val thr = cuts("recency_days", asc = true)
      .crossJoin(cuts("frequency", asc = false))
      .crossJoin(cuts("monetary_cents", asc = false))
    users.crossJoin(broadcast(thr))
      .select($"user_id", $"recency_days", $"frequency", $"monetary_cents",
        when($"recency_days" <= $"recency_days_c1", 3L)
          .when($"recency_days" <= $"recency_days_c2", 2L).otherwise(1L)
          .as("r_score"),
        when($"frequency" >= $"frequency_c1", 3L)
          .when($"frequency" >= $"frequency_c2", 2L).otherwise(1L)
          .as("f_score"),
        when($"monetary_cents" >= $"monetary_cents_c1", 3L)
          .when($"monetary_cents" >= $"monetary_cents_c2", 2L).otherwise(1L)
          .as("m_score"))
      .withColumn("segment",
        concat($"r_score", $"f_score", $"m_score").cast("string"))
  }
  private val qRfmSql =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |anchor AS (SELECT max(t) AS t_end FROM ev),
      |u AS (
      |  SELECT user_id,
      |    CAST((max(t_end) - max(t)) // $DAY_US AS BIGINT) AS recency_days,
      |    count(*) AS frequency,
      |    CAST(sum(cents) AS BIGINT) AS monetary_cents
      |  FROM ev, anchor WHERE event_type = 'purchase' GROUP BY user_id),
      |rr AS (SELECT *,
      |    row_number() OVER (ORDER BY recency_days ASC, user_id ASC) AS rn,
      |    count(*) OVER () AS n FROM u),
      |rc AS (SELECT min(CASE WHEN rn = (n + 2) // 3 THEN recency_days END) AS r_c1,
      |              min(CASE WHEN rn = (2 * n + 2) // 3 THEN recency_days END) AS r_c2
      |       FROM rr),
      |fr AS (SELECT *,
      |    row_number() OVER (ORDER BY frequency DESC, user_id ASC) AS rn,
      |    count(*) OVER () AS n FROM u),
      |fc AS (SELECT min(CASE WHEN rn = (n + 2) // 3 THEN frequency END) AS f_c1,
      |              min(CASE WHEN rn = (2 * n + 2) // 3 THEN frequency END) AS f_c2
      |       FROM fr),
      |mr AS (SELECT *,
      |    row_number() OVER (ORDER BY monetary_cents DESC, user_id ASC) AS rn,
      |    count(*) OVER () AS n FROM u),
      |mc AS (SELECT min(CASE WHEN rn = (n + 2) // 3 THEN monetary_cents END) AS m_c1,
      |              min(CASE WHEN rn = (2 * n + 2) // 3 THEN monetary_cents END) AS m_c2
      |       FROM mr)
      |SELECT user_id, recency_days, frequency, monetary_cents,
      |  CAST(CASE WHEN recency_days <= r_c1 THEN 3
      |       WHEN recency_days <= r_c2 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
      |  CAST(CASE WHEN frequency >= f_c1 THEN 3
      |       WHEN frequency >= f_c2 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
      |  CAST(CASE WHEN monetary_cents >= m_c1 THEN 3
      |       WHEN monetary_cents >= m_c2 THEN 2 ELSE 1 END AS BIGINT) AS m_score,
      |  CAST((CASE WHEN recency_days <= r_c1 THEN 3
      |       WHEN recency_days <= r_c2 THEN 2 ELSE 1 END * 100
      |    + CASE WHEN frequency >= f_c1 THEN 3
      |       WHEN frequency >= f_c2 THEN 2 ELSE 1 END * 10
      |    + CASE WHEN monetary_cents >= m_c1 THEN 3
      |       WHEN monetary_cents >= m_c2 THEN 2 ELSE 1 END) AS VARCHAR)
      |    AS segment
      |FROM u, rc, fc, mc""".stripMargin

  // -------------------------------------------------- q_conversion_lag
  /** TIME-TO-CONVERT distribution: for every user who completed the
    * ordered funnel, the lag from first view to the qualifying
    * purchase, bucketed into a day histogram — the "how long does
    * conversion take" readout that sizes attribution lookbacks
    * ([[qAttribution]]'s 24 h) and funnel deadlines
    * ([[qFunnelWindowed]]'s 3 days) from data instead of folklore.
    * Same single-shuffle per-user fold as the funnel, with the
    * accumulator carrying (stage, first-view-at, reached-at); the
    * histogram is |days| rows of exact integer counts. */
  private def qConversionLag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type")
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id", $"t",
        when($"event_type" === "view", 1)
          .when($"event_type" === "click", 2)
          .otherwise(3).as("o"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"t", $"o"))).as("evs"))
      .select($"user_id", expr(
        """aggregate(evs,
          |  named_struct('st', 0, 't1', CAST(0 AS BIGINT), 'tt', CAST(0 AS BIGINT)),
          |  (acc, e) -> CASE
          |    WHEN acc.st = 0 AND e.o = 1
          |      THEN named_struct('st', 1, 't1', e.t, 'tt', e.t)
          |    WHEN acc.st = 1 AND e.o = 2
          |      THEN named_struct('st', 2, 't1', acc.t1, 'tt', e.t)
          |    WHEN acc.st = 2 AND e.o = 3
          |      THEN named_struct('st', 3, 't1', acc.t1, 'tt', e.t)
          |    ELSE acc END)""".stripMargin).as("a"))
      .filter($"a.st" === 3)
      .select(expr(s"(a.tt - a.t1) div ${DAY_US}L").as("lag_days"))
      .groupBy($"lag_days").agg(count(lit(1)).as("n_users"))
  }
  private val qConversionLagSql =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM ev e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.t >= s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, s1.t1, min(e.t) AS t3
      |       FROM ev e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.t >= s2.t2
      |       GROUP BY 1, 2)
      |SELECT (t3 - t1) // $DAY_US AS lag_days, count(*) AS n_users
      |FROM s3 GROUP BY 1""".stripMargin

  // -------------------------------------------------- q_abtest_metrics
  /** A/B experiment readout: users assign to variants by seeded md5
    * hash (deterministic, engine-portable — the
    * [[graft.operators.Sampling]] bucket idiom, which is also how real
    * experiment systems bucket: stable under retries and joins), then
    * per-variant exposure, conversion (≥1 purchase), revenue, and the
    * two-proportion z statistic — the decision statistic read off
    * every experiment dashboard.
    *
    * ONE scan to per-user flags (map-side combine), a 2-row variant
    * aggregate, and a 1-row readout: at 100 TB the z-test costs the
    * scan, nothing more. Counts/cents are exact integers; the z
    * arithmetic is a fixed IEEE expression over identical integers in
    * both engines, rounded 4dp (the established grid). */
  private[streaming] val ABTEST_CONV_CENTS = 20000L // "high-value purchase"

  private def qAbtestMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perUser = Tables.events(s, d)
      .select($"user_id", $"event_type",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(
        max(when($"event_type" === "purchase" &&
          $"cents" > ABTEST_CONV_CENTS, 1L).otherwise(0L)).as("conv"),
        sum(when($"event_type" === "purchase", $"cents").otherwise(0L))
          .as("rev_cents"))
      .withColumn("variant",
        when(conv(substring(md5(concat(lit("ab|"), $"user_id".cast("string"))),
          1, 4), 16, 10).cast("long") % 2 === 0L, "A").otherwise("B"))
    val byV = perUser.groupBy($"variant")
      .agg(count(lit(1)).as("n_users"), sum($"conv").as("n_conv"),
        sum($"rev_cents").as("rev_cents"))
      .withColumn("conv_ppm", expr("n_conv * 1000000L div n_users"))
    val a = byV.filter($"variant" === "A")
      .select($"n_users".as("n_a"), $"n_conv".as("c_a"),
        $"rev_cents".as("rev_a"), $"conv_ppm".as("ppm_a"))
    val b = byV.filter($"variant" === "B")
      .select($"n_users".as("n_b"), $"n_conv".as("c_b"),
        $"rev_cents".as("rev_b"), $"conv_ppm".as("ppm_b"))
    // degenerate pools (nobody or everybody converted) have zero
    // variance — report z = 0 instead of a 0/0 (same guard as the
    // oracle; a real dashboard shows "no signal" for these)
    val z = expr(
      """CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
        |ELSE round(
        |  (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
        |  sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |       * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |       * (1.0 / n_a + 1.0 / n_b)), 4) END""".stripMargin)
    a.crossJoin(b)
      .select($"n_a", $"c_a", $"rev_a", $"ppm_a",
        $"n_b", $"c_b", $"rev_b", $"ppm_b", z.as("z_stat"),
        (abs(z) > 1.96).as("significant"))
  }
  private val qAbtestMetricsSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(k, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    val z =
      """CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN 0.0
        |ELSE round(
        |  (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
        |  sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |       * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |       * (1.0 / n_a + 1.0 / n_b)), 4) END""".stripMargin
    s"""WITH pu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase'
      |             AND CAST(round(value * 100) AS BIGINT) > $ABTEST_CONV_CENTS
      |             THEN 1 ELSE 0 END) AS conv,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS rev_cents
      |  FROM events GROUP BY 1),
      |v AS (
      |  SELECT CASE WHEN ($bucket) % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
      |    conv, rev_cents
      |  FROM (SELECT *, md5('ab|' || user_id::VARCHAR) AS k FROM pu)),
      |byv AS (
      |  SELECT variant, count(*) AS n_users,
      |    CAST(sum(conv) AS BIGINT) AS n_conv,
      |    CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
      |    CAST((sum(conv) * 1000000) // count(*) AS BIGINT) AS conv_ppm
      |  FROM v GROUP BY 1),
      |a AS (SELECT n_users AS n_a, n_conv AS c_a, rev_cents AS rev_a,
      |             conv_ppm AS ppm_a FROM byv WHERE variant = 'A'),
      |b AS (SELECT n_users AS n_b, n_conv AS c_b, rev_cents AS rev_b,
      |             conv_ppm AS ppm_b FROM byv WHERE variant = 'B')
      |SELECT n_a, c_a, rev_a, ppm_a, n_b, c_b, rev_b, ppm_b,
      |  $z AS z_stat, abs($z) > 1.96 AS significant
      |FROM a, b""".stripMargin
  }

  // ----------------------------------------------- q_time_weighted_avg
  /** TIME-WEIGHTED average of `value` per user — the correct mean for
    * irregularly-sampled state series (billing meters, feature gauges,
    * position sizes): each observation holds until the next one, so it
    * weighs by its holding duration, not by 1/n. Left-constant
    * interpolation over [first, last]:
    *
    *   twa = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t₁)
    *
    * ONE shuffle: the `lead` gap and the span aggregate share the
    * per-user hash partitioning. The numerator accumulates as
    * DECIMAL(38,0) cents·micros (exact at any scale — a double sum
    * would lose integer exactness past 2⁵³ and depend on summation
    * order); only the final per-user division happens in double,
    * rounded 4dp on identical operands in both engines. Single-event
    * users have no span and are excluded (both engines: NULL gap only). */
  private def qTimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"t", $"event_id")
    Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("gap_us", lead($"t", 1).over(w) - $"t")
      .filter($"gap_us".isNotNull)
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_holds"),
        sum($"gap_us").as("span_us"),
        sum(expr("CAST(cents AS DECIMAL(38,0)) * gap_us")).as("num"))
      .select($"user_id", $"n_holds", $"span_us",
        round($"num".cast("double") / $"span_us", 4).as("twa_cents"))
  }
  private val qTimeWeightedAvgSql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT user_id, cents,
      |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t
      |      AS gap_us
      |  FROM ev)
      |SELECT user_id, count(*) AS n_holds,
      |  CAST(sum(gap_us) AS BIGINT) AS span_us,
      |  round(CAST(sum(CAST(cents AS HUGEINT) * gap_us) AS DOUBLE)
      |        / CAST(sum(gap_us) AS BIGINT), 4) AS twa_cents
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY user_id""".stripMargin

  // --------------------------------------------------- q_survival_hazard
  /** Nelson–Aalen cumulative-hazard estimate of user CHURN — the
    * survival-analysis readout behind every "how long do users stay"
    * question. Per user, observed lifetime = last-active day − first-
    * active day; a user whose last activity sits ≥ [[CHURN_GAP_DAYS]]
    * before the corpus-end anchor has CHURNED at that lifetime (the
    * event), everyone else is right-CENSORED. At each distinct
    * lifetime t with deaths: n_risk = users with lifetime ≥ t, hazard
    * h(t) = d_t/n_risk, and the Nelson–Aalen estimate H(t) = Σ_{s≤t}
    * h(s).
    *
    * Nelson–Aalen (not Kaplan–Meier) deliberately: the cumulative
    * hazard is a SUM of per-step terms, so it stays exact in integer
    * ppm units — each step contributes `(d·10⁶) div n_risk` and
    * integer sums are order-free — where KM's Π(1 − dᵢ/nᵢ) product
    * cannot hash-match across engines without fixed-point truncation
    * at every step. (S(t) = exp(−H(t)) when a survival curve is
    * needed.)
    *
    * 100 TB shape: ONE user-keyed shuffle builds the |users|-row
    * lifetime table; everything after runs on the ≤|distinct
    * lifetimes| duration table (bounded by the corpus day span, not by
    * users), where the at-risk counts come from one descending
    * cumulative-sum window — no per-timepoint rescans of the user
    * table, which is what makes the textbook "count survivors at every
    * t" formulation quadratic and this one linear.
    *
    * The gap constant is fixture-calibrated: the synthetic corpus has
    * near-daily per-user activity (no user is idle ≥ 3 days before
    * corpus end), so a production-style 7-day churn window marks
    * nobody; 1 idle day is the discriminating definition here, and the
    * estimator is gap-parametric either way. */
  private[streaming] val CHURN_GAP_DAYS = 1L

  private def qSurvivalHazard(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", expr(s"unix_micros(ts) div ${DAY_US}L").as("day"))
    val anchor = ev.agg(max($"day").as("end_day"))
    val users = ev.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .crossJoin(broadcast(anchor))
      .select(($"d1" - $"d0").as("lifetime_days"),
        ($"end_day" - $"d1" >= CHURN_GAP_DAYS).as("churned"))
    // |distinct lifetimes| rows from here on — the small relation
    val byLife = users.groupBy($"lifetime_days")
      .agg(count(lit(1)).as("n_at"),
        sum(when($"churned", 1L).otherwise(0L)).as("n_deaths"))
    val wRisk = Window.orderBy($"lifetime_days".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy($"lifetime_days".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byLife
      .withColumn("n_risk", sum($"n_at").over(wRisk))
      .withColumn("hazard_ppm", expr("(n_deaths * 1000000) div n_risk"))
      .withColumn("cum_hazard_ppm", sum($"hazard_ppm").over(wCum))
      .filter($"n_deaths" > 0)
      .select($"lifetime_days", $"n_risk", $"n_deaths", $"hazard_ppm",
        $"cum_hazard_ppm")
  }
  private val qSurvivalHazardSql =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // $DAY_US AS day FROM events),
      |anchor AS (SELECT max(day) AS end_day FROM ev),
      |u AS (
      |  SELECT max(day) - min(day) AS lifetime_days,
      |    (SELECT end_day FROM anchor) - max(day) >= $CHURN_GAP_DAYS
      |      AS churned
      |  FROM ev GROUP BY user_id),
      |bl AS (
      |  SELECT lifetime_days, count(*) AS n_at,
      |    CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_deaths
      |  FROM u GROUP BY 1),
      |r AS (
      |  SELECT *,
      |    CAST(sum(n_at) OVER (ORDER BY lifetime_days DESC) AS BIGINT)
      |      AS n_risk
      |  FROM bl),
      |h AS (
      |  SELECT *, CAST((n_deaths * 1000000) // n_risk AS BIGINT)
      |      AS hazard_ppm
      |  FROM r)
      |SELECT lifetime_days, n_risk, n_deaths, hazard_ppm,
      |  CAST(sum(hazard_ppm) OVER (ORDER BY lifetime_days ASC) AS BIGINT)
      |    AS cum_hazard_ppm
      |FROM h WHERE n_deaths > 0""".stripMargin

  // ------------------------------------------------------- q_cohort_ltv
  /** Cohort LIFETIME-VALUE triangle: users cohorted by first-activity
    * week (the [[qRetention]] anchor), purchase revenue accumulated by
    * weeks-since-signup — the readout that prices acquisition spend
    * and shows whether newer cohorts monetize faster. Revenue is exact
    * integer cents; `ltv_centi_per_user` is the cohort's CUMULATIVE
    * revenue in centi-cents per cohort member (integer div), so every
    * column hash-matches across engines.
    *
    * 100 TB shape: like [[qRetention]], ONE user-keyed shuffle does
    * all the per-user work (cohort anchor + per-week purchase cents
    * collected in the same aggregate — no events-vs-users join), the
    * triangle aggregate runs on |cohorts × offsets| rows, and the
    * cumulative window partitions BY COHORT over ≤ week-span rows —
    * never a global or per-user window. */
  private def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val perUser = Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"), $"event_type",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id")
      .agg(min($"t").as("t0"),
        collect_list(when($"event_type" === "purchase",
          struct(($"t" - $"t" % WEEK_US).as("week_us"), $"cents")))
          .as("buys"))
      .select($"user_id", ($"t0" - $"t0" % WEEK_US).as("cohort_week_us"),
        $"buys")
    val cohortSizes = perUser.groupBy($"cohort_week_us")
      .agg(count(lit(1)).as("n_users"))
    val weekly = perUser
      .select($"cohort_week_us", explode($"buys").as("b"))
      .groupBy($"cohort_week_us",
        expr(s"(b.week_us - cohort_week_us) div ${WEEK_US}L")
          .as("week_offset"))
      .agg(sum($"b.cents").as("week_cents"))
    val wCum = Window.partitionBy($"cohort_week_us")
      .orderBy($"week_offset".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .withColumn("cum_cents", sum($"week_cents").over(wCum))
      .join(broadcast(cohortSizes), "cohort_week_us")
      .select($"cohort_week_us", $"week_offset", $"n_users",
        $"week_cents", $"cum_cents",
        expr("(cum_cents * 100) div n_users").as("ltv_centi_per_user"))
  }
  private val qCohortLtvSql =
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |u AS (
      |  SELECT user_id, min(t) - (min(t) % $WEEK_US) AS cohort_week_us
      |  FROM ev GROUP BY 1),
      |cs AS (SELECT cohort_week_us, count(*) AS n_users FROM u GROUP BY 1),
      |wk AS (
      |  SELECT u.cohort_week_us,
      |    ((e.t - (e.t % $WEEK_US)) - u.cohort_week_us) // $WEEK_US
      |      AS week_offset,
      |    CAST(sum(e.cents) AS BIGINT) AS week_cents
      |  FROM ev e JOIN u USING (user_id)
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT *,
      |    CAST(sum(week_cents) OVER (PARTITION BY cohort_week_us
      |      ORDER BY week_offset ASC) AS BIGINT) AS cum_cents
      |  FROM wk)
      |SELECT c.cohort_week_us, c.week_offset, cs.n_users, c.week_cents,
      |  c.cum_cents,
      |  CAST((c.cum_cents * 100) // cs.n_users AS BIGINT)
      |    AS ltv_centi_per_user
      |FROM c JOIN cs USING (cohort_week_us)""".stripMargin

  // ------------------------------------------------------------ q_gini
  /** Gini concentration of per-user activity — "what share of revenue
    * comes from how few users". One row per metric (purchase revenue
    * cents; event counts) with the exact rank-form Gini
    *
    *   G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx)      (x ranked ascending)
    *
    * in integer ppm: the numerator is an exact integer window/aggregate
    * (deterministic `(x, user_id)` rank ordering — equal values
    * contribute the same total regardless of tie order, since Σ(2i−n−1)
    * over a tie run is order-invariant), the final division is one
    * integer `div`. The inequality audit for revenue concentration,
    * and — run over tokens-per-source — the corpus-balance check.
    *
    * 100 TB shape: one user-keyed aggregate to |users| feature rows,
    * then the global index from
    * [[graft.operators.RankOps.withGlobalOrder]] — bucketed
    * distributed sort, no single-partition window at any scale. */
  private def qGini(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    // staged once: three ranking passes per metric read the 2-column
    // feature table from scratch parquet instead of re-aggregating the
    // events corpus each time
    val perUser = graft.operators.RankOps.staged(
      ev.groupBy($"user_id")
        .agg(sum(when($"event_type" === "purchase", $"cents")
            .otherwise(0L)).as("revenue_cents"),
          count(lit(1)).as("n_events")),
      "gini-users", d)
    def gini(df: DataFrame, xCol: String, metric: String): DataFrame = {
      graft.operators.RankOps.withGlobalOrder(
          df.select(col("user_id"), col(xCol).as("x")),
          col("x"), ascending = true, tiebreaks = Seq(col("user_id")),
          rowNumCol = Some("i"))
        .groupBy()
        .agg(count(lit(1)).as("n"), sum($"x").as("total"),
          sum(expr("(2 * i - 1) * x")).as("wsum"))
        .select(lit(metric).as("metric"), $"n", $"total",
          expr("(1000000 * (wsum - n * total)) div (n * total)")
            .as("gini_ppm"))
    }
    gini(perUser, "revenue_cents", "revenue_cents")
      .unionAll(gini(perUser, "n_events", "event_count"))
  }
  private val qGiniSql = {
    def one(x: String, metric: String) =
      s"""SELECT '$metric' AS metric, n, total,
        |  CAST((1000000 * (wsum - n * total)) // (n * total)
        |    AS BIGINT) AS gini_ppm
        |FROM (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS total,
        |    CAST(sum((2 * i - 1) * x) AS BIGINT) AS wsum
        |  FROM (
        |    SELECT $x AS x,
        |      row_number() OVER (ORDER BY $x ASC, user_id ASC) AS i
        |    FROM u))""".stripMargin
    s"""WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
      |             ELSE 0 END) AS BIGINT) AS revenue_cents,
      |    count(*) AS n_events
      |  FROM ev GROUP BY 1)
      |${one("revenue_cents", "revenue_cents")}
      |UNION ALL
      |${one("n_events", "event_count")}""".stripMargin
  }

  // ----------------------------------------------------- q_feature_matrix
  /** Per-(user, active-day) FEATURE MATRIX — the feature-engineering
    * pass that turns a raw event stream into model-ready training rows
    * (churn/propensity models train on exactly these): today's
    * activity, trailing-7-calendar-day rolling aggregates (a RANGE
    * frame on the integer day key, so quiet days genuinely age out —
    * a ROWS frame would be wrong), recency (gap since previous active
    * day), and day-over-day delta. All exact integers; one user-keyed
    * shuffle after the (user, day) pre-aggregate, every window sharing
    * that partitioning. */
  private def qFeatureMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val daily = Tables.events(s, d)
      .select($"user_id", expr(s"unix_micros(ts) div ${DAY_US}L").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n"), sum($"cents").as("day_cents"))
    val byUser = Window.partitionBy($"user_id").orderBy($"day".asc)
    val roll = byUser.rangeBetween(-6, 0)
    daily
      .withColumn("roll7_n", sum($"n").over(roll))
      .withColumn("roll7_cents", sum($"day_cents").over(roll))
      .withColumn("gap_days",
        coalesce($"day" - lag($"day", 1).over(byUser), lit(0L)))
      .withColumn("delta_n",
        coalesce($"n" - lag($"n", 1).over(byUser), lit(0L)))
  }
  private val qFeatureMatrixSql =
    s"""WITH daily AS (
      |  SELECT user_id, epoch_us(ts) // $DAY_US AS day,
      |    count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS day_cents
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, day, n, day_cents,
      |  CAST(sum(n) OVER w7 AS BIGINT) AS roll7_n,
      |  CAST(sum(day_cents) OVER w7 AS BIGINT) AS roll7_cents,
      |  coalesce(day - lag(day) OVER wu, 0) AS gap_days,
      |  coalesce(n - lag(n) OVER wu, 0) AS delta_n
      |FROM daily
      |WINDOW
      |  w7 AS (PARTITION BY user_id ORDER BY day
      |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  wu AS (PARTITION BY user_id ORDER BY day)""".stripMargin

  // ------------------------------------------------ q_funnel_by_variant
  /** The experiment readout × the funnel: per A/B variant (the
    * [[qAbtestMetrics]] seeded-md5 bucketing — stable under retries),
    * how many users reach each ordered funnel step and the step-over-
    * step conversion in integer ppm. This is the composition every
    * growth team actually ships — "did the treatment move WHICH step"
    * — and it reuses the one-shuffle [[userStages]] fold unchanged:
    * the variant is a per-row hash expression, so splitting the funnel
    * by arm adds zero shuffles. */
  private def qFunnelByVariant(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stage = userStages(Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("t"), $"event_type"))
      .withColumn("variant",
        when(conv(substring(md5(concat(lit("ab|"), $"user_id".cast("string"))),
          1, 4), 16, 10).cast("long") % 2 === 0L, "A").otherwise("B"))
    stage.groupBy($"variant")
      .agg(
        sum(when($"stage" >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"stage" >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"stage" >= 3, 1L).otherwise(0L)).as("n3"))
      .select($"variant", explode(expr(
        """array(
          |  named_struct('step', 1, 'step_name', 'view', 'n_users', n1,
          |    'conv_ppm', CAST(1000000 AS BIGINT)),
          |  named_struct('step', 2, 'step_name', 'click', 'n_users', n2,
          |    'conv_ppm', CASE WHEN n1 > 0 THEN (n2 * 1000000L) div n1
          |                ELSE 0L END),
          |  named_struct('step', 3, 'step_name', 'purchase', 'n_users', n3,
          |    'conv_ppm', CASE WHEN n2 > 0 THEN (n3 * 1000000L) div n2
          |                ELSE 0L END))""".stripMargin)).as("r"))
      .select($"variant", $"r.step", $"r.step_name", $"r.n_users",
        $"r.conv_ppm")
  }
  private val qFunnelByVariantSql = {
    val bucket = (1 to 4).map(i =>
      s"(strpos('0123456789abcdef', substring(k, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
      .mkString(" + ")
    s"""WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS t, event_type FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |v AS (
      |  SELECT user_id,
      |    CASE WHEN ($bucket) % 2 = 0 THEN 'A' ELSE 'B' END AS variant
      |  FROM (SELECT DISTINCT user_id,
      |          md5('ab|' || user_id::VARCHAR) AS k FROM ev)),
      |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM ev e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'click' AND e.t >= s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM ev e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.t >= s2.t2 GROUP BY 1),
      |cnt AS (
      |  SELECT v.variant,
      |    CAST(count(s1.user_id) AS BIGINT) AS n1,
      |    CAST(count(s2.user_id) AS BIGINT) AS n2,
      |    CAST(count(s3.user_id) AS BIGINT) AS n3
      |  FROM v
      |  LEFT JOIN s1 USING (user_id)
      |  LEFT JOIN s2 USING (user_id)
      |  LEFT JOIN s3 USING (user_id)
      |  GROUP BY 1)
      |SELECT variant, 1 AS step, 'view' AS step_name, n1 AS n_users,
      |  CAST(1000000 AS BIGINT) AS conv_ppm FROM cnt
      |UNION ALL
      |SELECT variant, 2, 'click', n2,
      |  CASE WHEN n1 > 0 THEN CAST((n2 * 1000000) // n1 AS BIGINT)
      |       ELSE 0 END FROM cnt
      |UNION ALL
      |SELECT variant, 3, 'purchase', n3,
      |  CASE WHEN n2 > 0 THEN CAST((n3 * 1000000) // n2 AS BIGINT)
      |       ELSE 0 END FROM cnt""".stripMargin
  }

  // ------------------------------------------------------ q_hour_heatmap
  /** Weekday × hour activity heatmap — events + distinct users +
    * exact revenue cents per (dow, hour) cell, the load-profile matrix
    * behind staffing, batch-window and rate-limit decisions. Day-of-
    * week is epoch-days mod 7 and hour is integer micros arithmetic
    * (the [[graft.operators.Sketches]] seasonal convention — no
    * engine-private DOW/locale numbering). One hash aggregate onto a
    * ≤168-cell key space: partial-agg collapses almost everything
    * map-side, making this the cheapest possible full-scan shape. */
  private def qHourHeatmap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", unix_micros($"ts").as("t"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("dow", expr(s"CAST((t div ${DAY_US}L) % 7 AS BIGINT)"))
      .withColumn("hour", expr(s"CAST((t % ${DAY_US}L) div 3600000000L AS BIGINT)"))
      .groupBy($"dow", $"hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum($"cents").as("sum_cents"))
  }
  private val qHourHeatmapSql =
    s"""SELECT (epoch_us(ts) // $DAY_US) % 7 AS dow,
      |  (epoch_us(ts) % $DAY_US) // 3600000000 AS hour,
      |  count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------- q_drawdown
  /** Running MAXIMUM DRAWDOWN over each event type's daily close
    * series — the time-series risk statistic (how far below the
    * high-water mark the series has fallen, and the deepest such fall
    * to date). Composes on [[qOhlcBars]]' close definition: the raw
    * events aggregate to |types×days| daily closes FIRST, and all
    * three windows (running max, drawdown, running max drawdown) run
    * on that bounded relation — never a window over raw events. Exact
    * integer cents throughout. */
  private def qDrawdown(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_type", unix_micros($"ts").as("t"), $"event_id",
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("day_us", $"t" - $"t" % DAY_US)
    val desc = Window.partitionBy($"event_type", $"day_us")
      .orderBy($"t".desc, $"event_id".desc)
    val closes = ev.withColumn("rn_d", row_number().over(desc))
      .groupBy($"event_type", $"day_us")
      .agg(max(when($"rn_d" === 1, $"cents")).as("close_cents"))
    val series = Window.partitionBy($"event_type").orderBy($"day_us".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    closes
      .withColumn("high_water_cents", max($"close_cents").over(series))
      .withColumn("drawdown_cents", $"high_water_cents" - $"close_cents")
      .withColumn("max_drawdown_cents", max($"drawdown_cents").over(series))
  }
  private val qDrawdownSql =
    s"""WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS t, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents,
      |    epoch_us(ts) - epoch_us(ts) % $DAY_US AS day_us
      |  FROM events),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type, day_us
      |                               ORDER BY t DESC, event_id DESC) AS rn_d
      |  FROM ev),
      |c AS (
      |  SELECT event_type, day_us,
      |    CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
      |      AS close_cents
      |  FROM r GROUP BY 1, 2),
      |hw AS (
      |  SELECT *,
      |    CAST(max(close_cents) OVER (PARTITION BY event_type
      |      ORDER BY day_us ASC) AS BIGINT) AS high_water_cents
      |  FROM c),
      |dd AS (
      |  SELECT *, high_water_cents - close_cents AS drawdown_cents FROM hw)
      |SELECT event_type, day_us, close_cents, high_water_cents,
      |  drawdown_cents,
      |  CAST(max(drawdown_cents) OVER (PARTITION BY event_type
      |    ORDER BY day_us ASC) AS BIGINT) AS max_drawdown_cents
      |FROM dd""".stripMargin

  // ---------------------------------------------------- q_active_users
  /** DAU / trailing-7-day WAU / stickiness per calendar day — the
    * engagement time series every product dashboard opens with. The
    * hard part at scale is the SLIDING DISTINCT: "users active in the
    * trailing week" cannot be summed from daily counts (a user active
    * 5 days is one WAU member). Shape here: the |user-days| distinct
    * relation explodes each row into the ≤7 trailing windows it
    * supports, a second distinct collapses multi-day users within a
    * window, and one hash aggregate counts — linear in user-days ×
    * window length, shuffled on (user, day), never a per-day rescan of
    * the activity table and never an all-days×all-users join. The day
    * spine comes from `sequence(min, max)`, so quiet days report 0.
    * Stickiness = DAU·10⁶ div WAU, the integer-ppm DAU/WAU ratio. */
  private def qActiveUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", expr(s"unix_micros(ts) div ${DAY_US}L").as("day"))
      .distinct()
    val anchor = ud.agg(min($"day").as("min_day"), max($"day").as("max_day"))
    val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
    val wau = ud.crossJoin(broadcast(anchor))
      .select($"user_id",
        explode(expr("sequence(day, least(day + 6, max_day))")).as("day"))
      .distinct()
      .groupBy($"day").agg(count(lit(1)).as("wau"))
    val spine = anchor
      .select(explode(expr("sequence(min_day, max_day)")).as("day"))
    spine.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
      .select($"day",
        coalesce($"dau", lit(0L)).as("dau"),
        coalesce($"wau", lit(0L)).as("wau"))
      .withColumn("stickiness_ppm",
        when($"wau" > 0, expr("(dau * 1000000) div wau")).otherwise(0L))
  }
  private val qActiveUsersSql =
    s"""WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // $DAY_US AS day
      |  FROM events),
      |a AS (SELECT min(day) AS min_day, max(day) AS max_day FROM ud),
      |spine AS (
      |  SELECT unnest(generate_series(min_day, max_day)) AS day FROM a),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      |wau AS (
      |  SELECT s.day, count(DISTINCT u.user_id) AS wau
      |  FROM spine s JOIN ud u ON u.day BETWEEN s.day - 6 AND s.day
      |  GROUP BY 1)
      |SELECT s.day, coalesce(d.dau, 0) AS dau, coalesce(w.wau, 0) AS wau,
      |  CASE WHEN coalesce(w.wau, 0) > 0
      |       THEN CAST((coalesce(d.dau, 0) * 1000000) // w.wau AS BIGINT)
      |       ELSE 0 END AS stickiness_ppm
      |FROM spine s
      |LEFT JOIN dau d ON d.day = s.day
      |LEFT JOIN wau w ON w.day = s.day""".stripMargin

  // ------------------------------------------------- q_peak_concurrency
  /** PEAK CONCURRENT SESSIONS per day — the capacity-planning readout
    * ("how many sessions were open at the busiest instant"), i.e. the
    * interval-overlap maximum, computed as the classic sweep: +1 at
    * each session start, −1 just past each end, running-sum, max. The
    * sessions are [[sessionize]]'s own output — operator composition,
    * not a re-derivation.
    *
    * The global sweep is the scale trap (one task sorts every mark),
    * so the sweep PARTITIONS BY DAY: each session explodes into the
    * days it covers (human sessions are short — bounded fan-out), a
    * day-crossing session contributes a day-start mark instead of an
    * interior one, and each day's running sum is independent. Marks
    * order by (t, Δ) with −1 first, making back-to-back sessions
    * half-open (no phantom overlap at the boundary) and the tie order
    * value-deterministic. */
  private def qPeakConcurrency(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val sess = sessionize(Tables.events(s, d)).toDF()
      .select($"session_start_us".as("st"), $"session_end_us".as("en"))
    val byDay = sess.select($"st", $"en",
      explode(expr(s"sequence(st div ${DAY_US}L, en div ${DAY_US}L)"))
        .as("day"))
    val marks = byDay
      .select($"day", greatest($"st", $"day" * DAY_US).as("t"),
        lit(1L).as("dlt"))
      .unionAll(byDay
        .filter($"en" + 1 < ($"day" + 1) * DAY_US)
        .select($"day", ($"en" + 1).as("t"), lit(-1L).as("dlt")))
    val w = Window.partitionBy($"day").orderBy($"t".asc, $"dlt".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marks.withColumn("conc", sum($"dlt").over(w))
      .groupBy($"day")
      .agg(sum(when($"dlt" === 1L, 1L).otherwise(0L)).as("n_sessions"),
        max($"conc").as("peak_concurrency"))
  }
  private val qPeakConcurrencySql =
    s"""WITH sess AS ($qSessionizeSql),
      |bd AS (
      |  SELECT session_start_us AS st, session_end_us AS en,
      |    unnest(generate_series(session_start_us // $DAY_US,
      |                           session_end_us // $DAY_US)) AS day
      |  FROM sess),
      |marks AS (
      |  SELECT day, greatest(st, day * $DAY_US) AS t, 1 AS dlt FROM bd
      |  UNION ALL
      |  SELECT day, en + 1, -1 FROM bd WHERE en + 1 < (day + 1) * $DAY_US),
      |sweep AS (
      |  SELECT day, dlt,
      |    sum(dlt) OVER (PARTITION BY day ORDER BY t, dlt
      |                   ROWS UNBOUNDED PRECEDING) AS conc
      |  FROM marks)
      |SELECT day,
      |  CAST(sum(CASE WHEN dlt = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sessions,
      |  CAST(max(conc) AS BIGINT) AS peak_concurrency
      |FROM sweep GROUP BY 1""".stripMargin

  // ------------------------------------------------------ q_event_paths
  /** Top common 3-step behavior paths — "what do users actually DO, in
    * order": every consecutive event-type trigram in each user's
    * time-ordered stream, ranked by occurrence count with the distinct
    * users travelling each path beside it. The n-gram-over-behavior
    * operator behind "common paths" product analytics, and the 3-step
    * generalization of [[qMarkovTransitions]]' 1-step matrix.
    *
    * ONE user shuffle: the per-user fold (sorted collect + positional
    * transform, the bigram-LM idiom) emits (user, path) rows; two hash
    * aggregates land on the ≤|types|³ path key space, and the top-k
    * rank runs on that constant-bounded relation. */
  private[streaming] val PATH_K = 20

  /** Per-user trigram multiset `(user_id, path, n_occ)` over `(user_id,
    * t, event_id, event_type)` rows — the per-user state unit
    * [[EventStateViews]]' PathsView maintains incrementally and
    * [[qEventPaths]] aggregates into the ranking. */
  private[streaming] def userPathCounts(ev: DataFrame): DataFrame = ev
    .select(col("user_id"), col("t"), col("event_id"), col("event_type"))
    .groupBy(col("user_id"))
    .agg(expr(
      """transform(sort_array(collect_list(struct(t, event_id, event_type))),
        |  e -> e.event_type)""".stripMargin).as("seq"))
    // NB sequence(1, 0) DESCENDS in Spark — short streams need the
    // explicit guard, not a greatest() clamp
    .select(col("user_id"), explode(expr(
      """CASE WHEN size(seq) >= 3
        |  THEN transform(sequence(0, size(seq) - 3),
        |    i -> concat(seq[i], '>', seq[i + 1], '>', seq[i + 2]))
        |  ELSE array() END""".stripMargin)).as("path"))
    .groupBy(col("user_id"), col("path"))
    .agg(count(lit(1)).as("n_occ"))

  /** Ranked top paths from any `(user_id?, path, n_occ, n_users?)`
    * aggregate — shared by the batch query and the maintained view's
    * readout. Top-K + rank via [[graft.operators.RankOps.topK]]
    * (TakeOrderedAndProject — no single-partition sort of the path
    * relation, no window at all). */
  private[streaming] def rankPaths(byPath: DataFrame): DataFrame =
    graft.operators.RankOps.topK(
        byPath.select(col("path"), col("n_occurrences"), col("n_users")),
        PATH_K, Seq(("n_occurrences", false), ("path", true)),
        rankName = "rnk")
      .select(col("rnk"), col("path"), col("n_occurrences"), col("n_users"))

  private def qEventPaths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    rankPaths(userPathCounts(Tables.events(s, d)
        .select($"user_id", unix_micros($"ts").as("t"), $"event_id",
          $"event_type"))
      .groupBy($"path")
      .agg(sum($"n_occ").as("n_occurrences"),
        count(lit(1)).as("n_users")))
  }
  private[streaming] val qEventPathsSql =
    s"""WITH seqs AS (
      |  SELECT user_id,
      |    list(event_type ORDER BY t, event_id) AS seq
      |  FROM (SELECT user_id, epoch_us(ts) AS t, event_id, event_type
      |        FROM events)
      |  GROUP BY user_id),
      |paths AS (
      |  SELECT user_id, unnest(list_transform(
      |    generate_series(1, greatest(len(seq) - 2, 0)),
      |    i -> seq[i] || '>' || seq[i + 1] || '>' || seq[i + 2])) AS path
      |  FROM seqs),
      |bp AS (
      |  SELECT path, count(*) AS n_occurrences,
      |    count(DISTINCT user_id) AS n_users
      |  FROM paths GROUP BY 1),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, path ASC)
      |    AS rnk
      |  FROM bp)
      |SELECT rnk, path, n_occurrences, n_users FROM r
      |WHERE rnk <= $PATH_K""".stripMargin

  // ---------------------------------------------------- q_new_returning
  /** Daily NEW vs RETURNING user split + the cumulative acquired-user
    * curve — the growth-accounting companion of [[qActiveUsers]]: DAU
    * decomposes as `dau = n_new + n_returning`, and `cum_users` is the
    * running count of first-seen users (conserves to the total distinct
    * population on the final day). One user-keyed aggregate finds each
    * user's first day; the day-level split is then a |user-days|-scan
    * aggregate (new ⇔ day = first day), and the cumulative curve is a
    * window over the ≤ day-span relation — no per-day distinct rescans. */
  private def qNewReturning(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val ud = Tables.events(s, d)
      .select($"user_id", expr(s"unix_micros(ts) div ${DAY_US}L").as("day"))
      .distinct()
    val firstDay = ud.groupBy($"user_id").agg(min($"day").as("d0"))
    val split = ud.join(firstDay, "user_id")
      .groupBy($"day")
      .agg(sum(when($"day" === $"d0", 1L).otherwise(0L)).as("n_new"),
        sum(when($"day" =!= $"d0", 1L).otherwise(0L)).as("n_returning"))
    val wCum = Window.orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    split
      .withColumn("cum_users", sum($"n_new").over(wCum))
      .select($"day", $"n_new", $"n_returning", $"cum_users")
  }
  private val qNewReturningSql =
    s"""WITH ud AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // $DAY_US AS day
      |  FROM events),
      |f AS (SELECT user_id, min(day) AS d0 FROM ud GROUP BY 1),
      |sp AS (
      |  SELECT ud.day,
      |    CAST(sum(CASE WHEN ud.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(sum(CASE WHEN ud.day <> f.d0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_returning
      |  FROM ud JOIN f USING (user_id)
      |  GROUP BY 1)
      |SELECT day, n_new, n_returning,
      |  CAST(sum(n_new) OVER (ORDER BY day ASC) AS BIGINT) AS cum_users
      |FROM sp""".stripMargin

  // --------------------------------------------------- q_user_lifecycle
  /** Weekly user-lifecycle accounting — the full state machine behind
    * [[qNewReturning]]'s daily split: every active (user, week) is NEW
    * (first week ever), RETAINED (also active the week before) or
    * RESURRECTED (returning after ≥ 1 skipped week), and CHURNING-OUT
    * (not active the following week — the last-observed week churns by
    * definition). WAU = new + retained + resurrected per week, so the
    * rows reconcile against [[qActiveUsers]] exactly.
    *
    * One distinct (user, week) relation, one per-user lag/lead window,
    * one week-level aggregate — the user window shuffles on user_id
    * (millions of small groups, the scalable direction) and the final
    * aggregate is |weeks|-row. No joins, no per-week distinct rescans. */
  private def qUserLifecycle(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val uw = Tables.events(s, d)
      .select($"user_id", expr(s"unix_micros(ts) div ${WEEK_US}L").as("week"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"week".asc)
    uw.withColumn("prev_w", lag($"week", 1).over(w))
      .withColumn("next_w", lead($"week", 1).over(w))
      .groupBy($"week")
      .agg(
        count(lit(1)).as("wau"),
        sum(when($"prev_w".isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when($"week" - $"prev_w" === 1L, 1L).otherwise(0L)).as("n_retained"),
        sum(when($"week" - $"prev_w" > 1L, 1L).otherwise(0L)).as("n_resurrected"),
        sum(when($"next_w".isNull || $"next_w" - $"week" > 1L, 1L).otherwise(0L))
          .as("n_churning_out"))
  }
  private val qUserLifecycleSql =
    s"""WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // $WEEK_US AS week
      |  FROM events),
      |st AS (
      |  SELECT user_id, week,
      |    lag(week) OVER (PARTITION BY user_id ORDER BY week ASC) AS prev_w,
      |    lead(week) OVER (PARTITION BY user_id ORDER BY week ASC) AS next_w
      |  FROM uw)
      |SELECT week, count(*) AS wau,
      |  CAST(sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_new,
      |  CAST(sum(CASE WHEN week - prev_w = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_retained,
      |  CAST(sum(CASE WHEN week - prev_w > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_resurrected,
      |  CAST(sum(CASE WHEN next_w IS NULL OR next_w - week > 1
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_churning_out
      |FROM st GROUP BY week""".stripMargin

  // ---------------------------------------------- q_field_completeness
  /** Event-stream data-quality profile: per event type, the null/empty
    * rates of every payload field plus distinct-user coverage — the
    * monitor that catches a producer deploy that silently stopped
    * populating `value` or `props` long before any downstream metric
    * drifts. One hash aggregate over the stream (the countDistinct adds
    * the usual expand — at 100 TB swap in the HLL sketch row
    * (q_hll_distinct) if exactness isn't required); integer ppm output.
    * The `props` key probe is a plain LIKE so both engines evaluate the
    * identical predicate. */
  private def qFieldCompleteness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"value".isNull, 1L).otherwise(0L)).as("n_value_null"),
        sum(when($"props".isNull || $"props" === "", 1L).otherwise(0L))
          .as("n_props_empty"),
        sum(when($"props".like("%\"k\":%"), 1L).otherwise(0L))
          .as("n_props_k"),
        countDistinct($"user_id").as("n_users"))
      .select($"event_type", $"n",
        expr("n_value_null * 1000000L div n").as("value_null_ppm"),
        expr("n_props_empty * 1000000L div n").as("props_empty_ppm"),
        expr("n_props_k * 1000000L div n").as("props_k_ppm"),
        $"n_users")
  }
  private val qFieldCompletenessSql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // count(*) AS value_null_ppm,
      |  CAST(sum(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END)
      |    AS BIGINT) * 1000000 // count(*) AS props_empty_ppm,
      |  CAST(sum(CASE WHEN props LIKE '%"k":%' THEN 1 ELSE 0 END)
      |    AS BIGINT) * 1000000 // count(*) AS props_k_ppm,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------- q_item_cooccur
  /** Item-item co-occurrence similarity ("users who engaged with X
    * also engaged with Y") — the collaborative-filtering statistic,
    * computed from the `props.k` item key of engagement events. Per
    * pair: co-engagement count, cosine over the user-set geometry
    * (n_xy/√(n_x·n_y)) and integer-ppm LIFT against independence
    * (n_xy·N / (n_x·n_y)).
    *
    * 100 TB shape: the quadratic step is the per-USER self-join of the
    * distinct (user, item) relation — fan-out is items-per-user², a
    * human-bounded constant, never catalog². The pair aggregate lands
    * on the item-pair key space (≤ catalog²/2 but in practice sparse);
    * item marginals and the user count are broadcast back onto it.
    * Hot-user capping (drop users with > L distinct items — bots /
    * shared accounts, which both blow the join AND poison the signal)
    * is the standard guard at crawl scale; the fixture has none, so no
    * cap is applied. */
  private def qItemCooccur(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ui = Tables.events(s, d)
      .filter($"event_type".isin("view", "click", "purchase"))
      .select($"user_id",
        // BIGINT so the Spark parse width matches the oracle's direct
        // json_extract→BIGINT cast — an item id past INT32 must not be
        // nulled out on one side only (ADVICE r9)
        from_json($"props", lit("k BIGINT")).getField("k").as("item"))
      .filter($"item".isNotNull)
      .distinct()
    val nu = ui.agg(countDistinct($"user_id").as("n_users"))
    val cnt = ui.groupBy($"item").agg(count(lit(1)).as("n"))
    ui.alias("a").join(ui.alias("b"),
        $"a.user_id" === $"b.user_id" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("item_x"), $"b.item".as("item_y"))
      .agg(count(lit(1)).as("n_xy"))
      .filter($"n_xy" >= 2)
      .join(broadcast(cnt.select($"item".as("item_x"), $"n".as("n_x"))),
        "item_x")
      .join(broadcast(cnt.select($"item".as("item_y"), $"n".as("n_y"))),
        "item_y")
      .crossJoin(broadcast(nu))
      .select($"item_x", $"item_y", $"n_x", $"n_y", $"n_xy",
        round($"n_xy" / sqrt($"n_x" * $"n_y"), 6).as("cosine"),
        expr("(n_xy * n_users * 1000000) div (n_x * n_y)").as("lift_ppm"))
  }
  private val qItemCooccurSql =
    """WITH ui AS (
      |  SELECT DISTINCT user_id,
      |    json_extract(props, '$.k')::BIGINT AS item
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |    AND json_extract(props, '$.k') IS NOT NULL),
      |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ui),
      |cnt AS (SELECT item, count(*) AS n FROM ui GROUP BY 1),
      |p AS (
      |  SELECT a.item AS item_x, b.item AS item_y, count(*) AS n_xy
      |  FROM ui a JOIN ui b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 2)
      |SELECT p.item_x, p.item_y, cx.n AS n_x, cy.n AS n_y, p.n_xy,
      |  round(p.n_xy / sqrt(CAST(cx.n * cy.n AS DOUBLE)), 6) AS cosine,
      |  CAST((p.n_xy * nu.n_users * 1000000) // (cx.n * cy.n) AS BIGINT)
      |    AS lift_ppm
      |FROM p
      |JOIN cnt cx ON cx.item = p.item_x
      |JOIN cnt cy ON cy.item = p.item_y, nu""".stripMargin

  override val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q_event_windows"   -> qEventWindows _,
    "q_sliding_windows" -> qSlidingWindows _,
    "q_sessionize"      -> qSessionize _,
    "q_funnel"          -> qFunnel _,
    "q_funnel_windowed" -> qFunnelWindowed _,
    "q_retention"       -> qRetention _,
    "q_attribution"     -> qAttribution _,
    "q_abtest_metrics"  -> qAbtestMetrics _,
    "q_conversion_lag"  -> qConversionLag _,
    "q_rfm"             -> qRfm _,
    "q_markov_transitions" -> qMarkovTransitions _,
    "q_markov_anomaly"  -> qMarkovAnomaly _,
    "q_ohlc_bars"       -> qOhlcBars _,
    "q_time_weighted_avg" -> qTimeWeightedAvg _,
    "q_survival_hazard" -> qSurvivalHazard _,
    "q_cohort_ltv"      -> qCohortLtv _,
    "q_gini"            -> qGini _,
    "q_active_users"    -> qActiveUsers _,
    "q_new_returning"   -> qNewReturning _,
    "q_user_lifecycle"  -> qUserLifecycle _,
    "q_field_completeness" -> qFieldCompleteness _,
    "q_event_paths"     -> qEventPaths _,
    "q_peak_concurrency" -> qPeakConcurrency _,
    "q_drawdown"        -> qDrawdown _,
    "q_funnel_by_variant" -> qFunnelByVariant _,
    "q_hour_heatmap"    -> qHourHeatmap _,
    "q_feature_matrix"  -> qFeatureMatrix _,
    "q_item_cooccur"    -> qItemCooccur _,
    "q_enrich"          -> qEnrich _)

  override val oracles: Seq[(String, String)] = Seq(
    "q_event_windows"   -> qEventWindowsSql,
    "q_sliding_windows" -> qSlidingWindowsSql,
    "q_sessionize"      -> qSessionizeSql,
    "q_funnel"          -> qFunnelSql,
    "q_funnel_windowed" -> qFunnelWindowedSql,
    "q_retention"       -> qRetentionSql,
    "q_attribution"     -> qAttributionSql,
    "q_abtest_metrics"  -> qAbtestMetricsSql,
    "q_conversion_lag"  -> qConversionLagSql,
    "q_rfm"             -> qRfmSql,
    "q_markov_transitions" -> qMarkovTransitionsSql,
    "q_markov_anomaly"  -> qMarkovAnomalySql,
    "q_ohlc_bars"       -> qOhlcBarsSql,
    "q_time_weighted_avg" -> qTimeWeightedAvgSql,
    "q_survival_hazard" -> qSurvivalHazardSql,
    "q_cohort_ltv"      -> qCohortLtvSql,
    "q_gini"            -> qGiniSql,
    "q_active_users"    -> qActiveUsersSql,
    "q_new_returning"   -> qNewReturningSql,
    "q_user_lifecycle"  -> qUserLifecycleSql,
    "q_field_completeness" -> qFieldCompletenessSql,
    "q_event_paths"     -> qEventPathsSql,
    "q_peak_concurrency" -> qPeakConcurrencySql,
    "q_drawdown"        -> qDrawdownSql,
    "q_funnel_by_variant" -> qFunnelByVariantSql,
    "q_hour_heatmap"    -> qHourHeatmapSql,
    "q_feature_matrix"  -> qFeatureMatrixSql,
    "q_item_cooccur"    -> qItemCooccurSql,
    "q_enrich"          -> qEnrichSql)
}
