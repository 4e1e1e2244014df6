package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.{Merge, VersionedTable, WhenMatchedDelete, WhenMatchedUpdate, WhenNotMatchedInsert}

/** Incremental funnel/retention views ([[EventStateViews]]): after any
  * sequence of event appends (including out-of-order and stage-
  * regressing late arrivals) the refreshed state must equal the batch
  * recompute over the full events snapshot, and the chained histogram
  * must equal an aggregate over that state. */
class EventStateViewsSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("t", LongType)))

  private def freshEvents(): (VersionedTable, String) = {
    val root = graft.Scratch.dir("graft-esv")
    val ev = VersionedTable.create(spark, root.resolve("ev").toString,
      evSchema, Map(VersionedTable.PROP_CDF -> "true"))
    (ev, root.toString)
  }

  private def rows(tuples: (Long, Long, String, Long)*): DataFrame =
    tuples.toDF("event_id", "user_id", "event_type", "t")

  private def batchStages(ev: VersionedTable): Set[(Long, Int)] =
    EventWindows.userStages(ev.snapshot()
        .select($"user_id", $"t", $"event_type"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def stateStages(v: FunnelView): Set[(Long, Int)] =
    v.state.snapshot().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  private def funnelCounts(v: FunnelView): Map[Int, Long] =
    v.funnel().collect().map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("funnel view ≡ batch recompute across appends, late events, deletes") {
    val (ev, root) = freshEvents()
    // batch 1: u1 full funnel, u2 view-only, u3 click-before-view
    ev.append(rows(
      (1, 1, "view", 100), (2, 1, "click", 200), (3, 1, "purchase", 300),
      (4, 2, "view", 100),
      (5, 3, "click", 100), (6, 3, "view", 200)))
    val v = EventStateViews.buildFunnel(ev, s"$root/v")
    assert(stateStages(v) === batchStages(ev))
    assert(stateStages(v) === Set((1L, 3), (2L, 1), (3L, 1)))

    // batch 2: u2 advances; u4 appears; u3's LATE view at t=50
    // re-qualifies the t=100 click (stage 1 → 2): exactly the case a
    // forward fold cannot handle and the per-user re-read must
    ev.append(rows(
      (7, 2, "click", 500), (8, 4, "purchase", 100),
      (9, 3, "view", 50)))
    assert(v.refresh(ev).isDefined)
    assert(stateStages(v) === batchStages(ev))
    assert(stateStages(v) === Set((1L, 3), (2L, 2), (3L, 2)))

    // histogram-driven readout matches a direct aggregate
    assert(funnelCounts(v) === Map(1 -> 3L, 2 -> 3L, 3 -> 1L))

    // delete u1's events entirely: its state row must vanish
    ev.deleteWhere($"user_id" === 1L)
    assert(v.refresh(ev).isDefined)
    assert(stateStages(v) === batchStages(ev))
    assert(!stateStages(v).exists(_._1 == 1L))
    assert(funnelCounts(v) === Map(1 -> 2L, 2 -> 2L, 3 -> 0L))

    // idempotent: nothing new → None, state unchanged
    val before = stateStages(v)
    assert(v.refresh(ev).isEmpty)
    assert(stateStages(v) === before)
  }

  private def batchTriangle(ev: VersionedTable): Set[(Long, Long, Long)] =
    EventWindows.userCohortWeeks(ev.snapshot().select($"user_id", $"t"))
      .groupBy($"cohort_week_us", $"week_offset")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def viewTriangle(v: RetentionView): Set[(Long, Long, Long)] =
    v.triangle().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("retention view ≡ batch recompute across appends and cohort shifts") {
    val wk = EventWindows.WEEK_US
    val (ev, root) = freshEvents()
    ev.append(rows(
      (1, 1, "view", wk * 10 + 5), (2, 1, "view", wk * 12 + 5),
      (3, 2, "view", wk * 11 + 5)))
    val v = EventStateViews.buildRetention(ev, s"$root/v")
    assert(viewTriangle(v) === batchTriangle(ev))

    // u1 gets a LATE event one week before its first: cohort shifts
    // back, every offset changes — old (user, week) rows rewrite and
    // the vanished pair set must delete
    ev.append(rows((4, 1, "view", wk * 9 + 5), (5, 3, "view", wk * 11 + 1)))
    assert(v.refresh(ev).isDefined)
    assert(viewTriangle(v) === batchTriangle(ev))
    // u1 cohort now week 9 with offsets {0,1,3}; u2,u3 cohort week 11
    assert(viewTriangle(v) === Set(
      (wk * 9, 0L, 1L), (wk * 9, 1L, 1L), (wk * 9, 3L, 1L),
      (wk * 11, 0L, 2L)))

    // a user's week vanishes when its only event is deleted
    ev.deleteWhere($"event_id" === 2L) // u1's week-12 activity
    assert(v.refresh(ev).isDefined)
    assert(viewTriangle(v) === batchTriangle(ev))
    assert(viewTriangle(v) === Set(
      (wk * 9, 0L, 1L), (wk * 9, 1L, 1L), (wk * 11, 0L, 2L)))
  }

  test("streaming maintenance drains event appends into the funnel view") {
    val (ev, root) = freshEvents()
    ev.append(rows((1, 1, "view", 100), (2, 2, "view", 100)))
    val v = EventStateViews.buildFunnel(ev, s"$root/v")
    ev.append(rows((3, 1, "click", 200), (4, 3, "purchase", 50)))
    CdcStreams.startIndexMaintenance(spark, ev, () => v.refresh(ev),
      s"$root/_cp/funnel").awaitTermination()
    assert(stateStages(v) === batchStages(ev))
    assert(funnelCounts(v) === Map(1 -> 2L, 2 -> 1L, 3 -> 0L))
    // restart with nothing new: checkpointed progress, state untouched
    val ver = v.state.latestVersion
    CdcStreams.startIndexMaintenance(spark, ev, () => v.refresh(ev),
      s"$root/_cp/funnel").awaitTermination()
    assert(v.state.latestVersion === ver)
    // a further append is picked up by the next drain
    ev.append(rows((5, 2, "click", 300)))
    CdcStreams.startIndexMaintenance(spark, ev, () => v.refresh(ev),
      s"$root/_cp/funnel").awaitTermination()
    assert(stateStages(v) === batchStages(ev))
    assert(funnelCounts(v) === Map(1 -> 2L, 2 -> 2L, 3 -> 0L))
  }

  test("funnel refresh is delta-scoped: untouched users' buckets are not rewritten") {
    val (ev, root) = freshEvents()
    ev.append((1L to 400L).map(u =>
      (u, u, "view", 100L)).toDF("event_id", "user_id", "event_type", "t")
      .repartitionByRange(8, $"user_id"))
    val v = EventStateViews.buildFunnel(ev, s"$root/v")
    val filesBefore = v.state.snapshot().inputFiles.toSet
    // one user advances; only that user's state bucket should rewrite
    ev.append(rows((1000, 7, "click", 200)))
    assert(v.refresh(ev).isDefined)
    val filesAfter = v.state.snapshot().inputFiles.toSet
    val untouched = filesBefore.intersect(filesAfter)
    assert(untouched.nonEmpty,
      "every state file rewrote — refresh is not delta-scoped")
    assert(stateStages(v) === batchStages(ev))
  }

  // --------------------------------------------------------- sessions
  private val sessSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("t", LongType),
    StructField("value", DoubleType)))

  private def sessRows(tuples: (Long, Long, Long, Double)*): DataFrame =
    tuples.toDF("event_id", "user_id", "t", "value")

  private def sessState(v: SessionView): Set[(Long, Long, Long, Long, Double)] =
    v.sessions().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

  private def sessBatch(ev: VersionedTable): Set[(Long, Long, Long, Long, Double)] =
    EventStateViews.sessionDerive(ev.snapshot()).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet

  test("session view ≡ batch sessionize through merges, splits, deletes") {
    val gap = EventWindows.DefaultGapMinutes * 60L * 1000000L
    val root = graft.Scratch.dir("graft-sess-src")
    val t = VersionedTable.create(spark, root.resolve("t").toString,
      sessSchema, Map(VersionedTable.PROP_CDF -> "true"))
    // u1: two separate sessions (1.8 gaps apart); u2: one session
    t.append(sessRows(
      (1, 1, 0, 1.0), (2, 1, 1000, 2.0),
      (3, 1, (1.8 * gap).toLong, 4.0),
      (4, 2, 500, 8.0)))
    val v = EventStateViews.buildSessions(t, root.resolve("sv").toString)
    assert(sessState(v) === sessBatch(t))
    assert(sessState(v).count(_._1 == 1L) === 2) // two u1 sessions
    // a LATE bridging event lands between u1's sessions → they MERGE
    // into one row keyed at the ORIGINAL first start; both old rows
    // must be replaced (one deleted, one rewritten)
    t.append(sessRows((5, 1, (0.9 * gap).toLong, 16.0)))
    v.refresh(t)
    assert(sessState(v) === sessBatch(t))
    assert(sessState(v).count(_._1 == 1L) === 1)
    // deleting the bridge SPLITS the session back into two
    t.deleteWhere(col("event_id") === 5)
    v.refresh(t)
    assert(sessState(v) === sessBatch(t))
    assert(sessState(v).count(_._1 == 1L) === 2)
    // refresh with no changes is a no-op that stays converged
    v.refresh(t)
    assert(sessState(v) === sessBatch(t))
  }

  test("paths view ≡ batch recompute through mid-stream inserts and deletes") {
    val (ev, root) = freshEvents()
    def batchTop(): Set[(Long, String, Long, Long)] =
      EventWindows.rankPaths(EventWindows.userPathCounts(ev.snapshot())
          .groupBy($"path")
          .agg(sum($"n_occ").as("n_occurrences"),
            count(lit(1)).as("n_users")))
        .as[(Long, String, Long, Long)].collect().toSet
    def viewTop(v: PathsView): Set[(Long, String, Long, Long)] =
      v.topPaths().as[(Long, String, Long, Long)].collect().toSet
    // u1: view > click > purchase; u2: view > view > click
    ev.append(rows(
      (1, 1, "view", 100), (2, 1, "click", 200), (3, 1, "purchase", 300),
      (4, 2, "view", 100), (5, 2, "view", 200), (6, 2, "click", 300)))
    val v = EventStateViews.buildPaths(ev, s"$root/v")
    assert(viewTop(v) === batchTop())
    // mid-stream insert for u1 at t=150: view>click>purchase becomes
    // view>error>click + error>click>purchase — neighbors rewrite
    ev.append(rows((7, 1, "error", 150)))
    v.refresh(ev)
    assert(viewTop(v) === batchTop())
    assert(viewTop(v).exists(_._2 == "view>error>click"))
    // retroactive delete of that event restores the original trigram
    ev.deleteWhere($"event_id" === 7)
    v.refresh(ev)
    assert(viewTop(v) === batchTop())
    assert(viewTop(v).exists(_._2 == "view>click>purchase"))
    assert(!viewTop(v).exists(_._2.contains("error")))
    // deleting a whole user's events drops their paths and travellers
    ev.deleteWhere($"user_id" === 2)
    v.refresh(ev)
    assert(viewTop(v) === batchTop())
    // idempotent refresh stays converged
    v.refresh(ev)
    assert(viewTop(v) === batchTop())
  }

  private val attrSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("t", LongType),
    StructField("value", DoubleType)))

  private def attrRows(ts: (Long, Long, String, Long, Double)*): DataFrame =
    ts.toDF("event_id", "user_id", "event_type", "t", "value")

  private def attrState(v: AttributionView): Set[(Long, String, Long, Long)] =
    v.state.snapshot().collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet

  test("attribution view: late touch re-credits, touch delete falls back, purchase delete evicts") {
    val root = graft.Scratch.dir("graft-attr-spec")
    val ev = VersionedTable.create(spark, root.resolve("ev").toString,
      attrSchema, Map(VersionedTable.PROP_CDF -> "true"))
    val day = EventWindows.ATTR_US
    ev.append(attrRows(
      (10L, 1L, "view", 1000L, 0.0),
      (11L, 1L, "purchase", 5000L, 10.0),
      (20L, 2L, "purchase", 100L, 5.0),
      (30L, 3L, "view", 0L, 0.0),
      (31L, 3L, "purchase", day + 1L, 1.0)))
    val v = EventStateViews.buildAttribution(ev, root.resolve("v").toString)
    // initial: 11 ← view 10; 20 direct (no touch); 31 direct (stale touch)
    assert(attrState(v) === Set(
      (11L, "view", 10L, 4000L),
      (20L, "direct", -1L, -1L),
      (31L, "direct", -1L, -1L)))
    // late arrivals: click BETWEEN 10 and 11 re-credits purchase 11;
    // a touch AFTER user 2's purchase must not attribute it
    ev.append(attrRows(
      (12L, 1L, "click", 3000L, 0.0),
      (21L, 2L, "view", 200L, 0.0)))
    v.refresh(ev)
    assert(attrState(v) === Set(
      (11L, "click", 12L, 2000L),
      (20L, "direct", -1L, -1L),
      (31L, "direct", -1L, -1L)))
    // deleting the credited click falls purchase 11 back to view 10
    ev.deleteWhere(col("event_id") === 12L)
    v.refresh(ev)
    assert(attrState(v) === Set(
      (11L, "view", 10L, 4000L),
      (20L, "direct", -1L, -1L),
      (31L, "direct", -1L, -1L)))
    // deleting a purchase evicts its state row; readout tracks exactly
    ev.deleteWhere(col("event_id") === 11L)
    v.refresh(ev)
    assert(attrState(v) === Set(
      (20L, "direct", -1L, -1L),
      (31L, "direct", -1L, -1L)))
    val chan = v.byChannel().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(chan === Set(("direct", 2L, 600L)))
    // idempotent refresh: watermark current, no state churn
    val ver = v.state.latestVersion
    v.refresh(ev)
    assert(v.state.snapshot().count() === 2L)
    assert(v.state.latestVersion === ver ||
      v.state.changes(ver + 1).isEmpty)
  }

  test("chained distinct views: refcount churn cancels, last-support delete evicts") {
    import graft.table.AggView
    val root = graft.Scratch.dir("graft-esv-dau")
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("day", LongType)))
    val e = VersionedTable.create(spark, root.resolve("e").toString,
      schema, Map(VersionedTable.PROP_CDF -> "true"))
    def entries(ts: (Long, Long, Long)*): DataFrame =
      ts.toDF("event_id", "user_id", "day")
    // day 10: user 1 twice, user 2 once; day 11: user 1 once
    e.append(entries((1, 1, 10), (2, 1, 10), (3, 2, 10), (4, 1, 11)))
    val ref = AggView.build(e, root.resolve("ref").toString,
      Seq("user_id", "day"), Seq.empty)
    val dau = AggView.build(ref.table, root.resolve("dau").toString,
      Seq("day"), Seq.empty)
    def dauMap(): Map[Long, Long] = dau.table.snapshot()
      .select($"day", $"n_rows".cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(dauMap() === Map(10L -> 2L, 11L -> 1L))
    // delete ONE of user 1's two day-10 events: refcount 2 -> 1, the
    // group stays alive, the downstream update pair must cancel
    e.deleteWhere($"event_id" === 1)
    ref.refresh(e); dau.refresh(ref.table)
    assert(dauMap() === Map(10L -> 2L, 11L -> 1L))
    // delete the LAST support: user 1 leaves day 10, day 11 untouched
    e.deleteWhere($"event_id" === 2)
    ref.refresh(e); dau.refresh(ref.table)
    assert(dauMap() === Map(10L -> 1L, 11L -> 1L))
    // delete user 2's only event: the day-10 group itself disappears
    e.deleteWhere($"event_id" === 3)
    ref.refresh(e); dau.refresh(ref.table)
    assert(dauMap() === Map(11L -> 1L))
    // re-appending restores membership (the chain is churn-symmetric)
    e.append(entries((5, 2, 10)))
    ref.refresh(e); dau.refresh(ref.table)
    assert(dauMap() === Map(10L -> 1L, 11L -> 1L))
  }
}
