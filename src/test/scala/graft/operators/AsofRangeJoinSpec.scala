package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantics + plan shape of the as-of and band joins (value parity is
  * the DuckDB oracle gate — `q_asof_join` vs native ASOF JOIN,
  * `q_range_join` vs the naive theta join). */
class AsofRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def sides() = {
    val ev = Tables.events(spark, sf)
    val left = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts", $"value")
    val right = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"value").as("click_value"))
    (left, right)
  }

  test("asof equals the naive join+rank formulation on real data") {
    val (left, right) = sides()
    val fast = AsofJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_value"), "click_")
    val naive = AsofJoin.asofNaive(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_value"), "click_")
    assert(fast.count() === left.count(), "left join: every left row survives")
    assert(fast.select(fast.columns.map(col).toIndexedSeq: _*).collect().toSet ===
      naive.select(fast.columns.map(col).toIndexedSeq: _*).collect().toSet)
  }

  test("asof matches inclusively and only backward") {
    val left = Seq((1L, ts("10:00"), "l1"), (1L, ts("09:00"), "l0"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts("10:00"), 10.0), (1L, ts("09:30"), 5.0),
      (1L, ts("11:00"), 99.0), (2L, ts("08:00"), 7.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"tag", $"asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("l1") === Some(10.0), "equal timestamps match (inclusive)")
    assert(out("l0") === None, "no right row at or before 09:00 for key 1")
  }

  test("asof tolerance discards stale matches but keeps the left row") {
    val left = Seq((1L, ts("12:00"), "l")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("09:00"), 5.0)).toDF("k", "t", "v")
    val loose = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"asof_v").as[Option[Double]].head()
    assert(loose === Some(5.0))
    val strict = AsofJoin.asof(left, right, Seq("k"), "t", "t", Seq("v"),
        toleranceUs = Some(3600000000L)) // 1 hour: 09:00 is too stale
      .select($"asof_v").as[Option[Double]].collect()
    assert(strict.toSeq === Seq(None), "stale match nulls, left row survives")
  }

  test("the asof plan is one key shuffle with NO join node") {
    val (left, right) = sides()
    val plan = AsofJoin.asof(left, right, Seq("user_id"), "ts", "ts",
      Seq("click_value")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    // the union feeds exactly one hash-partitioning exchange for the
    // window (the right side's groupBy adds its own upstream)
    assert(plan.contains("Window"), "the carry-forward window must survive")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
  }

  test("band join equals the naive theta join and plans as an equi-join") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter($"event_type" === "error")
      .select($"event_id".as("err_id"), $"user_id", $"ts".as("err_ts"))
    val r = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val tol = 3600000000L
    val banded = RangeJoin.bandJoin(l, r, Seq("user_id"), "err_ts", "click_ts", tol)
      .select($"err_id", $"click_id")
    val naive = l.join(r, l("user_id") === r("user_id") &&
        abs(unix_micros($"err_ts") - unix_micros($"click_ts")) <= tol)
      .select($"err_id", $"click_id")
    val pairs = banded.collect()
    assert(pairs.length === pairs.toSet.size, "each pair exactly once")
    assert(pairs.toSet === naive.collect().toSet)
    val plan = RangeJoin.bandJoin(l, r, Seq("user_id"), "err_ts", "click_ts", tol)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"band join must stay an equi-join:\n$plan")
  }

  test("band join rejects colliding non-key columns") {
    val df = Seq((1L, ts("10:00"), "x")).toDF("k", "t", "c")
    intercept[IllegalArgumentException](
      RangeJoin.bandJoin(df, df, Seq("k"), "t", "t", 1000L))
  }

  test("registered oracle queries return rows") {
    assert(SparkEntry.queries("q_asof_join")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q_range_join")(spark, sf).count() > 0)
  }

  private def ts(hhmm: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"2024-03-01 $hhmm:00")
}
