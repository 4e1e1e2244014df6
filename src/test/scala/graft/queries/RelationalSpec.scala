package graft.queries

import graft.{SparkEntry, SparkSpec}

class RelationalSpec extends SparkSpec {

  test("all relational queries run and return rows at sf0.001") {
    for ((name, fn) <- Relational.queries) {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has matching column names in its oracle pairing") {
    val oracleNames = Relational.oracles.map(_._1).toSet
    val queryNames = Relational.queries.map(_._1).toSet
    assert(oracleNames.subsetOf(queryNames))
  }

  test("q6 window dedup keeps exactly one row per user") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q6_window_dedup")(spark, sf)
    val dupUsers = df.groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dupUsers === 0)
    assert(df.count() === df.select("user_id").distinct().count())
  }

  test("q5 right outer join returns one row per nation with no nulls") {
    val df = SparkEntry.queries("q5_right_outer_nvl")(spark, sf)
    assert(df.count() === 25)
    assert(df.filter(df("total_bal").isNull).count() === 0)
  }

  test("q8 signed delta equals per-user manual recomputation exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Same grouping as q8 so the comparison is exact per user — a
    // global-sum-of-rounded-values comparison accumulates rounding error
    // with user cardinality and goes flaky at larger fixtures (ADVICE r1).
    val expected = graft.Tables.events(spark, sf)
      .select($"user_id",
        when($"event_type" === "error", -$"value").otherwise($"value").as("d"))
      .groupBy($"user_id")
      .agg(round(sum($"d"), 2).as("net_value"))
    val got = SparkEntry.queries("q8_signed_delta")(spark, sf)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("q13 point lookup pushes the key predicate to the parquet scan") {
    val df = SparkEntry.queries("q13_point_lookup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"expected pushed filter in plan:\n$plan")
  }
}
