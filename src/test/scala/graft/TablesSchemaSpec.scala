package graft

import org.apache.spark.sql.types.TimestampType

/** Loader-drift tripwire (VERDICT r8 #2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed `events.ts`'s parquet physical type once (TIMESTAMP(NANOS) →
  * timestamp[us]), which silently broke every events-based query. This
  * spec pins the *loaded* schema contract in ONE place so the next
  * physical-type drift produces one clear failure instead of 39.
  */
class TablesSchemaSpec extends SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("events loads with ts: TIMESTAMP and rows > 0 for every sf dir") {
    for (dir <- sfDirs) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir/events.parquet: loaded ts dtype ${ev.schema("ts").dataType} (loader branch missing?)")
      assert(ev.limit(1).count() == 1L, s"$dir/events.parquet: empty")
    }
  }

  test("events ts values are sane epoch range (loader arithmetic not off by 1000x)") {
    import org.apache.spark.sql.functions._
    val ev  = Tables.events(spark, sf)
    val row = ev.agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head()
    val (lo, hi) = (row.getInt(0), row.getInt(1))
    assert(lo >= 1990 && hi <= 2100, s"events.ts year range [$lo,$hi] implausible — nanos/micros confusion?")
  }

  test("core tables load non-empty with stable key columns") {
    val expect: Seq[(String, String)] = Seq(
      "lineitem"   -> "l_orderkey",
      "orders"     -> "o_orderkey",
      "customer"   -> "c_custkey",
      "supplier"   -> "s_suppkey",
      "part"       -> "p_partkey",
      "nation"     -> "n_nationkey",
      "region"     -> "r_regionkey",
      "documents"  -> "doc_id",
      "embeddings" -> "vec_id"
    )
    for ((name, key) <- expect) {
      val df = Tables.table(spark, sf, name)
      assert(df.columns.contains(key), s"$name: missing key column $key (columns: ${df.columns.mkString(",")})")
      assert(df.limit(1).count() == 1L, s"$name: empty at $sf")
    }
  }
}
