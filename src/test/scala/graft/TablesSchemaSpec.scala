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

  test("documents loads with the dtypes every text operator folds over") {
    import org.apache.spark.sql.types._
    val df = Tables.documents(spark, sf)
    val want = Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
    for ((c, t) <- want)
      assert(df.schema(c).dataType == t,
        s"documents.$c loaded as ${df.schema(c).dataType}, operators assume $t")
  }

  test("embeddings loads float-array vectors and integer labels") {
    import org.apache.spark.sql.types._
    val df = Tables.embeddings(spark, sf)
    assert(df.schema("vec_id").dataType == LongType,
      s"embeddings.vec_id loaded as ${df.schema("vec_id").dataType}")
    assert(df.schema("embedding").dataType == ArrayType(FloatType),
      s"embeddings.embedding loaded as ${df.schema("embedding").dataType} — " +
        "cosine/quantization arithmetic assumes array<float>")
    assert(df.schema("label").dataType == IntegerType,
      s"embeddings.label loaded as ${df.schema("label").dataType}")
  }

  test("lineitem loads with the numeric/date dtypes the pricing rows assume") {
    import org.apache.spark.sql.types._
    val df = Tables.lineitem(spark, sf)
    val want = Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_returnflag" -> StringType,
      // loads as NTZ today; a driver regeneration to tz-TIMESTAMP (or
      // DATE) shifts every shipdate filter under a non-UTC session and
      // must be re-checked against the date arithmetic, not waved past
      "l_shipdate" -> TimestampNTZType)
    for ((c, t) <- want)
      assert(df.schema(c).dataType == t,
        s"lineitem.$c loaded as ${df.schema(c).dataType}, operators assume $t")
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
