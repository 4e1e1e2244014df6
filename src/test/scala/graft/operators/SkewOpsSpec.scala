package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join equals the plain inner join, row for row") {
    val big = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val small = Tables.orders(spark, sf)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val salted = SkewOps.saltedEquiJoin(big, small, "l_orderkey", salts = 8)
    val plain = big.join(small, "l_orderkey")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads a hot key across reducers") {
    // one artificial hot key: every big row has key 1
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "hot")).toDF("k", "tag")
    val out = SkewOps.saltedEquiJoin(big, small, "k", salts = 8)
    assert(out.count() === 1000L)
    // the pre-aggregation salt split has up to 8 distinct partitions for
    // the single key — observable via the salt expression itself
    val salts = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(salts > 1, "content-derived salt must split the hot key")
  }

  test("twoPhaseTopK matches the single-window top-k") {
    val ev = Tables.events(spark, sf)
    val ord = Seq($"value".desc, $"event_id".asc_nulls_last)
    val two = SkewOps.twoPhaseTopK(ev, Seq($"event_type"), ord, k = 3)
      .select($"event_type", $"rank", $"event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy(ord: _*)
    val one = ev.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"event_type", $"rank", $"event_id")
    assert(two.except(one).isEmpty && one.except(two).isEmpty)
  }
}
