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
    val salts = big.withColumn("__salt", SkewOps.rowSalt(8))
      .select("__salt").distinct().count()
    assert(salts > 1, "row salt must split the hot key")
  }

  test("salt spreads BYTE-IDENTICAL hot rows (content hash cannot)") {
    // the real-skew shape from VERDICT r3 finding 5: a default value
    // floods one key with identical payloads. A content-derived salt
    // maps them all to ONE bucket; the position-derived salt must not.
    val big = spark.range(1000).select(lit(1L).as("k"), lit(0).as("v"))
    val contentSalts = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(contentSalts === 1L, "precondition: content salt collapses")
    val positionSalts = big.withColumn("__salt", SkewOps.rowSalt(8))
      .select("__salt").distinct().count()
    assert(positionSalts >= 4L,
      s"position salt must spread identical rows across >= salts/2 buckets, got $positionSalts")
    // and the join is still correct on identical rows
    val small = Seq((1L, "hot")).toDF("k", "tag")
    assert(SkewOps.saltedEquiJoin(big, small, "k", salts = 8).count() === 1000L)
  }

  test("hot-key-targeted salting equals the plain join and replicates only hot rows") {
    val big = Tables.lineitem(spark, sf).select(
      when($"l_orderkey" % 4 =!= 0, 1L).otherwise($"l_orderkey").as("k"),
      $"l_quantity")
    val small = Tables.orders(spark, sf).select($"o_orderkey".as("k"), $"o_orderstatus")
    val salted = SkewOps.saltedEquiJoin(big, small, "k", salts = 8,
      hotKeys = Some(Seq(1L)))
    val plain = big.join(small, "k")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the small side grows by (salts-1) ROWS (one hot key), not salts×
    val replicated = small.withColumn("__salt", explode(
      when($"k".isin(1L), sequence(lit(0), lit(7)))
        .otherwise(sequence(lit(0), lit(0)))))
    assert(replicated.count() === small.count() + 7)
  }

  test("AQE skew-split fires on a deliberately hot-keyed shuffle join") {
    // Thresholds scaled down so a ~6 MB hot partition behaves like a
    // production-size one under the 256 MB default — same trigger
    // condition (size > max(threshold, factor × median)), smaller units.
    val tuned = Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "128KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(400000).select(
        when($"id" % 10 < 9, 1L).otherwise($"id").as("k"), $"id".as("v"))
      val small = spark.range(20000).select($"id".as("k"),
        concat(lit("tag"), $"id").as("tag"))
      val joined = big.join(small, "k")
      // drive THIS queryExecution (count() would plan a separate tree
      // whose adaptive plan never finalizes on the inspected df)
      val qe = joined.queryExecution
      // 360000 hot-key matches + ids ≡ 9 (mod 10) below 20000 = 2000
      assert(qe.executedPlan.execute().count() === 362000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
