package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.{SparkEntry, SparkSpec}

/** k-anonymity ladder: released rows are k-anonymous against the
  * generalized-matching population; suppression fires exactly when the
  * coarsest level fails. */
class PrivacySpec extends SparkSpec {

  private val K = 5

  private lazy val docs = graft.Tables.documents(spark, sf)
    .selectExpr("doc_id", "lang", "source", "n_chars div 200 AS b")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private lazy val out = SparkEntry.queries("q_k_anonymize")(spark, sf)
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("every released row has >= k originals matching its generalized tuple") {
    for ((_, lg, sg, bg, _) <- out) {
      val matching = docs.count { case (_, l, s, b) =>
        l == lg && (sg == "*" || s == sg) && (bg == "*" || b.toString == bg)
      }
      assert(matching >= K, s"tuple ($lg,$sg,$bg) matches only $matching originals")
    }
  }

  test("each row is released at the finest level that reaches k") {
    val c0 = docs.groupBy(d => (d._2, d._3, d._4)).map { case (g, rs) => g -> rs.length }
    val c1 = docs.groupBy(d => (d._2, d._3)).map { case (g, rs) => g -> rs.length }
    val c2 = docs.groupBy(_._2).map { case (g, rs) => g -> rs.length }
    val byId = docs.map(d => d._1 -> d).toMap
    for ((id, _, _, _, level) <- out) {
      val (_, l, s, b) = byId(id)
      val expected =
        if (c0((l, s, b)) >= K) 0L
        else if (c1((l, s)) >= K) 1L
        else if (c2(l) >= K) 2L
        else -1L
      assert(level == expected, s"doc $id level $level, expected $expected")
    }
  }

  test("suppression: rows absent iff even the lang group is under k") {
    val released = out.map(_._1).toSet
    val c2 = docs.groupBy(_._2).map { case (g, rs) => g -> rs.length }
    for ((id, l, _, _) <- docs)
      assert(released.contains(id) == (c2(l) >= K),
        s"doc $id (lang $l, |lang|=${c2(l)}) release status wrong")
  }

  test("synthetic ladder exercises all levels including suppression") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("b", LongType)))
    // lang A: one detailed group of 5 (level 0), plus a scattered source
    //   that only reaches k at (lang, source) (level 1)
    // lang B: 5 rows scattered across sources/buckets (level 2)
    // lang C: 2 rows only -> suppressed
    val rows =
      (0L until 5L).map(i => Row(i, "A", "s1", 0L)) ++
      (5L until 10L).map(i => Row(i, "A", "s2", i)) ++
      (10L until 15L).map(i => Row(i, "B", s"s$i", i)) ++
      Seq(Row(15L, "C", "s1", 0L), Row(16L, "C", "s2", 1L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val got = Privacy.kAnonymize(df, K).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toMap
    for (i <- 0L until 5L)
      assert(got(i) == (("A", "s1", "0", 0L)), s"doc $i: ${got.get(i)}")
    for (i <- 5L until 10L)
      assert(got(i) == (("A", "s2", "*", 1L)), s"doc $i: ${got.get(i)}")
    for (i <- 10L until 15L)
      assert(got(i) == (("B", "*", "*", 2L)), s"doc $i: ${got.get(i)}")
    assert(!got.contains(15L) && !got.contains(16L), "lang C must be suppressed")
    assert(got.size == 15)
  }
}
