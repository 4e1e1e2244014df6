package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class Md5MinSpec extends SparkSpec {
  import spark.implicits._

  test("md5_min equals the HOF array_min(transform(md5)) form exactly") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf)
      .withColumn("grams", expr(
        "transform(sequence(1, length(text)-4), i -> substring(text, i, 5))"))
    val checked = docs.select(
      expr("md5_min(grams, '7|')").as("fast"),
      expr("array_min(transform(grams, s -> md5(concat('7|', s))))").as("slow"))
    assert(checked.count() > 0)
    assert(checked.filter($"fast" =!= $"slow").count() === 0L)
  }

  test("md5_min edge cases: empty array and null elements") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT md5_min(cast(array() AS array<string>), '') AS empty,
        |       md5_min(cast(null AS array<string>), '') AS nullarr,
        |       md5_min(array('a', cast(null AS string), 'b'), '') AS withnull,
        |       md5_min(array('a', 'b'), '') AS plain""".stripMargin).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
    assert(out.getString(2) === out.getString(3), "null elements are skipped")
  }
}
