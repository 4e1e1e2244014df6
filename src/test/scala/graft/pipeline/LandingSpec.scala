package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class LandingSpec extends SparkSpec {

  test("landing dir: land, list, clear (S9/S10)") {
    val dir = Files.createTempDirectory("landing").toString
    assert(Landing.list(dir).isEmpty)
    Landing.land("""[{"id": 1}]""", dir, "a.json")
    Landing.land("""[{"id": 2}, {"id": 3}]""", dir, "b.json")
    val listed = Landing.list(dir)
    assert(listed.map(_._1) === Seq("a.json", "b.json"))
    assert(listed.forall(_._2 > 0))
    Landing.clear(dir)
    assert(Landing.list(dir).isEmpty)
  }

  test("ConfSql interpolates ${key} placeholders from session conf (D8)") {
    spark.conf.set("db.silver_table", "silver_t")
    spark.conf.set("db.min_id", "5")
    assert(ConfSql.interpolate(spark,
      "select * from ${db.silver_table} where id > ${db.min_id}") ===
      "select * from silver_t where id > 5")
    // end-to-end through spark.sql
    import spark.implicits._
    Seq((1L, "x"), (9L, "y")).toDF("id", "v").createOrReplaceTempView("silver_t")
    val out = ConfSql.sql(spark,
      "select v from ${db.silver_table} where id > ${db.min_id}")
    assert(out.as[String].collect().toSeq === Seq("y"))
  }
}
