package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table._

class TableChangesTvfSpec extends SparkSpec {
  import spark.implicits._

  test("table_changes TVF matches the reference's SQL surface (S7)") {
    GraftFunctions.register(spark)
    val base = Files.createTempDirectory("tvf")
    val path = s"$base/t"
    val t = VersionedTable.create(spark, path,
      StructType(Seq(StructField("id", LongType), StructField("v", StringType))),
      Map(VersionedTable.PROP_CDF -> "true"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    Merge.run(t, Seq((1L, "a2")).toDF("id", "v"), Seq("id"),
      Seq(WhenMatchedUpdate(), WhenNotMatchedInsert()))

    // the reference's query shape incl. O1 ordering (demo-notebook.py:363-372)
    val rows = spark.sql(
      s"""SELECT id, v, _change_type, _commit_version
         |FROM table_changes('$path', 1)
         |ORDER BY _commit_version DESC, _commit_timestamp DESC, _change_type ASC, id ASC
         |""".stripMargin)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, "a2", "update_postimage", 2L),
      (1L, "a", "update_preimage", 2L),
      (1L, "a", "insert", 1L),
      (2L, "b", "insert", 1L)))

    // bounded range: only version 1
    assert(spark.sql(s"SELECT count(*) FROM table_changes('$path', 1, 1)")
      .head().getLong(0) === 2L)
    VersionedTable.deleteRecursively(base)
  }
}
