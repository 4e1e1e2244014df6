package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table._

/** The reference's executable spec, replayed end-to-end in batch mode
  * (SURVEY §5; /root/reference/notebooks/demo-notebook.py:449-538).
  *
  * Fixtures under src/test/resources/cdc reproduce the seed file
  * (data/db_cdc_log_demo_sample.json: 20 records, 18 ids) and the
  * 4-record edge batch (new insert / real update / intra-batch dup /
  * inter-batch dup, demo-notebook.py:453-456). Expected gold values are
  * the reference's stated outcomes (:520-526), derived in FIXTURES.md.
  */
class CdcReplaySpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): String =
    Paths.get(getClass.getResource(s"/cdc/$name").toURI).toString

  private def goldMap(df: DataFrame): Map[String, Long] =
    df.select("country", "sum_visitors").as[(String, Long)].collect().toMap

  private def assertInvariant(silver: VersionedTable, gold: VersionedTable): Unit = {
    val incremental = goldMap(gold.snapshot())
    val recomputed = goldMap(CdcPipeline.recomputedGold(silver))
    // absent-means-zero: the additive merge leaves a fully-retracted
    // country at 0 while a recompute omits the row entirely — the
    // reference's MERGE has no delete clause on gold either
    val countries = incremental.keySet ++ recomputed.keySet
    countries.foreach { c =>
      assert(incremental.getOrElse(c, 0L) === recomputed.getOrElse(c, 0L),
        s"incremental vs recomputed gold diverge for $c")
    }
  }

  test("replay: seed batch + edge batch reproduce the reference's stated outcomes") {
    val base = Files.createTempDirectory("cdc-replay")
    val bronze = VersionedTable.create(spark, s"$base/bronze",
      CdcPipeline.bronzeSchema, Map(VersionedTable.PROP_CDF -> "true"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    def processBatch(file: String, batchId: Long): Unit = {
      val raw = CdcPipeline.readCdcJson(spark, fixture(file))
      val enriched = CdcPipeline.withLineage(raw)
      bronze.append(enriched, txn = Some("bronze" -> batchId))
      val sv = CdcPipeline.mergeBatchIntoSilver(silver,
        bronze.changes(bronze.latestVersion).drop("_change_type", "_commit_version", "_commit_timestamp"),
        txn = Some("silver" -> batchId))
      val deltas = CdcPipeline.goldDeltas(silver.changes(sv.version.get, sv.version))
      CdcPipeline.mergeDeltasIntoGold(gold, deltas, txn = Some("gold" -> batchId))
    }

    // ---- batch 1: the 20-record seed file
    processBatch("seed.json", 1L)

    assert(bronze.snapshot().count() === 20L, "bronze keeps ALL records")
    assert(silver.snapshot().count() === 18L, "silver holds one row per id")
    val silver7 = silver.snapshot().filter($"id" === 7L)
      .select("num_visitors").as[Long].head()
    assert(silver7 === 934L, "intra-batch UPDATE wins for id 7")
    val silver298 = silver.snapshot().filter($"id" === 298L)
      .select("num_visitors").as[Long].head()
    assert(silver298 === 994L)

    // reference-stated gold after batch 1 (FIXTURES.md §5)
    assert(goldMap(gold.snapshot()) === Map(
      "England" -> 4170L, "Wales" -> 3903L,
      "Northern Ireland" -> 3351L, "Scotland" -> 1934L))
    assertInvariant(silver, gold)
    val goldV1 = gold.latestVersion

    // ---- batch 2: the 4-record edge file
    processBatch("edge.json", 2L)

    assert(bronze.snapshot().count() === 24L, "duplicates are KEPT in bronze")
    assert(silver.snapshot().count() === 19L)
    assert(silver.snapshot().filter($"id" === -1L)
      .select("num_visitors").as[Long].head() === 10000L,
      "intra-batch duplicate collapsed to a single insert")
    assert(silver.snapshot().filter($"id" === 7L)
      .select("num_visitors").as[Long].head() === 10934L)
    assert(silver.snapshot().filter($"id" === 298L)
      .select("num_visitors").as[Long].head() === 994L,
      "inter-batch duplicate suppressed by the data_hash guard")

    // reference-stated gold after batch 2 (demo-notebook.py:520-526)
    assert(goldMap(gold.snapshot()) === Map(
      "Australia" -> 10000L, "England" -> 14170L, "Wales" -> 3903L,
      "Northern Ireland" -> 3351L, "Scotland" -> 1934L))
    assertInvariant(silver, gold)

    // ---- the time-travel right-join delta validation (:527-538)
    val deltas = CdcPipeline.goldDeltaValidation(gold, goldV1)
      .select("country", "delta_visitors").as[(String, Long)].collect().toMap
    assert(deltas === Map(
      "Australia" -> 10000L, "England" -> 10000L, "Wales" -> 0L,
      "Northern Ireland" -> 0L, "Scotland" -> 0L))

    // ---- as-is vs as-was point lookups on id 298 (:298-315)
    assert(silver.snapshot().filter($"id" === 298L).count() === 1L)
    assert(bronze.snapshot().filter($"id" === 298L).count() === 3L,
      "bronze answers as-was: insert + update + replayed duplicate")

    VersionedTable.deleteRecursively(base)
  }

  test("silver merge re-applied with the same batch id is a no-op (exactly-once)") {
    val base = Files.createTempDirectory("cdc-idem")
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val raw = CdcPipeline.withLineage(
      CdcPipeline.readCdcJson(spark, fixture("seed.json")))

    val s1 = CdcPipeline.mergeBatchIntoSilver(silver, raw, Some("silver" -> 1L))
    assert(s1.version.isDefined)
    val v = silver.latestVersion
    val s2 = CdcPipeline.mergeBatchIntoSilver(silver, raw, Some("silver" -> 1L))
    assert(s2.version === None, "replayed batch id must be skipped")
    assert(silver.latestVersion === v)
    VersionedTable.deleteRecursively(base)
  }

  test("DELETE operation removes the key from silver and retracts from gold") {
    val base = Files.createTempDirectory("cdc-del")
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    def toBatch(rows: Seq[(Long, String, String, String, Long, String, String)]): DataFrame =
      CdcPipeline.withLineage(
        rows.toDF("id", "country", "district", "visit_timestamp",
            "num_visitors", "cdc_operation", "cdc_timestamp")
          .withColumn("visit_timestamp", $"visit_timestamp".cast("timestamp"))
          .withColumn("cdc_timestamp", $"cdc_timestamp".cast("timestamp"))
          .select(CdcPipeline.rawSchema.fieldNames.map(col): _*))

    val b1 = toBatch(Seq(
      (1L, "England", "D1", "2023-01-08 10:00:00", 100L, "INSERT", "2023-01-08 20:00:00"),
      (2L, "Wales", "D2", "2023-01-08 11:00:00", 50L, "INSERT", "2023-01-08 20:00:01")))
    val sv1 = CdcPipeline.mergeBatchIntoSilver(silver, b1)
    CdcPipeline.mergeDeltasIntoGold(gold,
      CdcPipeline.goldDeltas(silver.changes(sv1.version.get)))
    assert(goldMap(gold.snapshot()) === Map("England" -> 100L, "Wales" -> 50L))

    val b2 = toBatch(Seq(
      (1L, "England", "D1", "2023-01-08 10:00:00", 100L, "DELETE", "2023-01-08 21:00:00")))
    val sv2 = CdcPipeline.mergeBatchIntoSilver(silver, b2)
    CdcPipeline.mergeDeltasIntoGold(gold,
      CdcPipeline.goldDeltas(silver.changes(sv2.version.get, sv2.version)))

    assert(silver.snapshot().select("id").as[Long].collect().toSeq === Seq(2L))
    assert(goldMap(gold.snapshot()) === Map("England" -> 0L, "Wales" -> 50L))
    assertInvariant(silver, gold)
    VersionedTable.deleteRecursively(base)
  }
}
