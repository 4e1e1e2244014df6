package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.pipeline.CdcPipeline
import graft.table.VersionedTable

/** The reference's replay protocol run through the STREAMING path
  * (SURVEY §5 + VERDICT r1 next-steps #7): files landing one at a time,
  * three chained streams, checkpointed incremental pickup, and
  * batch-redelivery idempotence.
  */
class CdcStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): java.nio.file.Path =
    Paths.get(getClass.getResource(s"/cdc/$name").toURI)

  private def goldMap(df: DataFrame): Map[String, Long] =
    df.select("country", "sum_visitors").as[(String, Long)].collect().toMap

  test("streaming replay: landed files flow bronze -> silver -> gold incrementally") {
    val base = Files.createTempDirectory("cdc-stream")
    val landing = Files.createDirectories(base.resolve("landing"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    // ---- land the seed file; drain the 3-stage pipeline (S9: the test
    // harness file-drop mirrors the reference's S3 upload, helper :6-12)
    Files.copy(fixture("seed.json"), landing.resolve("seed.json"),
      StandardCopyOption.REPLACE_EXISTING)
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)

    assert(spark.read.schema(CdcPipeline.bronzeSchema)
      .parquet(s"$base/bronze").count() === 20L)
    assert(silver.snapshot().count() === 18L)
    assert(goldMap(gold.snapshot()) === Map(
      "England" -> 4170L, "Wales" -> 3903L,
      "Northern Ireland" -> 3351L, "Scotland" -> 1934L))

    // file provenance (F2) flows through the streaming read
    val files = spark.read.schema(CdcPipeline.bronzeSchema)
      .parquet(s"$base/bronze").select("file_name").distinct().as[String].collect()
    assert(files.length === 1 && files.head.contains("seed.json"))

    // ---- land the edge file; re-drain — checkpoints make this pick up
    // ONLY the new file
    Files.copy(fixture("edge.json"), landing.resolve("edge.json"),
      StandardCopyOption.REPLACE_EXISTING)
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)

    assert(spark.read.schema(CdcPipeline.bronzeSchema)
      .parquet(s"$base/bronze").count() === 24L)
    assert(silver.snapshot().count() === 19L)
    assert(goldMap(gold.snapshot()) === Map(
      "Australia" -> 10000L, "England" -> 14170L, "Wales" -> 3903L,
      "Northern Ireland" -> 3351L, "Scotland" -> 1934L))

    // ---- a third drain with nothing new must change nothing
    val silverV = silver.latestVersion
    val goldV = gold.latestVersion
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)
    assert(silver.latestVersion === silverV, "no new input -> no new silver commit")
    assert(gold.latestVersion === goldV)

    VersionedTable.deleteRecursively(base)
  }

  test("kill-and-rerun: a redelivered gold micro-batch does not double-apply the additive merge") {
    val base = Files.createTempDirectory("cdc-retry")
    val landing = Files.createDirectories(base.resolve("landing"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    Files.copy(fixture("seed.json"), landing.resolve("seed.json"))
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)
    val before = goldMap(gold.snapshot())
    val goldV = gold.latestVersion

    // Simulate foreachBatch redelivery after a crash between the merge
    // commit and the streaming checkpoint write: the SAME micro-batch
    // (same batch id, same change rows) is applied again.
    val redelivered = silver.changes(1)
    CdcPipeline.mergeDeltasIntoGold(gold,
      CdcPipeline.goldDeltas(redelivered), Some("gold-merge" -> 0L))

    assert(gold.latestVersion === goldV, "replayed batch must not commit")
    assert(goldMap(gold.snapshot()) === before,
      "additive merge must not double-apply on redelivery")

    // and a stream restart over the same checkpoint reprocesses nothing
    CdcStreams.startGoldAggregate(spark, silver, gold, s"$base/_cp/gold")
      .awaitTermination()
    assert(gold.latestVersion === goldV)
    VersionedTable.deleteRecursively(base)
  }

  test("three CONCURRENT live streams chain bronze -> silver -> gold like the reference") {
    // the reference runs all three as long-lived streams chained through
    // storage (demo-notebook.py §3.1); here they run simultaneously with
    // processing-time triggers while files land underneath them
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("cdc-live")
    val landing = Files.createDirectories(base.resolve("landing"))
    val bronzeDir = Files.createDirectories(base.resolve("bronze")).toString
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")
    val trigger = Trigger.ProcessingTime("200 milliseconds")

    val qB = CdcStreams.startBronzeIngest(spark, landing.toString, bronzeDir,
      s"$base/_cp/bronze", maxFilesPerTrigger = 1, trigger = trigger)
    val qS = CdcStreams.startSilverMerge(spark, bronzeDir, silver,
      s"$base/_cp/silver", trigger = trigger)
    val qG = CdcStreams.startGoldAggregate(spark, silver, gold,
      s"$base/_cp/gold", trigger = trigger)

    def awaitGold(expected: Map[String, Long], what: String): Unit = {
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      var last: Map[String, Long] = Map.empty
      while (System.nanoTime() < deadline && last != expected) {
        Thread.sleep(500)
        last = goldMap(gold.snapshot())
      }
      assert(last === expected, s"$what not reached before timeout")
    }

    try {
      graft.pipeline.Landing.landFile(fixture("seed.json"),
        landing.toString, "seed.json")
      awaitGold(Map("England" -> 4170L, "Wales" -> 3903L,
        "Northern Ireland" -> 3351L, "Scotland" -> 1934L), "batch-1 gold")

      graft.pipeline.Landing.landFile(fixture("edge.json"),
        landing.toString, "edge.json")
      awaitGold(Map("Australia" -> 10000L, "England" -> 14170L,
        "Wales" -> 3903L, "Northern Ireland" -> 3351L, "Scotland" -> 1934L),
        "batch-2 gold")
    } finally {
      qB.stop(); qS.stop(); qG.stop()
    }
    VersionedTable.deleteRecursively(base)
  }

  test("mid-stream schema drift: a new column evolves Bronze on restart, replay outcomes unchanged") {
    val base = Files.createTempDirectory("cdc-drift")
    val landing = Files.createDirectories(base.resolve("landing"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    Files.copy(fixture("seed.json"), landing.resolve("seed.json"))
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)
    val schemaLog = Paths.get(s"$base/_cp/bronze_schemas")
    assert(SchemaTracker.latest(schemaLog).map(_._1) === Some(0L))

    // a file with an EXTRA column lands; the next drain's restart
    // re-infers, evolves the persisted schema, and ingests the column
    // instead of silently dropping it
    Files.copy(fixture("drift.json"), landing.resolve("drift.json"))
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)

    val (v, evolved) = SchemaTracker.latest(schemaLog).get
    assert(v === 1L, "drift must append a schema log version")
    assert(evolved.fieldNames.contains("note"))
    // hinted columns keep their hinted types through evolution
    assert(evolved("visit_timestamp").dataType ===
      org.apache.spark.sql.types.TimestampType)

    // Bronze carries the new column: populated on drifted rows, null on
    // pre-drift rows (old files simply lack it)
    val bronze = spark.read.option("mergeSchema", "true").parquet(s"$base/bronze")
    assert(bronze.count() === 22L)
    assert(bronze.filter($"note" === "drifted").count() === 2L)
    assert(bronze.filter($"note".isNull).count() === 20L)

    // replay outcomes unchanged: Silver's projection and Gold's
    // aggregate are exactly the no-drift results plus the new rows
    assert(silver.snapshot().count() === 20L)
    assert(goldMap(gold.snapshot()) === Map(
      "France" -> 150L, "England" -> 4170L, "Wales" -> 3903L,
      "Northern Ireland" -> 3351L, "Scotland" -> 1934L))

    VersionedTable.deleteRecursively(base)
  }

  test("maxFilesPerTrigger=1 paces ingestion one file per micro-batch (D6)") {
    val base = Files.createTempDirectory("cdc-pacing")
    val landing = Files.createDirectories(base.resolve("landing"))
    Files.copy(fixture("seed.json"), landing.resolve("a.json"))
    Files.copy(fixture("edge.json"), landing.resolve("b.json"))

    val q = CdcStreams.startBronzeIngest(spark, landing.toString,
      s"$base/bronze", s"$base/_cp/bronze", maxFilesPerTrigger = 1)
    q.awaitTermination() // AvailableNow: drains the backlog, then stops
    val progress = q.recentProgress
    // two files -> (at least) two micro-batches with rows, none mixing both files
    val batchRows = progress.map(_.numInputRows).filter(_ > 0)
    assert(batchRows.length === 2, s"expected 2 paced batches, got ${batchRows.toSeq}")
    assert(batchRows.toSet === Set(20L, 4L))

    // the backfill is RESTARTABLE: more files land, a second
    // AvailableNow run drains only them (checkpointed file list) and
    // self-terminates again — the operational catch-up-then-stop mode
    Files.copy(fixture("seed.json"), landing.resolve("c.json"))
    val q2 = CdcStreams.startBronzeIngest(spark, landing.toString,
      s"$base/bronze", s"$base/_cp/bronze", maxFilesPerTrigger = 1)
    q2.awaitTermination()
    val rows2 = q2.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(rows2.toSeq === Seq(20L),
      s"restart must drain ONLY the new file, got ${rows2.toSeq}")
    // every drained row lands exactly once
    assert(spark.read.schema(graft.pipeline.CdcPipeline.bronzeSchema)
      .parquet(s"$base/bronze").count() === 44L)
    VersionedTable.deleteRecursively(base)
  }
}
