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

  test("maxFilesPerTrigger=1 paces ingestion one file per micro-batch (D6)") {
    val base = Files.createTempDirectory("cdc-pacing")
    val landing = Files.createDirectories(base.resolve("landing"))
    Files.copy(fixture("seed.json"), landing.resolve("a.json"))
    Files.copy(fixture("edge.json"), landing.resolve("b.json"))

    val q = CdcStreams.startBronzeIngest(spark, landing.toString,
      s"$base/bronze", s"$base/_cp/bronze", maxFilesPerTrigger = 1)
    q.awaitTermination()
    val progress = q.recentProgress
    // two files -> (at least) two micro-batches with rows, none mixing both files
    val batchRows = progress.map(_.numInputRows).filter(_ > 0)
    assert(batchRows.length === 2, s"expected 2 paced batches, got ${batchRows.toSeq}")
    assert(batchRows.toSet === Set(20L, 4L))
    VersionedTable.deleteRecursively(base)
  }
}
