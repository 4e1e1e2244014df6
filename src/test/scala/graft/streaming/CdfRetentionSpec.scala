package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.CdcPipeline
import graft.table.VersionedTable

/** The CDF retention contract (VERDICT r2 #6): vacuum never deletes
  * change history a consumer still needs when given its low-watermark,
  * and a consumer whose checkpoint predates vacuumed history fails
  * loudly at start instead of silently producing wrong aggregates. */
class CdfRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): java.nio.file.Path =
    Paths.get(getClass.getResource(s"/cdc/$name").toURI)

  private def goldMap(df: DataFrame): Map[String, Long] =
    df.select("country", "sum_visitors").as[(String, Long)].collect().toMap

  /** An UPDATE batch touching every current silver row (num_visitors
    * bumped, hash recomputed) — produces a fresh CDF commit. */
  private def bumpAll(silver: VersionedTable, by: Long): DataFrame =
    silver.snapshot()
      .withColumn("num_visitors", col("num_visitors") + by)
      .withColumn("data_hash", CdcPipeline.dataHash(
        col("id"), col("country"), col("district"),
        col("visit_timestamp"), col("num_visitors")))
      .withColumn("cdc_operation", lit("UPDATE"))

  test("watermarked vacuum lets a lagging CDF consumer catch up; unwatermarked vacuum fails it loudly") {
    val base = Files.createTempDirectory("cdf-retention")
    val landing = Files.createDirectories(base.resolve("landing"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")

    Files.copy(fixture("seed.json"), landing.resolve("seed.json"),
      StandardCopyOption.REPLACE_EXISTING)
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)
    val consumed = gold.lastTxn(CdcStreams.cdfProgressKey("gold-merge"))
    assert(consumed === Some(silver.latestVersion),
      "gold must record the CDF version it merged")

    // new silver change commit the (stopped) gold stream hasn't seen
    CdcPipeline.mergeBatchIntoSilver(silver, bumpAll(silver, 1))
    val unconsumedV = silver.latestVersion

    // SAFE vacuum: bounded by the consumer's progress — unconsumed
    // change files survive, resume catches up, aggregates stay exact
    silver.vacuum(retainVersions = 1, cdfLowWatermark = consumed)
    assert(silver.cdfVacuumWatermark.exists(_ <= consumed.get))
    CdcStreams.startGoldAggregate(spark, silver, gold, s"$base/_cp/gold")
      .awaitTermination()
    assert(gold.lastTxn(CdcStreams.cdfProgressKey("gold-merge"))
      === Some(unconsumedV), "resume must drain the retained change files")
    assert(goldMap(gold.snapshot()) ===
      goldMap(CdcPipeline.recomputedGold(silver)),
      "incremental gold must equal a recompute after vacuum + catch-up")

    // another unconsumed change commit, then compaction pushes the
    // version past it and an UNWATERMARKED vacuum reclaims its files
    CdcPipeline.mergeBatchIntoSilver(silver, bumpAll(silver, 2))
    val lostV = silver.latestVersion
    silver.compact()
    silver.vacuum(retainVersions = 1)
    assert(silver.cdfVacuumWatermark.exists(_ >= lostV))

    // the lagging consumer now has an unrecoverable gap: loud failure,
    // not silently wrong sums (Delta errors identically here)
    val e = intercept[IllegalStateException] {
      CdcStreams.startGoldAggregate(spark, silver, gold, s"$base/_cp/gold")
    }
    assert(e.getMessage.contains("vacuumed"))
    VersionedTable.deleteRecursively(base)
  }

  test("CDF span compaction fails a stale tail consumer loudly; a caught-up one resumes") {
    val base = Files.createTempDirectory("cdf-compact-guard")
    val landing = Files.createDirectories(base.resolve("landing"))
    val silver = CdcPipeline.createSilver(spark, s"$base/silver")
    val gold = CdcPipeline.createGold(spark, s"$base/gold")
    Files.copy(fixture("seed.json"), landing.resolve("seed.json"),
      StandardCopyOption.REPLACE_EXISTING)
    CdcStreams.processAvailable(spark, landing.toString, base.toString, silver, gold)

    // advance silver to just below the version whose checkpoint commit
    // will fold the first span, and let gold catch up THERE — its
    // progress must predate no folded span
    val interval = 10
    while (silver.latestVersion < 2L * interval - 1)
      CdcPipeline.mergeBatchIntoSilver(silver, bumpAll(silver, 1))
    CdcStreams.startGoldAggregate(spark, silver, gold, s"$base/_cp/gold")
      .awaitTermination()
    // the next commit is the v20 checkpoint: its post-commit hook folds
    // span (1,10] into a range directory
    CdcPipeline.mergeBatchIntoSilver(silver, bumpAll(silver, 1))
    assert(silver.cdfCompactWatermark.exists(_ >= interval.toLong),
      "checkpoint commits must compact the cold CDF span")

    // a FRESH consumer (no progress) whose start predates the folded
    // span cannot tail it — loud failure with the batch-backfill remedy
    val freshGold = CdcPipeline.createGold(spark, s"$base/gold2")
    val e = intercept[IllegalStateException] {
      CdcStreams.startGoldAggregate(spark, silver, freshGold, s"$base/_cp/gold2")
    }
    assert(e.getMessage.contains("compacted"))
    // the batch CDF read serves the folded history in full
    assert(silver.changes(1).count() > 0)

    // the caught-up consumer is untouched by the re-layout: it resumes,
    // drains the tail, and the incremental gold equals a recompute
    CdcStreams.startGoldAggregate(spark, silver, gold, s"$base/_cp/gold")
      .awaitTermination()
    assert(goldMap(gold.snapshot()) ===
      goldMap(CdcPipeline.recomputedGold(silver)),
      "incremental gold must equal a recompute across CDF compaction")
    VersionedTable.deleteRecursively(base)
  }
}
