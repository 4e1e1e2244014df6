package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Manifest checkpointing (VERDICT r3 missing #3): between-checkpoint
  * commits publish O(delta) JSON, readers resolve identically from
  * either form, vacuum materializes the oldest retained manifest before
  * trimming its parents, and 1000 commits keep latency flat. */
class ManifestCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("t").toString

  private def rawJson(path: String, v: Long): String =
    Files.readString(Paths.get(path).resolve(
      f"${VersionedTable.COMMITS_DIR}/$v%020d.json"))

  test("non-checkpoint commits are O(delta) on disk; a fresh reader resolves the full listing") {
    val path = tmp("ckpt-form")
    val t = VersionedTable.create(spark, path, schema)
    (1 to 25).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))

    // checkpoint cadence: v10/v20 full, neighbors delta
    assert(!rawJson(path, 10L).contains("deltaOf"))
    assert(!rawJson(path, 20L).contains("deltaOf"))
    (Seq(1L, 9L, 11L, 19L, 21L, 25L)).foreach(v =>
      assert(rawJson(path, v).contains("\"deltaOf\""), s"v$v should be a delta"))
    // the delta really is O(commit): one added entry, not the listing
    assert(rawJson(path, 25L).split("\\.parquet").length <
      rawJson(path, 20L).split("\\.parquet").length)

    // a FRESH handle (empty cache) resolves every version identically
    val fresh = VersionedTable.load(spark, path)
    (0L to 25L).foreach { v =>
      assert(fresh.manifest(v).deltaOf.isEmpty)
      assert(fresh.manifest(v).dataFiles.map(_.path) ===
        t.manifest(v).dataFiles.map(_.path), s"listing mismatch at v$v")
    }
    assert(fresh.snapshot().count() === 25L)
    assert(fresh.snapshotAt(13L).count() === 13L)
    VersionedTable.deleteRecursively(Paths.get(path).getParent)
  }

  test("delete/update rewrites flow through delta manifests correctly") {
    val path = tmp("ckpt-dml")
    val t = VersionedTable.create(spark, path, schema)
    (1 to 12).foreach(i =>
      t.append((1L to 10L).map(j => (i * 100L + j, s"b$i")).toDF("id", "v")))
    t.deleteWhere(col("id") % 100 === 3)       // v13: removes inside deltas
    t.updateWhere(col("id") % 100 === 4, Map("v" -> lit("upd"))) // v14
    val fresh = VersionedTable.load(spark, path)
    assert(fresh.snapshot().count() === 108L)  // 120 - 12 deleted
    assert(fresh.snapshot().filter($"v" === "upd").count() === 12L)
    assert(fresh.snapshotAt(12L).count() === 120L)
    VersionedTable.deleteRecursively(Paths.get(path).getParent)
  }

  test("vacuum materializes the oldest retained delta manifest before trimming its chain") {
    val path = tmp("ckpt-vacuum")
    val t = VersionedTable.create(spark, path, schema)
    (1 to 17).foreach(i =>
      t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    // cutoff v15 is a delta (not a multiple of 10) whose parents v0..v14
    // are all deleted — without materialization resolution would break
    assert(rawJson(path, 15L).contains("\"deltaOf\""))
    t.vacuum(retainVersions = 3)
    assert(t.versions === Seq(15L, 16L, 17L))
    assert(!rawJson(path, 15L).contains("deltaOf"))
    val fresh = VersionedTable.load(spark, path)
    assert(fresh.snapshotAt(15L).count() === 15L)
    assert(fresh.snapshot().count() === 17L)
    // and the table keeps working past the trim
    t.append(Seq((99L, "post")).toDF("id", "v"))
    assert(fresh.snapshot().count() === 18L)
    VersionedTable.deleteRecursively(Paths.get(path).getParent)
  }

  test("CDF compaction folds cold spans; change reads open O(checkpoints) entries, result unchanged") {
    import scala.jdk.CollectionConverters._
    import scala.util.Using
    val path = tmp("ckpt-cdf")
    val t = VersionedTable.create(spark, path, schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    (1 to 120).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))

    val changesDir = Paths.get(path).resolve(VersionedTable.CHANGES_DIR)
    def ls = Using.resource(Files.list(changesDir))(
      _.iterator().asScala.map(_.getFileName.toString).toSeq)
    // spans through v110 are folded (compaction lags one checkpoint);
    // only the hot tail v111..120 keeps per-commit files
    val vFiles = ls.filter(_.startsWith("v"))
    val ranges = ls.filter(n => n.startsWith("r") && !n.startsWith(".r"))
    assert(ranges.size === 11, s"expected 11 span dirs, got $ranges")
    assert(vFiles.size <= 12,
      s"tail should hold ~one file per uncompacted commit, got ${vFiles.size}")
    assert(t.cdfCompactWatermark === Some(110L))

    // the batch CDF read is unchanged by the re-layout
    val all = t.changes(1).select($"id", $"_commit_version")
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(all.length === 120)
    assert(all.map(_._2).toSeq === (1L to 120L))
    assert(all.map(_._1).toSeq === (1L to 120L))
    // windows inside a compacted span, straddling spans, and in the tail
    assert(t.changes(5, Some(8)).count() === 4)
    assert(t.changes(55).count() === 66)
    assert(t.changes(115).count() === 6)
    VersionedTable.deleteRecursively(Paths.get(path).getParent)
  }

  test("endurance: 1000 manifest commits keep commit latency flat") {
    // commits through the manifest layer directly (synthetic file
    // entries, no Spark write jobs) so the timing isolates exactly what
    // checkpointing bounds: manifest build + serialize + publish.
    val path = tmp("ckpt-endure")
    val t = VersionedTable.create(spark, path, schema)
    val timings = (1 to 1000).map { i =>
      val f = DataFile(s"data/synthetic-$i.parquet", rows = Some(1L))
      val t0 = System.nanoTime()
      t.commitFiles(Seq(f), Seq.empty, None, "append")
      (System.nanoTime() - t0) / 1e6 // ms
    }
    assert(t.latestVersion === 1000L)
    assert(t.latestManifest.dataFiles.length === 1001)
    // a fresh reader still resolves the full listing from the tail
    val fresh = VersionedTable.load(spark, path)
    assert(fresh.latestManifest.dataFiles.length === 1001)

    val first = timings.slice(100, 200) // skip JVM warmup for a fair base
    val last = timings.takeRight(100)
    // medians, not means: under the full parallel suite a handful of
    // GC/IO pauses land in either window and dominate a mean — the
    // median still exposes O(history) growth (a linear manifest replay
    // would be ~10x the base at v1000, far beyond any bound here)
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    val firstMed = med(first)
    val lastMed = med(last)
    info(f"commit latency: v101-200 median $firstMed%.2f ms, " +
      f"v901-1000 median $lastMed%.2f ms")
    assert(lastMed <= math.max(3 * firstMed, firstMed + 5.0),
      f"commit latency grew with history: $firstMed%.2f ms -> $lastMed%.2f ms")
    VersionedTable.deleteRecursively(Paths.get(path).getParent)
  }
}
