package graft.table

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** File-level copy-on-write tables: merge equivalence with the
  * full-rewrite path, O(overlapping-files) write amplification, file
  * inheritance across versions, time travel, and vacuum's
  * file-granular liveness tracking. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private val clauses = Seq(
    WhenMatchedDelete(Some(col("source.op") === "DELETE")),
    WhenMatchedUpdate(Some(col("source.op") === "UPDATE")),
    WhenNotMatchedInsert(Some(col("source.op") =!= "DELETE")))

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("t").toString

  private def mk(path: String, bucketed: Boolean): VersionedTable =
    VersionedTable.create(spark, path, schema,
      Map(VersionedTable.PROP_CDF -> "true"),
      bucketBy = if (bucketed) Some(BucketSpec(Seq("id"), 8)) else None)

  private def batch(rows: (Long, String, String)*) =
    rows.toDF("id", "v", "op")

  test("bucketed merge produces identical snapshots and CDF to the full-rewrite path") {
    val (pb, pu) = (tmp("cow-b"), tmp("cow-u"))
    val b = mk(pb, bucketed = true)
    val u = mk(pu, bucketed = false)
    val batches = Seq(
      batch((1L, "a", "INSERT"), (2L, "b", "INSERT"), (3L, "c", "INSERT")),
      batch((1L, "a2", "UPDATE"), (3L, "x", "DELETE"), (4L, "d", "INSERT")),
      batch((2L, "b2", "UPDATE"), (5L, "e", "INSERT")))
    batches.foreach { s =>
      Merge.run(b, s, Seq("id"), clauses)
      Merge.run(u, s, Seq("id"), clauses)
    }
    def snap(t: VersionedTable) =
      t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq
    def cdf(t: VersionedTable) =
      t.changes(1).select("id", "v", "_change_type", "_commit_version")
        .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(snap(b) === snap(u))
    assert(snap(b) === Seq((1L, "a2"), (2L, "b2"), (4L, "d"), (5L, "e")))
    assert(cdf(b) === cdf(u))
    // time travel agrees at every version
    (0L to 3L).foreach { v =>
      assert(b.snapshotAt(v).as[(Long, String)].collect().sortBy(_._1).toSeq ===
        u.snapshotAt(v).as[(Long, String)].collect().sortBy(_._1).toSeq,
        s"version $v diverged")
    }
  }

  test("copy-on-write rewrites only overlapping files; the rest are inherited") {
    val path = tmp("cow-inherit")
    val t = mk(path, bucketed = true)
    // v1: spread keys across many bucket files
    Merge.run(t, batch((1L to 40L).map(i => (i, s"v$i", "INSERT")): _*),
      Seq("id"), clauses)
    val m1 = t.latestManifest
    assert(m1.dataFiles.size >= 7, "40 keys should populate most of 8 buckets")
    assert(m1.dataFiles.forall(f =>
      f.bucket.isDefined && f.minHash.isDefined && f.maxHash.isDefined),
      "CoW files must carry bucket + key-hash-range stats")

    // v2: touch exactly one key -> exactly one file rewritten (the one
    // whose hash range covers the key), everything else inherited
    Merge.run(t, batch((1L, "updated", "UPDATE")), Seq("id"), clauses)
    val m2 = t.latestManifest
    assert(m2.removedFiles.size === 1,
      s"one-key merge must retire exactly one file, got ${m2.removedFiles}")
    assert(m2.addedFiles.size === 1,
      s"one-key merge must write exactly one file, got ${m2.addedFiles}")
    val inherited = m1.dataFiles.map(_.path).toSet -- m2.removedFiles.toSet
    assert(inherited.subsetOf(m2.dataFiles.map(_.path).toSet),
      "untouched files must be inherited by reference")

    // and the snapshot still has all 40 rows with the update applied
    assert(t.snapshot().count() === 40L)
    assert(t.snapshot().filter($"id" === 1L).select("v").as[String].head()
      === "updated")
  }

  test("vacuum keeps data files still referenced by retained manifests") {
    val path = tmp("cow-vacuum")
    val t = mk(path, bucketed = true)
    Merge.run(t, batch((1L to 30L).map(i => (i, s"v$i", "INSERT")): _*),
      Seq("id"), clauses) // v1 writes all populated bucket files
    Merge.run(t, batch((1L, "u1", "UPDATE")), Seq("id"), clauses) // v2
    Merge.run(t, batch((2L, "u2", "UPDATE")), Seq("id"), clauses) // v3
    val v1Files = t.manifest(1).dataFiles.map(_.path).toSet
    val liveV1 = t.manifest(3).dataFiles.map(_.path).toSet.intersect(v1Files)
    assert(liveV1.nonEmpty, "v3 must still inherit some of v1's files")

    val removed = t.vacuum(retainVersions = 2) // keep v2, v3
    assert(removed === Seq(0L, 1L))
    // v1's still-referenced files must SURVIVE the vacuum
    liveV1.foreach(p => assert(Files.exists(Paths.get(path).resolve(p)),
      s"live file $p was vacuumed"))
    assert(t.snapshot().count() === 30L)
    assert(t.snapshotAt(2).count() === 30L)
    intercept[Exception] { t.snapshotAt(1) } // manifest gone
  }

  test("compact rewrites all files so vacuum reclaims every superseded one") {
    val path = tmp("cow-compact")
    val t = mk(path, bucketed = true)
    Merge.run(t, batch((1L to 30L).map(i => (i, s"v$i", "INSERT")): _*),
      Seq("id"), clauses) // v1
    Merge.run(t, batch((1L, "u1", "UPDATE")), Seq("id"), clauses) // v2
    val before = t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq
    val preCompactFiles = t.latestManifest.dataFiles.map(_.path).toSet

    val cv = t.compact()
    assert(cv === Some(3L))
    val m3 = t.latestManifest
    assert(m3.dataFiles.map(_.path).toSet.intersect(preCompactFiles).isEmpty,
      "compaction must own every file it lists")
    // compaction preserves CoW stats so later merges still skip files
    assert(m3.dataFiles.forall(f => f.bucket.isDefined && f.minHash.isDefined))
    // no CDF rows from compaction
    assert(t.changes(3).count() === 0L)

    t.vacuum(retainVersions = 1)
    preCompactFiles.foreach(p =>
      assert(!Files.exists(Paths.get(path).resolve(p)),
        s"post-compaction vacuum must reclaim superseded file $p"))
    assert(t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq === before)
  }

  test("maxRecordsPerFile splits big buckets into files with disjoint hash ranges") {
    val path = tmp("cow-sized")
    val t = VersionedTable.create(spark, path, schema,
      Map(VersionedTable.PROP_CDF -> "true",
        VersionedTable.PROP_MAX_RECORDS -> "25"),
      bucketBy = Some(BucketSpec(Seq("id"), 4)))
    Merge.run(t, batch((1L to 400L).map(i => (i, s"v$i", "INSERT")): _*),
      Seq("id"), clauses)
    val m = t.latestManifest
    val perBucket = m.dataFiles.groupBy(_.bucket)
    assert(perBucket.forall(_._2.size >= 2),
      s"~100-row buckets at 25 rows/file must split: ${perBucket.view.mapValues(_.size).toMap}")
    assert(m.dataFiles.forall(_.rows.exists(_ <= 25L)))
    // sorted-by-hash writes => split files within a bucket cover
    // DISJOINT ranges, so a point merge touches one file per bucket
    perBucket.values.foreach { files =>
      val ranges = files.flatMap(f => for (a <- f.minHash; b <- f.maxHash) yield (a, b))
        .sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) => assert(hi < lo, "overlapping ranges in bucket")
        case _ =>
      }
    }
    val before = m.dataFiles.size
    Merge.run(t, batch((7L, "u", "UPDATE")), Seq("id"), clauses)
    val m2 = t.latestManifest
    assert(m2.removedFiles.size === 1,
      s"point merge must rewrite exactly one sub-bucket file of $before, " +
        s"got ${m2.removedFiles}")
    assert(t.snapshot().count() === 400L)
  }

  test("snapshotWhere prunes bucketed reads by key-hash range") {
    val t = mk(tmp("cow-prune"), bucketed = true)
    Merge.run(t, (1L to 400L).map(i => (i, s"v$i", "INSERT")).toDF("id", "v", "op"),
      Seq("id"), clauses)
    val allFiles = t.snapshot().inputFiles.toSet
    assert(allFiles.size >= 8, s"expected >=8 bucket files, got ${allFiles.size}")
    // single-key equality: only files whose (bucket, hash range) admit
    // the key's Murmur3 hash are opened — a point lookup on a bucketed
    // key reads one bucket, not the table
    val one = t.snapshotWhere($"id" === 37L)
    assert(one.as[(Long, String)].collect().toSeq === Seq((37L, "v37")))
    val oneFiles = one.inputFiles.toSet
    assert(oneFiles.subsetOf(allFiles) && oneFiles.size < allFiles.size / 2,
      s"expected a pruned read, opened ${oneFiles.size}/${allFiles.size}")
    // IN-list: same proof per listed value, union of admitted files
    val few = t.snapshotWhere($"id".isin(5L, 37L, 222L))
    assert(few.select("id").as[Long].collect().sorted.toSeq === Seq(5L, 37L, 222L))
    assert(few.inputFiles.toSet.subsetOf(allFiles) &&
      few.inputFiles.length < allFiles.size,
      s"IN-list read opened ${few.inputFiles.length}/${allFiles.size}")
    // mismatched literal type must stay conservative, never wrong
    assert(t.snapshotWhere($"id" === lit(37)).count() === 1L)
  }

  test("append is rejected on bucketed tables") {
    val t = mk(tmp("cow-append"), bucketed = true)
    intercept[IllegalArgumentException] {
      t.append(Seq((1L, "a")).toDF("id", "v"))
    }
  }
}
