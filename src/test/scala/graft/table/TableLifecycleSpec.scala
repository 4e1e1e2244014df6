package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Row-level DML and snapshot lifecycle beyond MERGE: predicate
  * DELETE/UPDATE with touched-file scoping, RESTORE to a past version,
  * and SHALLOW CLONE — all metadata-cheap on the file-granular layer. */
class TableLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("t").toString

  private val upsert = Seq(WhenMatchedUpdate(), WhenNotMatchedInsert())

  test("deleteWhere removes matching rows, rewrites only touched files, emits delete CDF") {
    val t = VersionedTable.create(spark, tmp("del"), schema,
      Map(VersionedTable.PROP_CDF -> "true"),
      bucketBy = Some(BucketSpec(Seq("id"), 8)))
    Merge.run(t, (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      Seq("id"), upsert) // v1, spread over ~8 files
    val before = t.latestManifest.dataFiles.size

    assert(t.deleteWhere($"id" <= 3L) === Some(2L))
    assert(t.snapshot().count() === 37L)
    assert(t.snapshot().filter($"id" <= 3L).count() === 0L)
    val m = t.latestManifest
    assert(m.removedFiles.nonEmpty && m.removedFiles.size < before,
      s"delete must rewrite only touched files (${m.removedFiles.size}/$before)")
    val ch = t.changes(2)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq
      === Seq("delete"))
    assert(ch.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))
    // no matches -> no commit
    assert(t.deleteWhere($"id" === 999L) === None)
    // NULL predicate keeps the row (SQL semantics)
    assert(t.deleteWhere(when($"id" === 5L, lit(null).cast("boolean"))) === None)
    assert(t.snapshot().filter($"id" === 5L).count() === 1L)
  }

  test("updateWhere rewrites matching rows in place with pre/postimage CDF") {
    val t = VersionedTable.create(spark, tmp("upd"), schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))

    assert(t.updateWhere($"id" % 2 === 0, Map("v" -> lit("even"))) === Some(2L))
    val snap = t.snapshot().as[(Long, String)].collect().toMap
    (1L to 10L).foreach(i =>
      assert(snap(i) === (if (i % 2 == 0) "even" else s"v$i")))
    val ch = t.changes(2).select("id", "v", "_change_type")
      .as[(Long, String, String)].collect()
    assert(ch.count(_._3 == "update_preimage") === 5)
    assert(ch.count(_._3 == "update_postimage") === 5)
    assert(ch.filter(_._3 == "update_postimage").forall(_._2 == "even"))
    intercept[IllegalArgumentException] {
      t.updateWhere($"id" === 1L, Map("nope" -> lit(1)))
    }
  }

  test("restore rolls back to a past version's exact file listing") {
    val t = VersionedTable.create(spark, tmp("restore"), schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // v1
    t.append(Seq((3L, "c")).toDF("id", "v"))            // v2
    t.deleteWhere($"id" === 1L)                          // v3
    assert(t.snapshot().count() === 2L)

    assert(t.restore(1L) === Some(4L))
    assert(t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq
      === Seq((1L, "a"), (2L, "b")))
    assert(t.latestManifest.dataFiles.map(_.path)
      === t.manifest(1).dataFiles.map(_.path),
      "restore must reference v1's files, not copies")
    // restoring to the current listing is a no-op
    assert(t.restore(4L) === None)
    // restore past vacuumed history fails loudly (manifest and/or files gone)
    t.append(Seq((9L, "z")).toDF("id", "v")) // v5
    t.compact()                               // v6 rewrites all
    t.vacuum(retainVersions = 1)
    intercept[Exception] { t.restore(4L) }
  }

  test("compactSmallFiles bin-packs only undersized files, O(small files)") {
    val t = VersionedTable.create(spark, tmp("binpack"), schema)
    t.append((1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val bigFile = t.latestManifest.addedFiles.head
    (1 to 8).foreach(i => t.append(Seq((10000L + i, "s")).toDF("id", "v")))
    assert(t.latestManifest.dataFiles.size >= 9)

    val v = t.compactSmallFiles(targetRows = 100)
    assert(v.isDefined)
    val m = t.latestManifest
    // every file in the manifest carries a row count (footer-backed)
    assert(m.dataFiles.forall(_.rows.isDefined))
    // the big file was inherited untouched; the 8 one-row files merged
    assert(m.dataFiles.map(_.path).contains(bigFile),
      "adequately-sized files must not be rewritten")
    assert(!m.removedFiles.contains(bigFile))
    assert(m.addedFiles.size === 1, s"8 tiny files should pack into 1, got ${m.addedFiles}")
    assert(t.snapshot().count() === 1008L)
    // no churn -> no-op
    assert(t.compactSmallFiles(targetRows = 100) === None)
  }

  test("shallow clone reads the source's files, evolves independently, vacuums safely") {
    val srcPath = tmp("clone-src")
    val src = VersionedTable.create(spark, srcPath, schema)
    src.append((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))

    val clone = VersionedTable.shallowClone(src, tmp("clone-dst"))
    assert(clone.snapshot().count() === 20L)
    assert(clone.schema === src.schema)

    // clone-side writes never touch the source
    clone.append(Seq((100L, "c")).toDF("id", "v"))
    clone.deleteWhere($"id" <= 5L)
    assert(clone.snapshot().count() === 16L)
    assert(src.snapshot().count() === 20L, "source must be unaffected")

    // clone vacuum must not delete source-owned files
    clone.compact()
    clone.vacuum(retainVersions = 1)
    assert(src.snapshot().count() === 20L,
      "clone vacuum deleted files it does not own")
    assert(clone.snapshot().count() === 16L)
  }

  test("CHECK constraints gate the rows a MERGE introduces") {
    val t = VersionedTable.create(spark, tmp("ck-merge"), schema,
      bucketBy = Some(BucketSpec(Seq("id"), 4)))
    Merge.run(t, Seq((1L, "a")).toDF("id", "v"), Seq("id"), upsert)
    t.setProperties(Map(
      VersionedTable.PROP_CONSTRAINT_PREFIX + "v_nonempty" -> "length(v) > 0"))
    val before = t.latestVersion
    val e = intercept[Exception] {
      Merge.run(t, Seq((2L, "")).toDF("id", "v"), Seq("id"), upsert)
    }
    assert(e.getMessage.contains("v_nonempty"), e.getMessage)
    assert(t.latestVersion === before, "violating merge must not commit")
    // a violating UPDATE post-image through merge is caught too
    intercept[Exception] {
      Merge.run(t, Seq((1L, "")).toDF("id", "v"), Seq("id"), upsert)
    }
    Merge.run(t, Seq((2L, "ok")).toDF("id", "v"), Seq("id"), upsert)
    assert(t.snapshot().count() === 2L)
  }

  test("overwriteWhere atomically replaces exactly the matching slice with CDF") {
    val t = VersionedTable.create(spark, tmp("replace"), schema,
      Map(VersionedTable.PROP_CDF -> "true"))
    // two appends -> two files; ids 1-20 in file A, 21-40 in file B
    t.append((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))  // v1
    t.append((21L to 40L).map(i => (i, s"v$i")).toDF("id", "v")) // v2
    val nFiles = t.latestManifest.dataFiles.size

    // replace the id <= 10 slice with 3 fresh rows — one atomic commit
    val v = t.overwriteWhere($"id" <= 10L,
      Seq((1L, "new1"), (2L, "new2"), (10L, "new10")).toDF("id", "v"))
    assert(v === Some(3L))
    val snap = t.snapshot().as[(Long, String)].collect().toMap
    assert(snap.size === 33) // 40 - 10 replaced + 3 new
    assert(snap(1L) === "new1" && snap(10L) === "new10" && snap(11L) === "v11")
    // only the touched file was rewritten; file B inherited
    val m = t.latestManifest
    assert(m.removedFiles.size < nFiles, "untouched files must be inherited")
    // CDF: 10 deletes + 3 inserts, one commit
    val ch = t.changes(3).groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(ch === Map("delete" -> 10L, "insert" -> 3L))

    // constraint: incoming rows outside the predicate fail loudly
    intercept[IllegalArgumentException](
      t.overwriteWhere($"id" <= 5L, Seq((99L, "x")).toDF("id", "v")))
    // truncate-and-load: lit(true) replaces everything
    t.overwriteWhere(lit(true), Seq((7L, "only")).toDF("id", "v"))
    assert(t.snapshot().as[(Long, String)].collect().toSeq === Seq((7L, "only")))
  }
}
