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

  // --------------------------- merge-on-read DELETE (deletion vectors)

  /** 40 rows in 4 ten-row files (ids 1-10 / 11-20 / 21-30 / 31-40),
    * CDF on, `delete.mode = mor`. */
  private def morTable(prefix: String) = {
    val t = VersionedTable.create(spark, tmp(prefix), schema,
      Map(VersionedTable.PROP_CDF -> "true",
        VersionedTable.PROP_DELETE_MODE -> "mor",
        VersionedTable.PROP_MAX_RECORDS -> "10"))
    t.append((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1)) // v1
    t
  }

  test("merge-on-read DELETE tombstones rows without rewriting any data file") {
    val t = morTable("mor")
    val pathsBefore = t.latestManifest.dataFiles.map(_.path).toSet

    assert(t.deleteWhere($"id" <= 3L) === Some(2L))
    val m = t.latestManifest
    assert(m.dataFiles.map(_.path).toSet === pathsBefore,
      "MoR delete must not add or remove data files")
    val dvd = m.dataFiles.filter(_.dvs.nonEmpty)
    assert(dvd.size === 1 && dvd.head.dvRows === Some(3L),
      s"ids 1-3 live in one file: $dvd")
    assert(dvd.head.liveRows === Some(7L))
    assert(t.snapshot().count() === 37L)
    assert(t.snapshot().filter($"id" <= 3L).count() === 0L)

    val ch = t.changes(2)
    assert(ch.select("_change_type").distinct().as[String].collect().toSeq
      === Seq("delete"))
    assert(ch.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 2L, 3L))

    // already-tombstoned rows are invisible to a re-delete: no commit
    assert(t.deleteWhere($"id" <= 3L) === None)
    // a second delete composes — the same file accumulates tombstones
    assert(t.deleteWhere($"id" === 5L) === Some(3L))
    assert(t.snapshot().count() === 36L)
    assert(t.latestManifest.dataFiles.map(_.path).toSet === pathsBefore)
    assert(t.latestManifest.dataFiles.exists(_.dvRows === Some(4L)))
    // NULL predicate keeps the row (SQL semantics)
    assert(t.deleteWhere(when($"id" === 7L, lit(null).cast("boolean"))) === None)
    assert(t.snapshot().filter($"id" === 7L).count() === 1L)
  }

  test("a multi-file MoR delete maps each deletion vector to its own data file") {
    val t = morTable("mor-split")
    // one matching row in each of the 4 files (ids 1, 11, 21, 31)
    assert(t.deleteWhere($"id" % 10L === 1L).nonEmpty)
    val entries = t.latestManifest.dataFiles
    assert(entries.count(_.dvs.nonEmpty) === 4)
    entries.filter(_.dvs.nonEmpty).foreach { f =>
      val name = f.path.split('/').last
      // reading THIS entry's DV refs must surface only tombstones aimed
      // at this file — attaching the whole commit's DV set to every
      // touched entry would make every read open every tombstone file
      val dvFiles = spark.read
        .parquet(f.dvs.map(d => t.root.resolve(d).toString): _*)
        .select("__file").distinct().as[String].collect().toSeq
      assert(dvFiles === Seq(name),
        s"entry $name references DVs for files $dvFiles")
      assert(f.dvRows === Some(1L))
    }
    // DV refs across entries are disjoint (no shared tombstone files)
    val allRefs = entries.flatMap(_.dvs)
    assert(allRefs.distinct.size === allRefs.size)
    assert(t.snapshot().count() === 36L)
  }

  test("MoR and CoW deletes are read-equivalent; later DML sees only live rows") {
    def content(t: VersionedTable) =
      t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq
    val cow = VersionedTable.create(spark, tmp("cow-eq"), schema,
      Map(VersionedTable.PROP_MAX_RECORDS -> "10"))
    cow.append((1L to 40L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val mor = morTable("mor-eq")

    Seq(cow, mor).foreach(_.deleteWhere($"id" % 3 === 0))
    assert(content(mor) === content(cow))
    // UPDATE rewrites touched files from LIVE rows — tombstoned rows of
    // those files must not resurrect
    Seq(cow, mor).foreach(_.updateWhere($"id" <= 20L, Map("v" -> lit("x"))))
    assert(content(mor) === content(cow))
    assert(mor.snapshot().filter($"id" % 3 === 0).count() === 0L)
    // replaceWhere over a DV'd slice likewise
    Seq(cow, mor).foreach(t => t.overwriteWhere($"id" > 30L,
      Seq((35L, "z")).toDF("id", "v")))
    assert(content(mor) === content(cow))
  }

  test("OPTIMIZE materializes deletion vectors; vacuum reclaims dead DV files") {
    val t = morTable("mor-opt")
    assert(t.deleteWhere($"id" % 2 === 0) === Some(2L))
    val dvDir = t.root.resolve(VersionedTable.DV_DIR)
    assert(Files.list(dvDir).count() > 0)
    def content = t.snapshot().as[(Long, String)].collect().sortBy(_._1).toSeq
    val before = content

    // every file is both small and DV'd -> full rewrite, tombstones gone
    assert(t.compactSmallFiles(1000L).isDefined)
    assert(t.latestManifest.dataFiles.forall(_.dvs.isEmpty),
      "OPTIMIZE must materialize deletion vectors away")
    assert(content === before)

    // with no retained manifest referencing them, vacuum reclaims DVs
    t.vacuum(1)
    assert(Files.list(dvDir).count() === 0, "dead DV files must be deleted")
    assert(content === before)
  }

  test("RESTORE to a tombstoned version subtracts; refuses when a DV is gone") {
    val t = morTable("mor-res")                       // v1: 40 rows
    assert(t.deleteWhere($"id" <= 10L) === Some(2L))  // v2: DV, 30 live
    t.append(Seq((100L, "x")).toDF("id", "v"))        // v3: 31 live
    t.restore(2)                                      // v4 = v2 incl. DV refs
    assert(t.snapshot().count() === 30L)
    assert(t.snapshot().filter($"id" <= 10L).count() === 0L)

    val dv = t.manifest(2).dataFiles.flatMap(_.dvs).head
    Files.delete(t.root.resolve(dv))
    val e = intercept[IllegalStateException](t.restore(3))
    assert(e.getMessage.contains("deletion vector"))
  }

  test("shallow clone of a MoR table subtracts source-owned tombstones") {
    val src = morTable("mor-src")
    assert(src.deleteWhere($"id" > 35L) === Some(2L))
    val clone = VersionedTable.shallowClone(src, tmp("mor-clone"))
    assert(clone.snapshot().count() === 35L)
    assert(clone.snapshot().filter($"id" > 35L).count() === 0L)
    // the clone's own MoR delete writes tombstones under ITS root only
    assert(clone.deleteWhere($"id" === 1L) === Some(1L))
    assert(clone.snapshot().count() === 34L)
    assert(src.snapshot().count() === 35L)
  }
}
