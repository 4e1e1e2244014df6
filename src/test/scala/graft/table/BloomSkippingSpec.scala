package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Per-file bloom-filter skipping ([[BloomIndex]]): point lookups on a
  * high-cardinality UN-clustered column must prune files that range
  * stats provably cannot (a uniform hash column spans ~the full value
  * range in every file), with zero false negatives by construction. */
class BloomSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() = graft.Scratch.dir("graft-bloom").resolve("t").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("k", StringType),
    StructField("v", LongType)))

  /** 2000 rows in ~10 files; `k = md5(id)` is uniform, so every file's
    * [min,max] spans nearly the whole hex range — stats prune nothing,
    * blooms must do the work. */
  private def builtTable(dir: String): VersionedTable = {
    val t = VersionedTable.create(spark, dir, schema, properties = Map(
      VersionedTable.PROP_BLOOM_COLS -> "k",
      VersionedTable.PROP_MAX_RECORDS -> "200"))
    val rows = spark.range(2000)
      .select($"id", md5($"id".cast("string")).as("k"), ($"id" * 7).as("v"))
    t.append(rows)
    t
  }

  test("bloom lookup prunes files where range stats cannot") {
    val dir = newDir()
    val t = builtTable(dir)
    val files = t.latestManifest.dataFiles.filter(_.rows.exists(_ > 0))
    assert(files.size >= 8, s"need a multi-file table, got ${files.size}")
    assert(files.forall(_.bloomPath.isDefined), "every data file carries a bloom")

    // stats alone keep every file (uniform hex spans overlap)
    val hit = t.snapshotWhere($"k" === lit(md5hex("123")))
    assert(hit.count() === 1L)
    val opened = hit.inputFiles.length
    assert(opened < files.size / 2,
      s"bloom should prune most files: opened $opened of ${files.size}")
  }

  test("no false negatives: every present key is found") {
    val dir = newDir()
    val t = builtTable(dir)
    // 40 sampled present keys, each must return exactly its row
    (0 until 2000 by 50).foreach { id =>
      val got = t.snapshotWhere($"k" === lit(md5hex(id.toString)))
        .select($"id").as[Long].collect()
      assert(got.toSeq === Seq(id.toLong), s"lost id $id")
    }
  }

  test("absent keys usually open zero files and always return empty") {
    val dir = newDir()
    val t = builtTable(dir)
    val results = (10000 until 10040).map { id =>
      val df = t.snapshotWhere($"k" === lit(md5hex(id.toString)))
      (df.count(), df.inputFiles.length)
    }
    assert(results.forall(_._1 == 0L))
    // fpp ~0.9%/file * 10 files => expected ~0.09 opens per probe; over
    // 40 probes a generous bound still proves the blooms are consulted
    val totalOpened = results.map(_._2).sum
    assert(totalOpened <= 20, s"blooms barely pruned: $totalOpened opens")
  }

  test("IN-list probes prune to the union of matching files") {
    val dir = newDir()
    val t = builtTable(dir)
    val inDf = t.snapshotWhere(
      $"k".isin(Seq("5", "700", "1999").map(id => md5hex(id)): _*))
    assert(inDf.select($"id").as[Long].collect().sorted.toSeq ===
      Seq(5L, 700L, 1999L))
    assert(inDf.inputFiles.length <= 6,
      s"IN probe opened ${inDf.inputFiles.length} files")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("vacuum deletes dead bloom sidecars, keeps live ones") {
    val dir = newDir()
    val t = builtTable(dir)
    val bloomDir = java.nio.file.Paths.get(dir).resolve(VersionedTable.BLOOM_DIR)
    val before = Files.list(bloomDir).count()
    assert(before >= 8)
    // rewrite everything (compact to few files) -> old sidecars dead
    t.compactSmallFiles(targetRows = 10000)
    t.vacuum(retainVersions = 1)
    val after = Files.list(bloomDir).count()
    val live = t.latestManifest.dataFiles.flatMap(_.bloomPath).size
    assert(after === live.toLong,
      s"sidecars on disk ($after) must equal live refs ($live)")
    assert(after < before)
    // and the compacted files' blooms still answer lookups
    val got = t.snapshotWhere($"k" === lit(md5hex("42"))).select($"id")
      .as[Long].collect()
    assert(got.toSeq === Seq(42L))
  }

  test("shallow clone resolves bloom refs and keeps pruning") {
    val dir = newDir()
    val t = builtTable(dir)
    val cloneDir = graft.Scratch.dir("graft-bloom").resolve("c").toString
    val c = VersionedTable.shallowClone(t, cloneDir)
    val df = c.snapshotWhere($"k" === lit(md5hex("77")))
    assert(df.select($"id").as[Long].collect().toSeq === Seq(77L))
    assert(df.inputFiles.length <=
      c.latestManifest.dataFiles.size / 2)
  }
}
