package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** OPTIMIZE … ZORDER BY: content preservation, multi-dimensional
  * skipping benefit, and the SQL statement path.
  *
  * Fixture: rows whose two columns are INDEPENDENT (`a` sequential,
  * `b = reversed-digit shuffle of a`), written linearly clustered on
  * `a`. Every file's `b` min/max then spans ~the whole domain, so a
  * `b` range predicate can skip nothing; after z-ordering on (a, b)
  * both columns are range-localized per file and the same predicate
  * must prune most files via the manifest stats alone. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("a", LongType),
    StructField("b", LongType),
    StructField("tag", StringType)))

  /** digit-reversal of 0..999 — a deterministic permutation that
    * decorrelates b from a. */
  private def rev(i: Long): Long =
    (i % 10) * 100 + (i / 10 % 10) * 10 + i / 100

  private def freshTable(): VersionedTable = {
    val dir = Files.createTempDirectory("zorder").resolve("t").toString
    val t = VersionedTable.create(spark, dir, schema,
      Map(VersionedTable.PROP_MAX_RECORDS -> "125"))
    val rows = (0L until 1000L).map(i => (i, rev(i), s"r$i"))
    t.append(rows.toDF("a", "b", "tag").orderBy("a").coalesce(1))
    t
  }

  /** Files whose [min,max] interval on `c` intersects [lo, hi] — the
    * candidate set the manifest-stats skipping would scan. */
  private def candidates(t: VersionedTable, c: String, lo: Long, hi: Long): Int =
    t.latestManifest.dataFiles.count { f =>
      val mn = f.colMins.get(c).map(_.toDouble)
      val mx = f.colMaxs.get(c).map(_.toDouble)
      mn.forall(_ <= hi) && mx.forall(_ >= lo)
    }

  test("zorder preserves content exactly and localizes BOTH columns' stats") {
    val t = freshTable()
    val before = t.snapshot().collect().toSet
    val nFiles = t.latestManifest.dataFiles.size
    assert(nFiles >= 8, s"fixture should fragment into files, got $nFiles")
    // linear clustering on a: a b-range predicate can skip (almost) nothing
    val bBefore = candidates(t, "b", 0, 99)
    assert(bBefore >= nFiles - 1,
      s"with linear a-clustering, b stats should be useless ($bBefore/$nFiles)")

    assert(t.zorder(Seq("a", "b"), targetRows = 125).nonEmpty)
    assert(t.snapshot().collect().toSet === before, "content must be identical")

    val after = t.latestManifest.dataFiles.size
    val aAfter = candidates(t, "a", 0, 99)
    val bAfter = candidates(t, "b", 0, 99)
    assert(bAfter <= after / 2,
      s"b-range candidates after zorder: $bAfter/$after — clustering failed")
    assert(aAfter <= after / 2,
      s"a-range candidates after zorder: $aAfter/$after — a lost its locality")
  }

  test("the OPTIMIZE ... ZORDER BY statement runs the clustering rewrite") {
    val t = freshTable()
    val before = t.snapshot().collect().toSet
    val out = graft.catalog.GraftSql.execute(spark,
      s"OPTIMIZE '${t.root}' TARGET 125 ROWS ZORDER BY (a, b)")
    assert(out.nonEmpty, "a clustering rewrite must commit a version")
    assert(t.snapshot().collect().toSet === before)
    assert(candidates(t, "b", 0, 99) <= t.latestManifest.dataFiles.size / 2)
    // plain OPTIMIZE (no ZORDER) still bin-packs: parser stays backward-compatible
    val t2 = freshTable()
    assert(graft.catalog.GraftSql.execute(spark,
      s"OPTIMIZE '${t2.root}' TARGET 1000 ROWS").nonEmpty)
    assert(t2.snapshot().count() === 1000L)
  }

  test("zorder on an all-null column degrades gracefully; unknown columns fail loudly") {
    val dir = Files.createTempDirectory("zorder-null").resolve("t").toString
    val t = VersionedTable.create(spark, dir, schema)
    t.append(Seq((1L, Option.empty[Long], "x"), (2L, Option.empty[Long], "y"))
      .toDF("a", "b", "tag"))
    assert(t.zorder(Seq("b", "a"), 10).nonEmpty) // null column ranks constant
    assert(t.snapshot().count() === 2L)
    intercept[IllegalArgumentException](t.zorder(Seq("nope"), 10))
    intercept[IllegalArgumentException](t.zorder(Seq("tag"), 10)) // string col
  }
}
