package graft.table

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

final case class ColumnStats(
    name: String,
    nNulls: Long,
    nDistinct: Long,
    min: Option[String],
    max: Option[String])

final case class TableStats(
    version: Long,
    nRows: Long,
    exact: Boolean,
    computedAtMs: Long,
    columns: Seq[ColumnStats])

/** `ANALYZE TABLE` support: per-column statistics (null count, distinct
  * count, min/max) computed over the current snapshot in ONE
  * aggregation pass and persisted as a `_stats/<version>.json` sidecar
  * beside the commit log — the Delta `ANALYZE ... COMPUTE STATISTICS`
  * surface for path tables.
  *
  * NDV is the one planner input file footprints cannot provide (Spark
  * already estimates broadcast joins from parquet sizes and AQE
  * re-plans from runtime sizes; neither knows key cardinality) — at
  * 100 TB it is what join-order and skew decisions read. The default
  * mode is therefore `approx_count_distinct` (HLL: one pass, mergeable,
  * no expand); `exact = true` opts into `count(DISTINCT)` — the
  * cross-engine-reproducible variant the oracle gate compares, at the
  * cost of a per-column expand that a 100 TB ANALYZE would not run.
  * Min/max are stored as strings (the snapshot schema can mix types in
  * one stats table); they complement the PER-FILE min/max the write
  * path already records for skipping ([[FileSkipping]]) with the
  * table-level view.
  *
  * Stats are advisory metadata, not part of table state: writing is
  * last-wins atomic (plain ATOMIC_MOVE, no commit CAS), reading
  * surfaces staleness (analyzed vs current version) and never fails. */
object TableStats {
  private implicit val fmts: Formats = DefaultFormats

  private def statsPath(t: VersionedTable, v: Long): Path =
    t.root.resolve("_stats").resolve(f"$v%020d.json")

  /** One-pass stats over `t`'s current snapshot; persists and returns
    * them. `cols` empty = every column. */
  def analyze(
      t: VersionedTable,
      cols: Seq[String] = Seq.empty,
      exact: Boolean = false): TableStats = {
    val version = t.latestVersion
    val snap = t.snapshot()
    val fields = t.schema.fields.map(_.name).toSeq
    val targets = if (cols.isEmpty) fields else cols
    targets.find(c => !fields.contains(c)).foreach { c =>
      throw new IllegalArgumentException(
        s"ANALYZE: no such column '$c' (table has ${fields.mkString(", ")})")
    }
    val aggs = count(lit(1)).as("__n") +: targets.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = snap.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))
    val columns = targets.map { c =>
      ColumnStats(c,
        n - row.getLong(row.fieldIndex(s"__nn_$c")),
        row.getLong(row.fieldIndex(s"__nd_$c")),
        Option(row.getAs[String](s"__min_$c")),
        Option(row.getAs[String](s"__max_$c")))
    }
    val stats =
      TableStats(version, n, exact, System.currentTimeMillis(), columns)
    write(t, stats)
    stats
  }

  private def write(t: VersionedTable, stats: TableStats): Unit = {
    val dest = statsPath(t, stats.version)
    Files.createDirectories(dest.getParent)
    val tmp = Files.createTempFile(dest.getParent, ".stats", ".tmp")
    Files.writeString(tmp, Serialization.write(stats))
    Files.move(tmp, dest,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The most recent persisted stats at or below the current version
    * (None when the table was never analyzed). */
  def read(t: VersionedTable): Option[TableStats] = {
    val dir = t.root.resolve("_stats")
    if (!Files.isDirectory(dir)) return None
    val current = t.latestVersion
    import scala.jdk.CollectionConverters._
    val versions = {
      val s = Files.list(dir)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
        .filter(_ <= current)
        .toList
      finally s.close()
    }
    versions.sorted.lastOption.map { v =>
      Serialization.read[TableStats](Files.readString(statsPath(t, v)))
    }
  }
}
