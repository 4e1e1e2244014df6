package graft.table

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.util.{Try, Using}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** One immutable data file of a table snapshot, as recorded in a commit
  * manifest. `path` is relative to the table root. For hash-bucketed
  * (copy-on-write) tables each file carries its bucket id and the
  * min/max of `hash(bucketKeys)` over its rows — the file-skipping
  * statistics that let MERGE prove which files *cannot* contain a
  * source key and inherit them untouched (Delta's add-file stats play
  * the same role for its CoW merge). */
final case class DataFile(
    path: String,
    bucket: Option[Int] = None,
    minHash: Option[Long] = None,
    maxHash: Option[Long] = None,
    rows: Option[Long] = None,
    colMins: Map[String, String] = Map.empty,
    colMaxs: Map[String, String] = Map.empty,
    nullCounts: Map[String, Long] = Map.empty,
    dvs: Seq[String] = Seq.empty,
    dvRows: Option[Long] = None,
    bloomPath: Option[String] = None) {
  /** A file with stats provably cannot contain key-hash `h` outside
    * [minHash, maxHash]; a file without stats can contain anything.
    *
    * Stats stay VALID under deletion vectors: a DV only removes rows,
    * so min/max/null-count ranges remain conservative (may admit a
    * file whose only matching rows are deleted — a false positive the
    * scan resolves, never a false negative). */
  def mayContainHash(h: Long): Boolean =
    (minHash, maxHash) match {
      case (Some(mn), Some(mx)) => h >= mn && h <= mx
      case _ => true
    }
  /** Live rows after deletion-vector subtraction (when counted). */
  def liveRows: Option[Long] = rows.map(_ - dvRows.getOrElse(0L))
}

/** One commit of a [[VersionedTable]] — the JSON manifest under
  * `_commits/<version>.json`.
  *
  * `dataFiles` is the COMPLETE file listing of this version's snapshot
  * (every manifest is its own checkpoint — readers never replay a log),
  * while `addedFiles`/`removedFiles` record this commit's delta for
  * introspection and write-amplification accounting: an append commit
  * lists only the new batch's files in `addedFiles` and nothing in
  * `removedFiles`, so append cost is O(batch), never O(table).
  *
  * `changeFiles` lists the commit's CDF files under `_changes/` —
  * batch CDF reads are manifest-driven, so a crashed writer's orphan
  * change files are invisible to `table_changes`.
  *
  * `txn` carries the last applied streaming batch id per application id,
  * accumulated across commits — the idempotence token that makes
  * `foreachBatch` retries exactly-once (reference relies on Delta's
  * txnAppId/txnVersion for this; see
  * /root/reference/notebooks/demo-notebook.py:282-287 and SURVEY §7.5
  * risk 1: the Gold additive merge is NOT retry-safe without it).
  *
  * == Checkpointing (on-disk form) ==
  * A manifest with `deltaOf = Some(v-1)` is a DELTA: its on-disk
  * `dataFiles` holds only THIS commit's added file entries, and the
  * snapshot listing is `parent listing − removedFiles + dataFiles`.
  * Every `graft.checkpointInterval`-th version is written FULL (a
  * checkpoint, `deltaOf = None`). [[VersionedTable.manifest]] resolves
  * deltas on read — every manifest handed to callers is fully resolved
  * (`deltaOf = None`, complete `dataFiles`) — so commit I/O is
  * O(delta) while history grows, without Delta Lake's separate
  * checkpoint files: the checkpoint IS a normal manifest (VERDICT r3
  * missing #3).
  */
final case class CommitManifest(
    version: Long,
    operation: String,
    timestampMs: Long,
    schemaJson: String,
    properties: Map[String, String],
    txn: Map[String, Long],
    bucketKeys: Option[Seq[String]] = None,
    numBuckets: Option[Int] = None,
    dataFiles: Seq[DataFile] = Seq.empty,
    addedFiles: Seq[String] = Seq.empty,
    removedFiles: Seq[String] = Seq.empty,
    changeFiles: Seq[String] = Seq.empty,
    deltaOf: Option[Long] = None,
    partitionKeys: Option[Seq[String]] = None) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** Hash-bucketing spec for copy-on-write tables: rows are clustered
  * into `pmod(hash(keys), numBuckets)` bucket files at write time, and
  * within each bucket sorted by `hash(keys)` so every file covers a
  * narrow key-hash range — the precondition for file-level skipping. */
final case class BucketSpec(keys: Seq[String], numBuckets: Int) {
  require(numBuckets > 0, "numBuckets must be positive")
}

/** Thrown when an optimistic commit loses to a conflicting concurrent
  * commit (a file this commit rewrites was itself rewritten, or a
  * concurrent commit added files inside this commit's key scope).
  * Callers re-run their read-compute-commit cycle against the new
  * table state — [[Merge.run]] does this automatically. */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

/** A versioned parquet table with file-granular commit log, Change Data
  * Feed and time travel — the native replacement for the Delta Lake
  * features the reference leans on (MERGE INTO, `table_changes`,
  * `VERSION AS OF`, `delta.enableChangeDataFeed`;
  * /root/reference/notebooks/demo-notebook.py:213-227, 363-373, 428-431,
  * 533-535). No Delta jars exist in this environment (SURVEY §7.1), so
  * the layer is built directly on parquet:
  *
  * {{{
  * <root>/
  *   _commits/<%020d version>.json   // manifest; atomic hard-link commit
  *   data/<uuid>.parquet             // immutable data files, shared
  *                                   // across versions by reference
  *   _changes/v<version>-*.parquet   // CDF rows of one commit (flat files
  *                                   // so a streaming source can tail the
  *                                   // directory without partition-column
  *                                   // inference)
  * }}}
  *
  * Readers resolve the latest version by listing `_commits`; data written
  * for a version is invisible until its manifest lands (write-data-first,
  * publish-manifest-last). The manifest hard-link is the commit point and
  * doubles as compare-and-swap: two writers racing to version v+1 cannot
  * both win (`Files.createLink` fails atomically on an existing target),
  * the loser rebases onto the winner's manifest when its file sets are
  * disjoint and re-runs otherwise — optimistic concurrency in Delta's
  * mold, specced by two threads merging into one table concurrently.
  *
  * == 100 TB design notes ==
  *   - '''Appends are O(batch)''': an append commit writes the batch's
  *     files and a manifest referencing them plus the previous listing —
  *     the existing snapshot is never read or rewritten, so a daily-append
  *     log table costs the same per commit at version 3 and version 3000.
  *   - '''Merges are file-level copy-on-write''': bucket clustering plus
  *     per-file key-hash ranges let the merge join read and rewrite ONLY
  *     files that can contain source keys; everything else is inherited
  *     by reference in the manifest. A small CDC batch against a huge
  *     Silver table costs O(batch + overlapping files), never O(table).
  *   - '''The CDF directory is append-only and O(changed rows)''', so
  *     Gold-style consumers never scale with table size — that property
  *     is the reference pipeline's entire reason to exist (SURVEY §4).
  *   - '''Manifests checkpoint''': every `graft.checkpointInterval`-th
  *     manifest embeds the full file listing; the versions between are
  *     O(delta) JSON resolved (and cached) on read — commit I/O stays
  *     flat as history grows (pinned by the 1000-commit endurance spec),
  *     and vacuum materializes the oldest retained manifest so history
  *     trims never strand a delta chain.
  */
final class VersionedTable private (
    val spark: SparkSession,
    val root: Path) {

  import VersionedTable._

  private def commitsDir: Path = root.resolve(COMMITS_DIR)
  private def changesDir: Path = root.resolve(CHANGES_DIR)
  private def dataDir: Path = root.resolve(DATA_DIR)
  private def manifestPath(v: Long): Path = commitsDir.resolve(f"$v%020d.json")

  /** Absolute path of the CDF directory — the streaming CDF source
    * (SURVEY §2.1 S5) tails this with `spark.readStream.parquet`. */
  def changesLocation: String = changesDir.toString

  def versions: Seq[Long] =
    Using.resource(Files.list(commitsDir)) { s =>
      s.iterator.asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .flatMap(n => Try(n.stripSuffix(".json").toLong).toOption)
        .toSeq.sorted
    }

  /** Highest version seen by THIS handle — makes [[latestVersion]] O(1)
    * instead of re-listing `_commits` (O(history)) on every call: the
    * commit path resolves the latest version several times per commit,
    * so a long-lived table paid O(history) per commit (the endurance
    * spec's latency growth). Concurrent writers are still observed by
    * probing FORWARD from the hint (manifest names are dense integers);
    * vacuum never removes the latest version, so a stale hint can only
    * lag, never dangle — and a defensive existence check re-lists if it
    * somehow does. */
  private val latestHint = new java.util.concurrent.atomic.AtomicLong(-1L)

  def latestVersion: Long = {
    var v = latestHint.get()
    if (v < 0 || !Files.exists(manifestPath(v))) v = versions.max
    var next = v + 1
    while (Files.exists(manifestPath(next))) { v = next; next += 1 }
    var cur = latestHint.get()
    while (v > cur && !latestHint.compareAndSet(cur, v)) cur = latestHint.get()
    v
  }

  /** Parsed-manifest cache: manifests are immutable once published, so
    * each version is read and parsed at most once per table handle —
    * `TIMESTAMP AS OF` / `changes()` planning cost no longer grows with
    * history length. Holds RESOLVED manifests only (`deltaOf = None`,
    * complete listing). `vacuum` invalidates the versions it removes. */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Long, CommitManifest]()

  /** On-disk form, deltas unresolved. Never cached. */
  private def readRaw(v: Long): CommitManifest = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.read[CommitManifest](Files.readString(manifestPath(v)))
  }

  /** Applies one delta manifest onto its resolved parent. The listing
    * order reproduces the full-manifest construction in [[commitFiles]]
    * exactly: surviving parent files first, this commit's additions
    * appended. */
  private def resolveDelta(
      parent: CommitManifest, delta: CommitManifest): CommitManifest = {
    val removed = delta.removedFiles.toSet
    delta.copy(
      dataFiles = parent.dataFiles.filterNot(f => removed(f.path)) ++
        delta.dataFiles,
      deltaOf = None)
  }

  /** Fully-resolved manifest of `v`: walks back through delta manifests
    * to the nearest cached or checkpoint (full) manifest, then folds
    * forward, caching every intermediate — so resolving a whole history
    * is O(versions) total, and steady-state resolution of the latest
    * version reads at most `checkpointInterval` small delta files. */
  def manifest(v: Long): CommitManifest = {
    val cached = manifestCache.get(v)
    if (cached != null) return cached
    var chain = List.empty[CommitManifest] // ascending versions
    var base: CommitManifest = null
    var cur = v
    while (base == null) {
      val hit = manifestCache.get(cur)
      if (hit != null) base = hit
      else {
        val raw = readRaw(cur)
        raw.deltaOf match {
          case None => base = raw
          case Some(p) => chain ::= raw; cur = p
        }
      }
    }
    var resolved = base
    manifestCache.putIfAbsent(resolved.version, resolved)
    chain.foreach { d =>
      resolved = resolveDelta(resolved, d)
      manifestCache.putIfAbsent(d.version, resolved)
    }
    resolved
  }

  def latestManifest: CommitManifest = manifest(latestVersion)

  /** Versions between full (checkpoint) manifests; table property
    * [[VersionedTable.PROP_CHECKPOINT_INTERVAL]], default 10 (Delta's
    * checkpoint cadence). */
  private def checkpointInterval(props: Map[String, String]): Long =
    props.get(PROP_CHECKPOINT_INTERVAL).map(_.toLong)
      .filter(_ >= 1).getOrElse(10L)

  def schema: StructType = latestManifest.schema
  def properties: Map[String, String] = latestManifest.properties

  /** Whether merges emit change rows (reference: table property
    * `delta.enableChangeDataFeed = true`, demo-notebook.py:225-227). */
  def cdfEnabled: Boolean =
    properties.get(PROP_CDF).exists(_.equalsIgnoreCase("true"))

  /** Copy-on-write bucketing spec, if the table was created with one. */
  def bucketSpec: Option[BucketSpec] = {
    val m = latestManifest
    for (k <- m.bucketKeys; n <- m.numBuckets) yield BucketSpec(k, n)
  }

  def isBucketed: Boolean = bucketSpec.isDefined

  /** `PARTITIONED BY` columns, if the table was created with them. */
  def partitionKeys: Option[Seq[String]] = latestManifest.partitionKeys

  def isPartitioned: Boolean = partitionKeys.isDefined

  /** Current snapshot. */
  def snapshot(): DataFrame = snapshotAt(latestVersion)

  /** Commit history newest-first (Delta's `DESCRIBE HISTORY` shape):
    * one row per version with the operation, commit timestamp, and
    * file/row deltas — all straight from the manifests, no data IO.
    * Driver-side by construction (history length = commit count). */
  def history(): DataFrame = {
    val rows = versions.sorted.reverse.map { v =>
      val m = manifest(v)
      (m.version, new java.sql.Timestamp(m.timestampMs), m.operation,
        m.addedFiles.size.toLong, m.removedFiles.size.toLong,
        m.dataFiles.size.toLong,
        m.dataFiles.flatMap(_.liveRows).sum)
    }
    import spark.implicits._
    rows.toDF("version", "timestamp", "operation",
      "num_added_files", "num_removed_files", "num_files", "num_rows")
  }

  /** Time travel — `VERSION AS OF v` (S8, demo-notebook.py:533-535).
    * The snapshot of any version is exactly its manifest's file listing;
    * no version is ever "reconstructed" by replay or rewrite. */
  def snapshotAt(v: Long): DataFrame = {
    val m = manifest(v) // throws for unknown versions
    readDataFiles(m.dataFiles, m.schema)
  }

  /** `TIMESTAMP AS OF` resolution: the latest version committed at or
    * before `tsMillis`. Commit timestamps are strictly monotonic (the
    * committer bumps equal clock reads), so the mapping is unambiguous. */
  def versionAt(tsMillis: Long): Long = {
    val vs = versions.filter(v => manifest(v).timestampMs <= tsMillis)
    require(vs.nonEmpty,
      s"no version of $root committed at or before timestamp $tsMillis")
    vs.max
  }

  /** The concrete parquet files backing version `v` (absolute paths) —
    * the DSv2 catalog hands these to Spark's parquet source so pushdown,
    * pruning and vectorization apply to any version. */
  def snapshotPathsAt(v: Long): Seq[String] =
    manifest(v).dataFiles.map(f => root.resolve(f.path).toString)

  /** Reads a subset of the table's data files with the given schema —
    * RAW: deletion vectors are NOT applied (CDF/staged-file re-reads).
    * Missing columns of older files (pre-schema-evolution) read as
    * nulls. Logical reads of table state go through [[readDataFiles]]. */
  def readFiles(relPaths: Seq[String], schema: StructType): DataFrame =
    if (relPaths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(relPaths.map(p => root.resolve(p).toString): _*)

  /** Reads manifest entries with the file's name and row position
    * (`__file`, `__pos` — from the parquet `_metadata` column, which is
    * deterministic per file) appended, and deletion vectors SUBTRACTED:
    * tombstoned positions are anti-joined away before any caller sees a
    * row. The anti-join stays distributed — DV sets are never collected
    * to the driver — and Spark broadcasts the (small) tombstone side
    * under AQE. This is the one code path every logical read shares:
    * snapshots, time travel, merge candidates, DML touched-file scans. */
  private[table] def readWithMeta(
      entries: Seq[DataFile], schema: StructType): DataFrame = {
    val metaSchema = StructType(schema.fields ++ Seq(
      StructField("__file", org.apache.spark.sql.types.StringType),
      StructField("__pos", org.apache.spark.sql.types.LongType)))
    if (entries.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], metaSchema)
    val df = spark.read.schema(schema)
      .parquet(entries.map(f => root.resolve(f.path).toString): _*)
      .withColumn("__file",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .withColumn("__pos", col("_metadata.row_index"))
    val dvPaths = entries.flatMap(_.dvs).distinct
    if (dvPaths.isEmpty) df
    else df.join(
      spark.read.parquet(dvPaths.map(p => root.resolve(p).toString): _*)
        .select(col("__file"), col("__pos")).distinct(),
      Seq("__file", "__pos"), "left_anti")
  }

  /** The LOGICAL content of `entries`: raw file rows minus deletion
    * vectors, in the table schema. */
  def readDataFiles(entries: Seq[DataFile], schema: StructType): DataFrame =
    if (entries.forall(_.dvs.isEmpty)) readFiles(entries.map(_.path), schema)
    else readWithMeta(entries, schema)
      .select(schema.fields.toIndexedSeq.map(f => col(f.name)): _*)

  /** Last batch id committed under `appId`, for idempotent replays. */
  def lastTxn(appId: String): Option[Long] = latestManifest.txn.get(appId)

  /** CDF schema = table schema + the three change-metadata columns
    * (demo-notebook.py:363-371). */
  def changeSchema: StructType = changeSchemaOf(schema)

  /** Batch CDF read — `table_changes(name, from [, to])` (S7,
    * demo-notebook.py:371). Manifest-driven: only change files a commit
    * actually published are read, so orphans from crashed or lost
    * concurrent attempts are invisible. Versions with no changes (or
    * vacuumed away) contribute nothing. */
  def changes(fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    healChangeFiles() // recover files a crashed committer left hidden
    val hi = toVersion.getOrElse(latestVersion)
    // compacted spans first: a version covered by a range directory is
    // served from it EXCLUSIVELY (its per-commit files, if a crash left
    // any behind, are ignored — no double counting), so a long-lived
    // table's CDF read opens O(checkpoint spans) directories plus the
    // uncompacted tail, not one file per commit
    val ranges = rangeDirsOnDisk.filter(r => r._2 >= fromVersion && r._1 <= hi)
    val covered = ranges.flatMap(r => r._1 to r._2).toSet
    val files = versions
      .filter(v => v >= fromVersion && v <= hi && !covered(v))
      .flatMap(v => manifest(v).changeFiles)
      .map(n => changesDir.resolve(n).toString)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], changeSchema)
    val tail =
      if (files.isEmpty) empty
      else spark.read.schema(changeSchema).parquet(files: _*)
    val compacted =
      if (ranges.isEmpty) empty
      else spark.read.schema(changeSchema)
        .parquet(ranges.map(_._3.toString): _*)
        .filter(col("_commit_version").between(fromVersion, hi))
    tail.unionAll(compacted)
  }

  /** Compacted CDF span directories `_changes/r<lo>-<hi>/`, parsed. */
  private def rangeDirsOnDisk: Seq[(Long, Long, Path)] =
    if (!Files.isDirectory(changesDir)) Seq.empty
    else Using.resource(Files.list(changesDir)) { s =>
      s.iterator.asScala.flatMap { p =>
        val n = p.getFileName.toString
        if (n.startsWith("r") && Files.isDirectory(p))
          n.drop(1).split('-') match {
            case Array(lo, hiS) => Try((lo.toLong, hiS.toLong, p)).toOption
            case _ => None
          }
        else None
      }.toSeq
    }

  /** Highest version whose per-commit CDF files were folded into a
    * range directory — a STREAMING consumer (which tails `v*` files)
    * whose progress is at or below this must backfill via the batch
    * [[changes]] read instead of resuming the tail. */
  def cdfCompactWatermark: Option[Long] = {
    val p = changesDir.resolve(COMPACT_WATERMARK)
    if (Files.exists(p)) Try(Files.readString(p).trim.toLong).toOption else None
  }

  /** Folds the per-commit CDF files of complete checkpoint spans
    * (`((k-1)·interval, k·interval]`, upper bound ≤ `through`) into one
    * parquet DIRECTORY per span, atomically published by rename —
    * ranges are deterministic and aligned, so racing compactors write
    * identical spans and the rename loser simply retracts. Runs as a
    * post-publish hook on every checkpoint commit (one new span at
    * steady state), one checkpoint behind the tail so streaming
    * consumers never see files vanish mid-read. Crash between publish
    * and per-commit-file deletion heals on the next run (coverage makes
    * the stale files invisible to [[changes]] meanwhile). */
  private[table] def compactChangesBefore(through: Long): Unit = {
    val interval = checkpointInterval(properties)
    if (through < interval || !Files.isDirectory(changesDir)) return
    val existing = rangeDirsOnDisk.map(r => (r._1, r._2)).toSet
    val byVersion = changeFilesOnDisk.groupBy(_._1)
    val maxRecords = properties.get(PROP_MAX_RECORDS).map(_.toLong)
    (interval to through by interval)
      .map(hiV => (hiV - interval + 1, hiV))
      .foreach { case (lo, hiV) =>
        val span = changesDir.resolve(s"r$lo-$hiV")
        val files = (lo to hiV)
          .flatMap(v => byVersion.getOrElse(v, Seq.empty)).map(_._2)
        if (!existing.contains((lo, hiV)) && files.nonEmpty) {
          val tmp = changesDir.resolve(s".r$lo-$hiV-${UUID.randomUUID()}")
          val w = spark.read.schema(changeSchema)
            .parquet(files.map(_.toString): _*)
            .coalesce(1).write.mode("overwrite")
          maxRecords.fold(w)(m => w.option("maxRecordsPerFile", m))
            .parquet(tmp.toString)
          try Files.move(tmp, span, StandardCopyOption.ATOMIC_MOVE)
          catch { case _: Throwable => deleteRecursively(tmp) }
        }
        if (Files.isDirectory(span))
          files.foreach(f => Try(Files.deleteIfExists(f)))
      }
    rangeDirsOnDisk.map(_._2).maxOption.foreach { w =>
      if (w > cdfCompactWatermark.getOrElse(Long.MinValue))
        Files.writeString(changesDir.resolve(COMPACT_WATERMARK), w.toString)
    }
  }

  private def changeFilesOnDisk: Seq[(Long, Path)] =
    if (!Files.isDirectory(changesDir)) Seq.empty
    else Using.resource(Files.list(changesDir)) { s =>
      s.iterator.asScala.flatMap { p =>
        val n = p.getFileName.toString
        // layout: v<version>-<original part file name>.parquet
        if (n.startsWith("v") && n.contains("-") && n.endsWith(".parquet"))
          Try(n.substring(1, n.indexOf('-')).toLong).toOption.map(_ -> p)
        else None
      }.toSeq
    }

  // ------------------------------------------------------------- writes

  /** Writes `df` as immutable files under `data/` and returns their
    * manifest entries — data only becomes visible when a later
    * [[commitFiles]] publishes a manifest referencing it.
    *
    * For bucketed tables the write clusters rows into bucket files
    * sorted by key hash, and MATERIALIZES the key hash as a narrow
    * `__khash` column so the per-file hash range + row count come
    * straight from the parquet footers — a driver-side metadata read,
    * zero extra Spark jobs (readers never see the column: all reads go
    * through explicit schemas). */
  private[table] def ingest(df: DataFrame): Seq[DataFile] =
    VersionedTable.labeled(spark, s"table:ingest ${root.getFileName}")(ingestImpl(df))

  private def ingestImpl(df: DataFrame): Seq[DataFile] = {
    val tmp = root.resolve(s"$STAGING_DIR/ingest-${UUID.randomUUID()}")
    // Optional file sizing (PROP_MAX_RECORDS_PER_FILE): a huge bucket
    // splits into several files, and because rows are sorted by key hash
    // the split files cover DISJOINT hash ranges — merge pruning then
    // skips within buckets too, and compactSmallFiles has units to pack.
    val maxRecords = properties.get(PROP_MAX_RECORDS).map(_.toLong)
    def sized[T](w: org.apache.spark.sql.DataFrameWriter[T]) =
      maxRecords.fold(w)(m => w.option("maxRecordsPerFile", m))
    val pkeys = latestManifest.partitionKeys
    bucketSpec match {
      case Some(BucketSpec(keys, n)) =>
        val khash = hash(keys.map(col): _*)
        sized(df.withColumn(KHASH_COL, khash.cast("long"))
          .withColumn(BUCKET_COL, pmod(khash, lit(n)).cast("int"))
          .repartition(col(BUCKET_COL))
          .sortWithinPartitions(col(BUCKET_COL), col(KHASH_COL))
          .write.mode("overwrite").partitionBy(BUCKET_COL)).parquet(tmp.toString)
      case None => pkeys match {
        case Some(pcols) =>
          // Hive-style `col=value/` layout via ALIAS partition columns:
          // the real columns stay IN the data files, so reads need no
          // directory-value recovery (explicit-schema scans keep
          // working) and the footer min=max stats are exact per
          // partition — FileSkipping's stats evaluation IS the
          // directory-level pruning, applied before any file opens.
          // The repartition clusters each batch partition-wise (Delta's
          // optimized-write analog) so no file straddles two partition
          // values; maxRecordsPerFile still splits huge partitions.
          val aliased = pcols.foldLeft(df)((d, c) =>
            d.withColumn(s"$PART_PREFIX$c", col(c)))
          sized(aliased.repartition(pcols.map(col): _*)
            .write.mode("overwrite")
            .partitionBy(pcols.map(PART_PREFIX + _): _*)).parquet(tmp.toString)
        case None =>
          sized(df.write.mode("overwrite")).parquet(tmp.toString)
      }
    }
    // partition columns lead the stat fields so their exact bounds are
    // always harvested, however wide the schema (STAT_COLS_MAX cap)
    val statFields = pkeys.fold(df.schema.fields.toSeq) { pcols =>
      val (p, rest) = df.schema.fields.toSeq.partition(f => pcols.contains(f.name))
      p ++ rest
    }
    val entries = moveIntoData(tmp, bucketSpec.isDefined, statFields)
    deleteRecursively(tmp)
    // bloom sidecars for configured columns: one distributed job over
    // the just-written files; entries gain their bloomPath refs before
    // the commit publishes them (see BloomIndex)
    val bloomCols = properties.get(PROP_BLOOM_COLS)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    if (bloomCols.isEmpty) entries
    else {
      val bitsPerRow = properties.get(PROP_BLOOM_BITS_PER_ROW)
        .flatMap(s => Try(s.toInt).toOption).getOrElse(10)
      BloomIndex.attach(spark, root, entries, df.schema, bloomCols, bitsPerRow)
    }
  }

  /** Moves staged parquet files into `data/` under fresh unique names.
    * Every file's manifest entry carries footer-derived stats: row count
    * + per-column min/max/null-count (data skipping) always; bucket id
    * (from the staging dir name) + `__khash` min/max for bucketed
    * tables — the merge file-skipping inputs. */
  private def moveIntoData(
      stagingRoot: Path,
      bucketed: Boolean,
      statFields: Seq[StructField]): Seq[DataFile] = {
    Files.createDirectories(dataDir)
    val staged = Using.resource(Files.walk(stagingRoot)) { s =>
      s.iterator.asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq
    }
    val bucketRe = s"$BUCKET_COL=(\\d+)".r
    staged.map { p =>
      val rel = stagingRoot.relativize(p)
      val key = rel.toString
      val name = s"${UUID.randomUUID()}.parquet"
      // partition staging dirs (`__p_col=value/`) survive the move as
      // `col=value/` under data/; bucket dirs flatten (the id lives in
      // the manifest entry)
      val partDirs = (0 until rel.getNameCount - 1)
        .map(rel.getName(_).toString)
        .collect { case s if s.startsWith(PART_PREFIX) => s.stripPrefix(PART_PREFIX) }
      val destDir = partDirs.foldLeft(dataDir)(_.resolve(_))
      Files.createDirectories(destDir)
      val dest = destDir.resolve(name)
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      val st = footerStats(dest, statFields)
      val bucket =
        if (bucketed) bucketRe.findFirstMatchIn(key).map(_.group(1).toInt) else None
      DataFile((DATA_DIR +: partDirs :+ name).mkString("/"), bucket,
        st.khashMin, st.khashMax,
        Some(st.rows), st.mins, st.maxs, st.nulls)
    }
  }

  /** The file-granular commit: publishes `added` files (already written
    * via [[ingest]]) and drops `removed` ones as the next version.
    *
    * `changeRows` must already carry `_change_type` and read from
    * materialized data (the merge engine stages its join once, then
    * feeds projections here); the commit stamps `_commit_version` /
    * `_commit_timestamp` (pre/postimages of one commit share both —
    * demo-notebook.py:369).
    *
    * Exactly-once: if `txn = Some(appId -> batchId)` and that batch id
    * is already recorded, the commit is skipped and `None` returned —
    * the guard for `foreachBatch` retries (D5). `extraTxn` entries ride
    * along unconditionally (e.g. the CDF consumer's high-watermark).
    *
    * Optimistic concurrency: publishing is a hard-link CAS on the
    * manifest name. Losing the race triggers an automatic rebase onto
    * the winner's manifest when safe — all `removed` files still live,
    * and (when `baseVersion`/`conflictsWith` are given) no file added
    * since `baseVersion` falls inside this commit's key scope —
    * otherwise a [[CommitConflictException]] tells the caller to re-run
    * against current state. */
  def commitFiles(
      added: Seq[DataFile],
      removed: Seq[String],
      changeRows: Option[DataFrame],
      operation: String,
      txn: Option[(String, Long)] = None,
      extraTxn: Map[String, Long] = Map.empty,
      newSchemaJson: Option[String] = None,
      baseVersion: Option[Long] = None,
      conflictsWith: Option[DataFile => Boolean] = None,
      newProperties: Option[Map[String, String]] = None): Option[Long] = {
    val removedSet = removed.toSet
    var attempt = 0
    while (true) {
      healChangeFiles()
      val prev = latestManifest
      val alreadyApplied = txn.exists { case (appId, batchId) =>
        prev.txn.get(appId).exists(_ >= batchId)
      }
      if (alreadyApplied) return None

      // rebase safety against commits that landed after our base
      val prevPaths = prev.dataFiles.map(_.path).toSet
      removedSet.find(!prevPaths.contains(_)).foreach { lost =>
        throw new CommitConflictException(
          s"file $lost was rewritten by a concurrent commit " +
            s"(base v${baseVersion.getOrElse(prev.version)}, now v${prev.version})")
      }
      for (base <- baseVersion if prev.version != base) {
        // a concurrently evolved schema invalidates plans made against
        // the base schema — callers re-run against fresh state
        if (manifest(base).schemaJson != prev.schemaJson)
          throw new CommitConflictException(
            s"table schema changed concurrently (base v$base, now v${prev.version})")
        for (pred <- conflictsWith) {
          val baseFiles = manifest(base).dataFiles.map(_.path).toSet
          prev.dataFiles.filter(f => !baseFiles.contains(f.path)).find(pred)
            .foreach { f =>
              throw new CommitConflictException(
                s"concurrent commit added ${f.path} inside this commit's key scope " +
                  s"(base v$base, now v${prev.version})")
            }
        }
      }

      val v = prev.version + 1
      // strictly monotonic commit timestamps make TIMESTAMP AS OF unambiguous
      val ts = math.max(System.currentTimeMillis(), prev.timestampMs + 1)

      // Change files are staged into `_changes/` under dot-prefixed
      // (hidden) names: invisible to the directory-tailing streaming CDF
      // source and to vacuum until THIS commit wins the CAS — a losing
      // or crashed attempt can never leak phantom change rows.
      val changeNames = changeRows.filter(_ => cdfEnabled).map { ch =>
        val tmp = root.resolve(s"$STAGING_DIR/changes-${UUID.randomUUID()}")
        VersionedTable.labeled(spark, s"table:cdf-write ${root.getFileName}") {
          ch.withColumn("_commit_version", lit(v))
            .withColumn("_commit_timestamp", timestamp_millis(lit(ts)))
            .write.mode("overwrite").parquet(tmp.toString)
        }
        Files.createDirectories(changesDir)
        val names = Using.resource(Files.list(tmp)) { s =>
          s.iterator.asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq
        }.map { p =>
          val name = s"v$v-${p.getFileName}"
          Files.move(p, changesDir.resolve(s".$name"), StandardCopyOption.ATOMIC_MOVE)
          name
        }
        deleteRecursively(tmp)
        names
      }.getOrElse(Seq.empty)

      val m = CommitManifest(v, operation, ts,
        newSchemaJson.getOrElse(prev.schemaJson),
        newProperties.getOrElse(prev.properties),
        prev.txn ++ txn.toMap ++ extraTxn,
        prev.bucketKeys, prev.numBuckets,
        dataFiles = prev.dataFiles.filterNot(f => removedSet.contains(f.path)) ++ added,
        addedFiles = added.map(_.path),
        removedFiles = removed,
        changeFiles = changeNames,
        partitionKeys = prev.partitionKeys)
      // checkpointing: most commits publish O(delta) JSON (added entries
      // + removed paths); every checkpointInterval-th version publishes
      // the full listing so resolution never walks far
      val disk =
        if (v % checkpointInterval(prev.properties) == 0) m
        else m.copy(dataFiles = added, deltaOf = Some(prev.version))
      try {
        publish(disk)
        manifestCache.put(v, m)
        // post-checkpoint maintenance: fold the previous (now cold)
        // checkpoint span's CDF scatter into one range directory —
        // best-effort, the next checkpoint retries anything skipped
        if (cdfEnabled && v % checkpointInterval(m.properties) == 0)
          Try(compactChangesBefore(v - checkpointInterval(m.properties)))
        // unhide this commit's change files (crash here is healed by the
        // next commit or the next changes() read — the manifest is the
        // source of truth for what must exist; Try: a concurrent healer
        // may have renamed it already)
        changeNames.foreach { n =>
          Try(Files.move(changesDir.resolve(s".$n"), changesDir.resolve(n),
            StandardCopyOption.ATOMIC_MOVE))
        }
        return Some(v)
      } catch {
        case _: FileAlreadyExistsException =>
          // lost the CAS: retract exactly OUR (still hidden) change files
          changeNames.foreach(n => Files.deleteIfExists(changesDir.resolve(s".$n")))
          attempt += 1
          if (attempt > 20) throw new CommitConflictException(
            s"gave up publishing after $attempt CAS losses at $root")
      }
    }
    None // unreachable
  }

  /** Repairs `_changes/` after a crash between CAS win and unhide:
    * hidden files listed by a published manifest are renamed into
    * visibility; hidden files of superseded attempts are deleted;
    * hidden files AHEAD of the latest version belong to an in-flight
    * attempt and are left alone. */
  private def healChangeFiles(): Unit = {
    if (!Files.isDirectory(changesDir)) return
    val hidden = Using.resource(Files.list(changesDir)) { s =>
      s.iterator.asScala
        .filter(_.getFileName.toString.startsWith(".v")).toSeq
    }
    if (hidden.isEmpty) return
    val latest = latestVersion
    hidden.foreach { p =>
      val finalName = p.getFileName.toString.drop(1)
      Try(finalName.substring(1, finalName.indexOf('-')).toLong).toOption.foreach { v =>
        if (v <= latest) {
          val listed = Try(manifest(v).changeFiles.contains(finalName)).getOrElse(false)
          // Try: a concurrent healer/committer may win the same rename
          if (listed)
            Try(Files.move(p, changesDir.resolve(finalName),
              StandardCopyOption.ATOMIC_MOVE))
          else Try(Files.deleteIfExists(p))
          ()
        } // v > latest: in-flight attempt
      }
    }
  }

  /** Runs `body` (a commitFiles call) and retracts `added` — freshly
    * ingested, not yet referenced by any manifest — when the commit is
    * skipped (txn replay) or fails (conflict), so conflicts never leak
    * unreachable data files. */
  private def retractingOnFailure(added: Seq[DataFile])(
      body: => Option[Long]): Option[Long] = {
    val res = try body catch {
      case e: Throwable =>
        added.foreach(f => Files.deleteIfExists(root.resolve(f.path)))
        throw e
    }
    if (res.isEmpty)
      added.foreach(f => Files.deleteIfExists(root.resolve(f.path)))
    res
  }

  /** Full-rewrite commit: `newSnapshot` replaces every current file.
    * The right shape for small tables (Gold aggregates) and compaction;
    * large tables use [[append]] / file-level CoW [[Merge]] instead. */
  def commit(
      newSnapshot: DataFrame,
      changeRows: Option[DataFrame],
      operation: String,
      txn: Option[(String, Long)] = None): Option[Long] = {
    val prev = latestManifest
    val alreadyApplied = txn.exists { case (appId, batchId) =>
      prev.txn.get(appId).exists(_ >= batchId)
    }
    if (alreadyApplied) return None
    val added = ingest(newSnapshot)
    retractingOnFailure(added) {
      commitFiles(added, prev.dataFiles.map(_.path), changeRows, operation,
        txn, baseVersion = Some(prev.version), conflictsWith = Some(_ => true))
    }
  }

  /** Appends rows as a new version (Bronze-style append, S3; the DSv2
    * INSERT INTO path). O(batch): ONLY the incoming rows are written —
    * the commit is the new files plus the previous manifest's listing,
    * and the CDF 'insert' rows are a re-read of those same staged files
    * (nothing nondeterministic is computed twice). Concurrent appends
    * rebase onto each other automatically (both only add). */
  def append(rows: DataFrame, txn: Option[(String, Long)] = None): Option[Long] = {
    require(!isBucketed,
      "append is for log-style tables; bucketed (CoW) tables are maintained by merge")
    val aligned = align(rows)
    enforceConstraints(aligned)
    val added = ingest(aligned)
    val staged = readFiles(added.map(_.path), schema)
    retractingOnFailure(added) {
      commitFiles(added, Seq.empty,
        Some(staged.withColumn("_change_type", lit("insert"))), "append", txn)
    }
  }

  private def align(df: DataFrame): DataFrame = {
    val cols = schema.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name))
    df.select(cols.toIndexedSeq: _*)
  }

  /** Schema evolution (ALTER TABLE ADD COLUMNS / MERGE mergeSchema):
    * commits the widened schema as a metadata-only version. Existing
    * files are inherited untouched — readers fill the new columns with
    * nulls (parquet reads are by-name). Only additive, nullable changes
    * are legal: every existing field must survive unchanged. */
  def evolveSchema(newSchema: StructType): Option[Long] = {
    val base = latestManifest
    val cur = base.schema
    cur.fields.foreach { f =>
      val kept = newSchema.fields.find(_.name == f.name)
      require(kept.exists(_.dataType == f.dataType),
        s"schema evolution must preserve existing column ${f.name}: ${f.dataType}")
    }
    newSchema.fields.filterNot(f => cur.fieldNames.contains(f.name)).foreach { f =>
      require(f.nullable, s"evolved column ${f.name} must be nullable")
    }
    if (newSchema == cur) None
    else commitFiles(Seq.empty, Seq.empty, None, "alter",
      newSchemaJson = Some(newSchema.json),
      // a racing schema change must not be silently overwritten
      baseVersion = Some(base.version))
  }

  /** Compaction (OPTIMIZE analog): rewrites the current snapshot as one
    * fresh set of files — collapses the file scatter accumulated by
    * incremental appends/merges so a following [[vacuum]] can reclaim
    * every superseded file. Emits no CDF rows (no row content changes). */
  def compact(): Option[Long] = commit(snapshot(), None, "compact")

  /** Bin-packing compaction (Delta's `OPTIMIZE` proper): rewrites ONLY
    * files smaller than `targetRows`, merging them into right-sized
    * files; every adequately-sized file is inherited untouched, so the
    * maintenance cost is O(small files), not O(table) — the small-file
    * remedy for long-lived incremental tables (a 100 TB table with a
    * few fragmented buckets compacts in seconds, unlike [[compact]]).
    * Row counts come from the manifest (every file carries one); no
    * data is scanned to plan the rewrite. No CDF rows are emitted. */
  def compactSmallFiles(
      targetRows: Long,
      where: Option[org.apache.spark.sql.Column] = None): Option[Long] = {
    require(targetRows > 0)
    val prev = latestManifest
    // optional maintenance scope (`OPTIMIZE ... WHERE`): only files
    // whose stats may hold a matching row are considered — on a
    // partitioned table a partition predicate compacts ONE partition's
    // scatter and never touches (or re-clusters) the rest
    val scoped = where.fold(prev.dataFiles)(statsCandidates(prev, _))
    val scopedSet = scoped.map(_.path).toSet
    val withRows = prev.dataFiles
      .filter(f => scopedSet.contains(f.path))
      .map(f =>
      f -> f.liveRows.getOrElse(footerRowCount(root.resolve(f.path))))
    // files carrying deletion vectors are rewrite candidates regardless
    // of size: OPTIMIZE doubles as DV materialization (Delta's PURGE),
    // restoring anti-join-free reads and letting vacuum reclaim the DVs
    val picked = withRows.filter { case (f, n) =>
      n < targetRows || f.dvs.nonEmpty }
    if (picked.size < 2 && !picked.exists(_._1.dvs.nonEmpty)) return None
    if (picked.isEmpty) return None
    val small = picked.map(_._1)
    val df = readDataFiles(small, prev.schema)
    val added =
      if (isBucketed) ingest(df) // re-clusters per bucket
      else {
        val total = picked.map(_._2).sum
        val parts = math.max(1, math.ceil(total.toDouble / targetRows).toInt)
        ingest(df.coalesce(parts))
      }
    retractingOnFailure(added) {
      commitFiles(added, small.map(_.path), None, "optimize",
        baseVersion = Some(prev.version),
        conflictsWith = Some(_ => false)) // pure rewrite conflicts only on file overlap
    }
  }

  /** OPTIMIZE … ZORDER BY (Delta's multi-dimensional clustering): the
    * snapshot is rewritten ordered by the BIT-INTERLEAVED quantile
    * ranks of `zcols`, so every z-order column's values are
    * range-localized per file and the manifest min/max stats prune
    * scans on ANY of them — a linear sort localizes only its leading
    * column. Ranks come from one `percentile_approx` pass (16 quantile
    * buckets per column — skew-proof, unlike uniform width buckets on
    * min/max); the z-value is codegen'd integer bit arithmetic; the
    * clustered write is a range repartition + within-partition sort on
    * the z-value at ~`targetRows` rows per file. Full-table rewrite by
    * design (the clustering IS the product); emits no CDF rows. */
  def zorder(zcols: Seq[String], targetRows: Long): Option[Long] = {
    require(zcols.nonEmpty, "ZORDER BY needs at least one column")
    require(targetRows > 0)
    require(!isBucketed,
      "bucketed tables cluster by key hash; ZORDER applies to log-style tables")
    val prev = latestManifest
    zcols.foreach { c =>
      val f = prev.schema.fields.find(_.name == c)
      require(f.isDefined, s"unknown ZORDER column: $c")
      // quantile ranks need a numeric ordering; a string column would
      // rank via cast-to-double — a silent no-op (or an ANSI runtime
      // error), so refuse up front
      require(f.get.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
          || f.get.dataType == org.apache.spark.sql.types.TimestampType,
        s"ZORDER column $c must be numeric or timestamp, got ${f.get.dataType}")
    }
    if (prev.dataFiles.isEmpty) return None
    val df = readDataFiles(prev.dataFiles, prev.schema)
    val bits = 4 // 16 quantile buckets per dimension
    val pcts = typedLit((1 until (1 << bits)).map(_.toDouble / (1 << bits)))
    val qRow = df.select(zcols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000)).as(c)): _*)
      .head()
    val m = zcols.length
    val zval = zcols.zipWithIndex.map { case (c, j) =>
      val bs = Option(qRow.getSeq[Double](j)).getOrElse(Seq.empty)
      if (bs.isEmpty) lit(0) // all-null column: every row ranks 0
      else {
        // quantile rank: how many boundaries the value exceeds (nulls
        // fall through every `when` to rank 0)
        val rank = bs.map(b =>
          when(col(c).cast("double") > lit(b), 1).otherwise(0)).reduce(_ + _)
        // bit k of this column's rank lands at interleaved position k*m+j
        (0 until bits).map(k =>
          shiftleft(shiftright(rank, k).bitwiseAND(lit(1)), k * m + j))
          .reduce(_ + _)
      }
    }.reduce(_ + _)
    val total = prev.dataFiles
      .map(f => f.liveRows.getOrElse(footerRowCount(root.resolve(f.path)))).sum
    val parts = math.max(1, math.ceil(total.toDouble / targetRows).toInt)
    val added = ingest(df.withColumn(ZORDER_COL, zval)
      .repartitionByRange(parts, col(ZORDER_COL))
      .sortWithinPartitions(ZORDER_COL)
      .drop(ZORDER_COL))
    retractingOnFailure(added) {
      commitFiles(added, prev.dataFiles.map(_.path), None, "zorder",
        baseVersion = Some(prev.version), conflictsWith = Some(_ => true))
    }
  }

  /** Data files of version `v` that contain at least one row matching
    * `hit`. Two stages: manifest column-stats skipping first (driver
    * side, no IO — files whose [min,max]/null-count refute the
    * predicate never enter the scan), then one column-pruned,
    * pushdown-friendly scan of the survivors pins the exact set —
    * Delta's DELETE/UPDATE find-touched-files strategy. Matching is by
    * file name (names are UUIDs, unique). */
  /** The predicate's conjuncts resolved against `m.schema`, ready for
    * manifest-stats evaluation (driver side, no IO). */
  private def resolvedConjuncts(
      m: CommitManifest, hit: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Try {
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
      .filter(hit).queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.flatMap(FileSkipping.splitConjuncts)
  }.getOrElse(Seq.empty)

  /** Manifest entries that MAY hold a row matching `hit` by their
    * stats: partition values (exact min=max), footer column ranges,
    * null counts. Everything unprovable stays in. */
  private def statsCandidates(
      m: CommitManifest, hit: org.apache.spark.sql.Column): Seq[DataFile] =
    statsCandidatesFromConjuncts(m, resolvedConjuncts(m, hit))

  private def statsCandidatesFromConjuncts(
      m: CommitManifest,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[DataFile] = {
    // compiled probe: IN-lists sort once and binary-search per file
    // instead of rescanning the literal list per manifest entry
    val probe = FileSkipping.compile(conjuncts, m.schema)
    val survivors = m.dataFiles.filter(probe)
    // second stage: bucket-key hash ranges refute equality/IN probes on
    // the bucket key that value stats cannot (bucketed files cluster by
    // key HASH, so their key-value ranges are wide but their hash
    // ranges are tight — the same lossless proof Merge's write-side
    // candidate selection uses: key equality implies hash equality)
    val hashPruned = bucketHashSurvivors(m, conjuncts, survivors)
    // third stage: bloom sidecars refute equality/IN probes range
    // stats cannot (loaded lazily, only for files that survived stats)
    val probes = BloomIndex.probes(conjuncts)
    if (probes.isEmpty) hashPruned
    else hashPruned.filter(f => BloomIndex.mayMatch(root, f, probes))
  }

  /** Snapshot read scoped to `keyCol ∈ values` for a bounded but LARGE
    * key set (ADVICE r7 / VERDICT r8 #7): semantically
    * `snapshot().filter(col(keyCol).isin(values…))`, but the plan stays
    * O(1) in the key count —
    *
    *   - file pruning gets ONE driver-side `In(keyCol, literals)`
    *     conjunct built directly from the pre-collected values, so all
    *     three skipping stages fire (sorted-stats binary search, bucket
    *     hash ranges, bloom sidecars) without a k-literal Column ever
    *     entering analysis;
    *   - the residual row filter is a broadcast LEFT SEMI join against
    *     the same values, not a k-literal IN expression — no k-node
    *     expression tree to analyze/codegen, and a hashed lookup per
    *     row at execution.
    *
    * Null values never match (IN semantics). Callers with SMALL key
    * sets should keep `snapshotWhere(isin)` — a literal IN pushes into
    * parquet row-group filtering, which the semi-join cannot. */
  def snapshotForKeys(keyCol: String, values: Seq[Any]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal}
    val m = latestManifest
    val field = m.schema.fields.find(_.name == keyCol)
      .getOrElse(sys.error(s"snapshotForKeys: no column $keyCol"))
    val nonNull = values.filter(_ != null)
    if (nonNull.isEmpty)
      return readDataFiles(Seq.empty, m.schema)
    val lits = nonNull.map(v => Literal.create(v, field.dataType))
    val conjunct = In(
      AttributeReference(field.name, field.dataType, field.nullable)(), lits)
    val files = statsCandidatesFromConjuncts(m, Seq(conjunct))
    val keyDf = spark.createDataFrame(
      java.util.Arrays.asList(nonNull.distinct.map(org.apache.spark.sql.Row(_)): _*),
      org.apache.spark.sql.types.StructType(Seq(field.copy(nullable = false))))
    readDataFiles(files, m.schema)
      .join(broadcast(keyDf), Seq(keyCol), "left_semi")
  }

  /** Files of `files` that may contain one of the bucket-key values an
    * equality/IN conjunct lists, by (bucket id, `hash(key)` range) —
    * single-key bucketed tables only. Driver-side hashing runs the
    * identical Catalyst Murmur3 expression the write path's `hash()`
    * call compiles to, so probe and ingest hashing can never drift; a
    * literal whose type differs from the key's stays conservative
    * (Murmur3 hashes numeric widths differently). */
  private def bucketHashSurvivors(
      m: CommitManifest,
      conjuncts: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      files: Seq[DataFile]): Seq[DataFile] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, In, Literal, Murmur3Hash}
    val (key, n) = (m.bucketKeys, m.numBuckets) match {
      case (Some(Seq(k)), Some(n0)) => (k, n0)
      case _ => return files
    }
    val keyDt = m.schema.fields.find(_.name == key).map(_.dataType)
      .getOrElse(return files)
    val lits: Seq[Literal] = conjuncts.collectFirst {
      case EqualTo(a: AttributeReference, l: Literal) if a.name == key => Seq(l)
      case EqualTo(l: Literal, a: AttributeReference) if a.name == key => Seq(l)
      case In(a: AttributeReference, vs)
          if a.name == key && vs.forall(_.isInstanceOf[Literal]) =>
        vs.map(_.asInstanceOf[Literal])
    }.getOrElse(return files)
    if (lits.exists(l => l.value != null && l.dataType != keyDt)) return files
    val hs = lits.filter(_.value != null).map(l =>
      Murmur3Hash(Seq(l), 42)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Int])
    if (hs.isEmpty) return Seq.empty // `key = NULL` is never true
    // sorted per-bucket hash lists: each file's [minHash, maxHash] is
    // probed by binary search instead of rescanning its bucket's whole
    // probe list (ADVICE r7 — KEY_PRUNE_MAX-sized IN refreshes)
    val byBucket = hs.groupBy(h => java.lang.Math.floorMod(h, n))
      .map { case (b, v) => b -> v.map(_.toLong).distinct.sorted.toIndexedSeq }
    files.filter { f =>
      f.bucket match {
        case None => true // no bucket info: can contain anything
        case Some(b) => byBucket.get(b).exists { sorted =>
          (f.minHash, f.maxHash) match {
            case (Some(mn), Some(mx)) =>
              var lo = 0
              var hi = sorted.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (sorted(mid) < mn) lo = mid + 1 else hi = mid
              }
              lo < sorted.length && sorted(lo) <= mx
            case _ => true // no stats: can contain anything
          }
        }
      }
    }
  }

  /** Predicate-pruned snapshot read for library (non-SQL) callers: the
    * manifest's per-file stats eliminate files BEFORE any footer opens
    * — on a `PARTITIONED BY` table a partition-pinning predicate
    * collapses the scan to that partition's directory (exact min=max
    * stats), and on any table column-range conjuncts skip like the
    * catalog's pruning scan does. The residual filter still runs (and
    * pushes into parquet row groups), so results equal
    * `snapshot().filter(cond)` exactly. */
  def snapshotWhere(cond: org.apache.spark.sql.Column): DataFrame = {
    val m = latestManifest
    // the RAW predicate goes to stats evaluation — a null-guard wrapper
    // (coalesce) would hide every conjunct from mayMatch; null-vs-false
    // is immaterial for skipping (stats ignore nulls, and the residual
    // filter applies SQL semantics)
    readDataFiles(statsCandidates(m, cond), m.schema).filter(cond)
  }

  private def touchedFiles(
      m: CommitManifest, hit: org.apache.spark.sql.Column): Seq[DataFile] = {
    val candidates = statsCandidates(m, hit)
    if (candidates.isEmpty) return Seq.empty
    // DV-aware scan: a file whose only matching rows are already
    // tombstoned is NOT touched (a CoW rewrite would be wasted work; a
    // MoR delete would double-tombstone and emit phantom CDF rows)
    val names = VersionedTable.labeled(spark, s"table:touched-scan ${root.getFileName}") {
      readWithMeta(candidates, m.schema)
        .filter(hit).select(col("__file")).distinct()
        .collect()
    }.map(_.getString(0)).toSet
    m.dataFiles.filter(f => names.contains(f.path.split('/').last))
  }

  /** `DELETE FROM <table> WHERE cond` — rows where `cond` is TRUE are
    * removed (NULL keeps the row, SQL semantics). Strategy is per-table
    * ([[VersionedTable.PROP_DELETE_MODE]]):
    *
    *   - copy-on-write (default): only files containing a matching row
    *     are rewritten without those rows; the rest are inherited —
    *     O(touched files), the same file-scoping Delta's CoW DELETE
    *     performs;
    *   - merge-on-read (`'mor'`): position tombstones are written under
    *     `_dv/` and NO data file is rewritten — commit cost is
    *     O(matched rows), independent of file size (the property Delta
    *     shipped deletion vectors for: deleting one row from a 1 GB
    *     file costs one tiny parquet write, not a 1 GB rewrite). Reads
    *     subtract tombstones via [[readWithMeta]]'s anti-join until
    *     OPTIMIZE / compaction materializes them away.
    *
    * Emits `delete` CDF rows either way. `cond` must be deterministic
    * (it is evaluated in the touched-file scan and the rewrite/CDF
    * projections). */
  def deleteWhere(cond: org.apache.spark.sql.Column): Option[Long] = {
    val hit = coalesce(cond, lit(false))
    val prev = latestManifest
    // stats see the RAW predicate (a null-guard wrapper is opaque to
    // mayMatch; Filter null = no match = false, so scoping is identical)
    val touched = touchedFiles(prev, cond)
    if (touched.isEmpty) return None
    if (prev.properties.get(PROP_DELETE_MODE).exists(_.equalsIgnoreCase("mor")))
      return morDelete(prev, touched, hit)
    val touchedDf = readDataFiles(touched, prev.schema)
    val added = ingest(touchedDf.filter(!hit))
    retractingOnFailure(added) {
      commitFiles(added, touched.map(_.path),
        Some(touchedDf.filter(hit).withColumn("_change_type", lit("delete"))),
        "delete", baseVersion = Some(prev.version),
        conflictsWith = Some(_ => true))
    }
  }

  /** Merge-on-read DELETE: stages the live matching rows' `(__file,
    * __pos)` tombstones as small parquet files under `_dv/`, then
    * commits the touched manifest entries with the tombstone refs
    * attached — data files are untouched. The CDF `delete` rows are
    * derived from the staged tombstones (a semi-join), not a predicate
    * re-evaluation, so retries and the commit-time CDF write see the
    * identical row set. Vacuum keeps a DV file alive while any retained
    * manifest references it. */
  private def morDelete(
      prev: CommitManifest,
      touched: Seq[DataFile],
      hit: org.apache.spark.sql.Column): Option[Long] = {
    val tmp = root.resolve(s"$STAGING_DIR/dv-${UUID.randomUUID()}")
    // staged PARTITIONED BY the tombstoned data file (via a duplicated
    // column, so `__file` stays in the parquet data for the read-side
    // anti-join): each DV part file then covers exactly ONE data file
    // and attaches only to that manifest entry. Without the split every
    // touched entry referenced every tombstone file, so reading any one
    // file opened the whole commit's DV set (VERDICT r5/r6 wrong #4 —
    // read amplification O(touched files) per file).
    readWithMeta(touched, prev.schema).filter(hit)
      .select(col("__file"), col("__pos"))
      .withColumn("__pfile", col("__file"))
      .write.partitionBy("__pfile").mode("overwrite").parquet(tmp.toString)
    Files.createDirectories(root.resolve(DV_DIR))
    // data-file names are UUID-generated ([ingest]), so the partition
    // dir name `__pfile=<name>` needs no unescaping
    val dvByFile: Map[String, Seq[String]] = Using.resource(Files.list(tmp)) { s =>
      s.iterator.asScala
        .filter(_.getFileName.toString.startsWith("__pfile=")).toSeq
    }.map { dir =>
      val dataFile = dir.getFileName.toString.stripPrefix("__pfile=")
      val moved = Using.resource(Files.list(dir)) { s =>
        s.iterator.asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      }.map { p =>
        val name = s"${UUID.randomUUID()}.parquet"
        Files.move(p, root.resolve(DV_DIR).resolve(name),
          StandardCopyOption.ATOMIC_MOVE)
        s"$DV_DIR/$name"
      }
      dataFile -> moved
    }.toMap
    val dvPaths = dvByFile.values.flatten.toSeq
    deleteRecursively(tmp)
    def retract(): Unit =
      dvPaths.foreach(p => Files.deleteIfExists(root.resolve(p)))
    val dvDf = spark.read.parquet(dvPaths.map(p => root.resolve(p).toString): _*)
    // per-file tombstone counts keep liveRows exact — bounded by the
    // touched-file count, like every other metadata collect here
    val counts = dvDf.groupBy("__file").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) { retract(); return None }
    val updated = touched.flatMap { f =>
      val name = f.path.split('/').last
      val n = counts.getOrElse(name, 0L)
      if (n == 0L) None
      else Some(f.copy(dvs = f.dvs ++ dvByFile.getOrElse(name, Seq.empty),
        dvRows = Some(f.dvRows.getOrElse(0L) + n)))
    }
    val changes = readWithMeta(touched, prev.schema)
      .join(dvDf, Seq("__file", "__pos"), "left_semi")
      .select(prev.schema.fields.toIndexedSeq.map(f => col(f.name)): _*)
      .withColumn("_change_type", lit("delete"))
    val res =
      try commitFiles(updated, updated.map(_.path), Some(changes), "delete",
        baseVersion = Some(prev.version), conflictsWith = Some(_ => true))
      catch { case e: Throwable => retract(); throw e }
    if (res.isEmpty) retract()
    res
  }

  /** `ALTER TABLE SET TBLPROPERTIES`: merges `updates` into the table
    * properties as a metadata-only commit (readers of old versions keep
    * the old properties — they live in the manifest like the schema).
    * Setting a `graft.constraint.<name>` property installs a CHECK
    * constraint every subsequent append / replaceWhere / UPDATE
    * validates against. */
  def setProperties(updates: Map[String, String]): Option[Long] = {
    val base = latestManifest
    val merged = base.properties ++ updates
    if (merged == base.properties) None
    else commitFiles(Seq.empty, Seq.empty, None, "setproperties",
      baseVersion = Some(base.version), newProperties = Some(merged))
  }

  /** CHECK constraints (`graft.constraint.<name>` = boolean SQL expr)
    * evaluated against a batch of rows about to be written; a violation
    * fails the write LOUDLY with the constraint's name before any file
    * is committed (Delta's write-time constraint contract). NULL
    * evaluations count as violations (a constraint must hold, not
    * merely not-fail). Enforced on append / overwriteWhere / the
    * updateWhere post-image — and by [[Merge]] on the rows a merge
    * introduces (insert + update post-images). */
  private[table] def enforceConstraints(rows: DataFrame): Unit =
    properties.foreach { case (k, sql) =>
      if (k.startsWith(PROP_CONSTRAINT_PREFIX)) {
        val name = k.stripPrefix(PROP_CONSTRAINT_PREFIX)
        require(
          rows.filter(!coalesce(expr(sql).cast("boolean"), lit(false)))
            .isEmpty,
          s"CHECK constraint '$name' ($sql) violated by incoming rows")
      }
    }

  /** Delta's `replaceWhere` / SQL `INSERT INTO … REPLACE WHERE` /
    * `INSERT OVERWRITE`: in ONE atomic commit, rows matching `cond` are
    * deleted and `rows` inserted. Only files containing a match are
    * rewritten (their non-matching rows are preserved); every other
    * file is inherited — O(touched + batch), the partition-overwrite
    * idiom of incremental backfills ("replace this day's slice"). Like
    * Delta, every incoming row must SATISFY the predicate (otherwise
    * the operation would silently write outside the slice it claims to
    * replace — fails loudly instead). Emits `delete` CDF rows for the
    * replaced slice and `insert` rows for the new one. `cond` must be
    * deterministic. `overwriteAll` = `lit(true)` truncate-and-load. */
  def overwriteWhere(
      cond: org.apache.spark.sql.Column,
      rows: DataFrame): Option[Long] = {
    val hit = coalesce(cond, lit(false))
    val prev = latestManifest
    val newRows = align(rows)
    require(newRows.filter(!hit).isEmpty,
      "replaceWhere: every incoming row must satisfy the replaced predicate")
    enforceConstraints(newRows)
    val touched = touchedFiles(prev, cond)
    val touchedDf = readDataFiles(touched, prev.schema)
    // kept (non-matching rows of touched files) and new rows stage as
    // SEPARATE file sets so the CDF insert projection re-reads exactly
    // the new files — nothing nondeterministic is computed twice
    val keptAdded =
      if (touched.isEmpty) Seq.empty else ingest(touchedDf.filter(!hit))
    val newAdded = ingest(newRows)
    val changes =
      touchedDf.filter(hit).withColumn("_change_type", lit("delete"))
        .unionByName(readFiles(newAdded.map(_.path), schema)
          .withColumn("_change_type", lit("insert")))
    retractingOnFailure(keptAdded ++ newAdded) {
      commitFiles(keptAdded ++ newAdded, touched.map(_.path), Some(changes),
        "overwrite", baseVersion = Some(prev.version),
        conflictsWith = Some(_ => true))
    }
  }

  /** `UPDATE <table> SET ... WHERE cond`: rewrites only touched files,
    * applying `set` to matching rows; emits update_preimage/postimage
    * CDF rows. `cond` and `set` must be deterministic. */
  def updateWhere(
      cond: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]): Option[Long] = {
    require(set.nonEmpty, "UPDATE requires at least one SET assignment")
    val bad = set.keySet -- schema.fieldNames.toSet
    require(bad.isEmpty, s"SET references unknown columns: $bad")
    val hit = coalesce(cond, lit(false))
    val prev = latestManifest
    val touched = touchedFiles(prev, cond)
    if (touched.isEmpty) return None
    val touchedDf = readDataFiles(touched, prev.schema)
    val fields = prev.schema.fields
    val pre = touchedDf.filter(hit)
    val post = pre.select(fields.toIndexedSeq.map(f =>
      set.get(f.name).map(_.cast(f.dataType)).getOrElse(col(f.name)).as(f.name)): _*)
    enforceConstraints(post)
    val added = ingest(touchedDf.filter(!hit).unionByName(post))
    val changes = pre.withColumn("_change_type", lit("update_preimage"))
      .unionByName(post.withColumn("_change_type", lit("update_postimage")))
    retractingOnFailure(added) {
      commitFiles(added, touched.map(_.path), Some(changes), "update",
        baseVersion = Some(prev.version), conflictsWith = Some(_ => true))
    }
  }

  /** `RESTORE TABLE ... TO VERSION AS OF v` (Delta's RESTORE): commits
    * version `v`'s exact file listing (and schema) as the new latest
    * version — a metadata-only operation, no data is copied. Fails if
    * any of `v`'s files were vacuumed. Emits no CDF rows: restore is a
    * snapshot-level rollback; CDF consumers of a restored table must
    * rebuild from a fresh snapshot (as with Delta, whose restore CDF is
    * likewise not a logical change stream). */
  def restore(v: Long): Option[Long] = {
    val target = manifest(v)
    val prev = latestManifest
    target.dataFiles.find(f => !Files.exists(root.resolve(f.path))).foreach { f =>
      throw new IllegalStateException(
        s"cannot restore to version $v: file ${f.path} was vacuumed")
    }
    // a vacuumed DV would silently RESURRECT its deleted rows — refuse
    target.dataFiles.flatMap(_.dvs).distinct
      .find(d => !Files.exists(root.resolve(d))).foreach { d =>
        throw new IllegalStateException(
          s"cannot restore to version $v: deletion vector $d was vacuumed")
      }
    if (prev.dataFiles.map(_.path) == target.dataFiles.map(_.path)) return None
    commitFiles(target.dataFiles, prev.dataFiles.map(_.path), None, "restore",
      newSchemaJson = Some(target.schemaJson),
      baseVersion = Some(prev.version), conflictsWith = Some(_ => true))
  }

  /** Storage maintenance (Delta's VACUUM analog): drops manifests of all
    * but the most recent `retainVersions` versions, deletes data files
    * referenced ONLY by dropped manifests (file-granular liveness — a
    * shared file survives as long as any retained version lists it),
    * and trims CDF files.
    *
    * CDF retention contract: change files of RETAINED versions are never
    * deleted, and a caller-supplied `cdfLowWatermark` (the slowest
    * consumer's last processed version) further restricts deletion to
    * versions <= the watermark. The highest change version ever deleted
    * is recorded in `_changes/_vacuum_watermark`; CDF consumers check it
    * at start and fail loudly instead of silently skipping vacuumed
    * history ([[graft.streaming.CdcStreams.startGoldAggregate]]).
    * Returns the versions whose manifests were removed. */
  def vacuum(
      retainVersions: Int = 2,
      cdfLowWatermark: Option[Long] = None): Seq[Long] = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val vs = versions
    // retention cutoff, further lowered by the CDF consumer watermark:
    // versions whose change history a consumer still needs keep their
    // MANIFESTS too, so batch `changes()` (manifest-driven) can still
    // plan the retained history — files and manifests stay consistent
    val versionCutoff = vs.takeRight(retainVersions).head
    val cutoff = cdfLowWatermark.fold(versionCutoff)(w =>
      math.min(w + 1, versionCutoff))
    val retained = vs.filter(_ >= cutoff)
    val removed = vs.filter(_ < cutoff)
    // the oldest retained manifest may be a delta whose parent chain is
    // about to be deleted: materialize it as a full checkpoint first
    // (same resolved content, so concurrent readers see identical state
    // through either form)
    retained.headOption.filter(v => readRaw(v).deltaOf.isDefined).foreach { v =>
      val full = manifest(v)
      implicit val fmts: Formats = DefaultFormats
      val tmp = commitsDir.resolve(s".ckpt-$v-${UUID.randomUUID()}.json")
      Files.writeString(tmp, Serialization.write(full))
      Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    // file-granular liveness: keep anything a retained manifest lists.
    // Files outside this table's root (shallow-clone references) are
    // never deleted — the source table owns them (Delta's clone rule).
    val live = retained.flatMap(v => manifest(v).dataFiles.map(_.path)).toSet
    val dead = removed.flatMap(v => manifest(v).dataFiles.map(_.path)).toSet -- live
    dead.map(root.resolve).filter(_.startsWith(root))
      .foreach(Files.deleteIfExists)
    // deletion vectors have the same file-granular liveness as data
    // files: alive while ANY retained manifest references them (a DV
    // outlives the delete commit that wrote it — every later version
    // inherits the ref until a rewrite materializes it away)
    val liveDvs = retained.flatMap(v => manifest(v).dataFiles.flatMap(_.dvs)).toSet
    val deadDvs =
      removed.flatMap(v => manifest(v).dataFiles.flatMap(_.dvs)).toSet -- liveDvs
    deadDvs.map(root.resolve).filter(_.startsWith(root))
      .foreach(Files.deleteIfExists)
    // bloom sidecars share their data file's liveness (1:1 immutable)
    val liveBlooms =
      retained.flatMap(v => manifest(v).dataFiles.flatMap(_.bloomPath)).toSet
    val deadBlooms = removed.flatMap(v =>
      manifest(v).dataFiles.flatMap(_.bloomPath)).toSet -- liveBlooms
    deadBlooms.map(root.resolve).filter(_.startsWith(root))
      .foreach(Files.deleteIfExists)
    val deadChanges = changeFilesOnDisk.filter(_._1 < cutoff)
    deadChanges.foreach(c => Files.delete(c._2))
    // compacted CDF ranges: dead only when their WHOLE span predates
    // the cutoff (a partially-retained span must stay readable)
    val deadRanges = rangeDirsOnDisk.filter(_._2 < cutoff)
    deadRanges.foreach(r => deleteRecursively(r._3))
    if (deadChanges.nonEmpty || deadRanges.nonEmpty) {
      val newWm = (deadChanges.map(_._1) ++ deadRanges.map(_._2)).max
      val wmPath = changesDir.resolve(VACUUM_WATERMARK)
      val old = cdfVacuumWatermark.getOrElse(Long.MinValue)
      if (newWm > old) Files.writeString(wmPath, newWm.toString)
    }
    removed.foreach { v =>
      Files.deleteIfExists(manifestPath(v))
      manifestCache.remove(v)
      ()
    }
    removed
  }

  /** Highest CDF version ever deleted by [[vacuum]] — a consumer whose
    * progress is at or below this has an unrecoverable gap. */
  def cdfVacuumWatermark: Option[Long] = {
    val p = changesDir.resolve(VACUUM_WATERMARK)
    if (Files.exists(p)) Try(Files.readString(p).trim.toLong).toOption else None
  }

  /** Atomic manifest publish doubling as version CAS: a hard link fails
    * (atomically, at the filesystem level) if another writer already
    * published this version — the loser rebases or re-runs. */
  private def publish(m: CommitManifest): Unit = {
    implicit val fmts: Formats = DefaultFormats
    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(s".tmp-${m.version}-${UUID.randomUUID()}.json")
    Files.writeString(tmp, Serialization.write(m))
    try Files.createLink(manifestPath(m.version), tmp)
    finally Files.deleteIfExists(tmp)
  }
}

object VersionedTable {
  /** Runs `body` under a Spark job-description label (optimization
    * guide §1.5 — label your jobs), restoring the caller's description
    * after: engine-internal actions (staging writes, CDF writes,
    * pruning scans) become attributable in the UI / profilers instead
    * of anonymous "?" jobs. */
  private[graft] def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  val COMMITS_DIR = "_commits"
  val CHANGES_DIR = "_changes"
  val STAGING_DIR = "_staging"
  val DATA_DIR = "data"
  /** Partition column name used transiently while clustering CoW writes. */
  val BUCKET_COL = "__bucket"
  /** Staging-dir prefix of `PARTITIONED BY` alias columns: `ingest`
    * partitions the write by `__p_<col>` COPIES so the real columns
    * stay inside the data files; `moveIntoData` strips the prefix when
    * materializing the `col=value/` layout under `data/`. */
  val PART_PREFIX = "__p_"
  /** Materialized key-hash column in bucketed data files — source of the
    * footer-derived file-skipping stats; hidden from every reader by the
    * explicit read schemas. */
  val KHASH_COL = "__khash"
  /** Transient clustering column of [[VersionedTable.zorder]] rewrites;
    * dropped before the write, never lands in a file. */
  val ZORDER_COL = "__zorder"
  /** Property prefix of write-time CHECK constraints:
    * `graft.constraint.<name>` = a boolean SQL expression every written
    * row must satisfy. */
  val PROP_CONSTRAINT_PREFIX = "graft.constraint."
  /** Marker file recording the highest vacuumed CDF version. */
  val VACUUM_WATERMARK = "_vacuum_watermark"
  /** Marker file recording the highest CDF version folded into a
    * compacted range directory (streaming tail consumers at or below it
    * must backfill via batch [[VersionedTable.changes]]). */
  val COMPACT_WATERMARK = "_compact_watermark"
  /** Table property toggling CDF emission, mirroring
    * `delta.enableChangeDataFeed` (demo-notebook.py:225-227). */
  val PROP_CDF = "graft.enableChangeDataFeed"
  /** Deletion-vector directory: small parquet files of
    * `(__file, __pos)` tombstones referenced by manifest entries. */
  val DV_DIR = "_dv"
  /** Per-file bloom sidecar dir (see [[BloomIndex]]). */
  val BLOOM_DIR = "_bloom"
  /** Table property selecting DELETE's write strategy: `cow` (default —
    * rewrite touched files without the matching rows) or `mor` —
    * merge-on-read via deletion vectors (Delta's DV feature): DELETE
    * writes O(matched rows) of position tombstones and rewrites NO data
    * file; reads subtract the tombstones. The trade: delete latency
    * becomes independent of file size, read paths pay an anti-join
    * until OPTIMIZE/compact materializes. */
  val PROP_DELETE_MODE = "graft.delete.mode"
  /** Table property bounding rows per written data file (file sizing —
    * Delta's `maxRecordsPerFile` analog). Sorted bucket writes make the
    * split files cover disjoint key-hash ranges. */
  val PROP_MAX_RECORDS = "graft.write.maxRecordsPerFile"
  /** Comma-separated columns carrying a per-file bloom-filter sidecar
    * (Delta's bloom filter index analog): point/IN lookups on a
    * high-cardinality un-clustered column skip files whose bloom
    * refutes every probed value — range stats can't (a uniform hash
    * column spans the full range in every file). See [[BloomIndex]]. */
  val PROP_BLOOM_COLS = "graft.bloom.columns"
  /** Bloom sizing: bits per row (default 10 → ~0.9% false positives
    * with k=7). Per-file bit count = nextPow2(rows * bitsPerRow). */
  val PROP_BLOOM_BITS_PER_ROW = "graft.bloom.bitsPerRow"
  /** Table property setting the manifest checkpoint cadence: every N-th
    * version embeds the full file listing; the versions between are
    * O(delta) manifests resolved on read. */
  val PROP_CHECKPOINT_INTERVAL = "graft.checkpointInterval"

  def changeSchemaOf(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false),
      StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType, nullable = false)))

  def exists(path: String): Boolean =
    Files.isDirectory(Paths.get(path).resolve(COMMITS_DIR))

  /** CREATE TABLE (D2): publishes version 0 with an empty snapshot.
    * Pass `bucketBy` for a copy-on-write hash-bucketed table whose
    * merges rewrite only files overlapping the source's keys. */
  def create(
      spark: SparkSession,
      path: String,
      schema: StructType,
      properties: Map[String, String] = Map.empty,
      ifNotExists: Boolean = false,
      bucketBy: Option[BucketSpec] = None,
      partitionBy: Option[Seq[String]] = None): VersionedTable = {
    val root = Paths.get(path)
    if (exists(path)) {
      if (ifNotExists) return load(spark, path)
      throw new IllegalStateException(s"table already exists at $path")
    }
    bucketBy.foreach(b => require(
      b.keys.forall(schema.fieldNames.contains),
      s"bucket keys ${b.keys} must be schema columns"))
    partitionBy.foreach { pcols =>
      require(pcols.nonEmpty, "PARTITIONED BY needs at least one column")
      require(pcols.forall(schema.fieldNames.contains),
        s"partition columns $pcols must be schema columns")
      require(bucketBy.isEmpty,
        "a table is either hash-bucketed (CoW merge) or partitioned, not both")
    }
    Files.createDirectories(root)
    val t = new VersionedTable(spark, root)
    // one empty, schema-bearing file so catalog scans of version 0 have
    // a concrete footer to read; it carries no stats, so the first merge
    // treats it as a candidate and retires it
    val tmp = root.resolve(s"$STAGING_DIR/create-${UUID.randomUUID()}")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val files = t.moveIntoData(tmp, bucketed = false, schema.fields.toSeq)
    deleteRecursively(tmp)
    t.publish(CommitManifest(0L, "create", System.currentTimeMillis(),
      schema.json, properties, Map.empty,
      bucketBy.map(_.keys), bucketBy.map(_.numBuckets),
      dataFiles = files, addedFiles = files.map(_.path),
      partitionKeys = partitionBy))
    t
  }

  def load(spark: SparkSession, path: String): VersionedTable = {
    require(exists(path), s"no versioned table at $path")
    new VersionedTable(spark, Paths.get(path))
  }

  /** SHALLOW CLONE (Delta's `CREATE TABLE ... SHALLOW CLONE src`): a new
    * table whose version 0 references the source's CURRENT data files by
    * absolute path — a metadata-only copy, O(files), no data moved. The
    * clone evolves independently (merges/appends/deletes write its own
    * files; copy-on-write means the source is never modified), and its
    * `vacuum` never deletes source-owned files. The clone is pinned to
    * the files it saw: a later `vacuum` on the SOURCE can invalidate it
    * (Delta documents the same hazard). */
  def shallowClone(source: VersionedTable, path: String): VersionedTable = {
    require(!exists(path), s"table already exists at $path")
    val m = source.latestManifest
    val root = Paths.get(path)
    Files.createDirectories(root)
    val t = new VersionedTable(source.spark, root)
    val refs = m.dataFiles.map(f =>
      f.copy(path = source.root.resolve(f.path).toAbsolutePath.toString,
        dvs = f.dvs.map(d => source.root.resolve(d).toAbsolutePath.toString),
        bloomPath = f.bloomPath.map(b =>
          source.root.resolve(b).toAbsolutePath.toString)))
    t.publish(CommitManifest(0L, "clone", System.currentTimeMillis(),
      m.schemaJson, m.properties, Map.empty, m.bucketKeys, m.numBuckets,
      dataFiles = refs, addedFiles = refs.map(_.path),
      partitionKeys = m.partitionKeys))
    t
  }

  /** DROP TABLE (D1). */
  def drop(path: String): Unit = deleteRecursively(Paths.get(path))

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Using.resource(Files.walk(p))(_.iterator.asScala.toSeq)
        .reverse.foreach(Files.delete)
    }

  /** One shared Hadoop conf for driver-side footer reads: every
    * `new Configuration()` re-parses the default XML resources (the
    * stack profile showed Configuration$Parser in the commit path), and
    * footer stats read one file per written file per commit — the conf
    * is immutable here, so share a single instance. */
  private val footerConf = new org.apache.hadoop.conf.Configuration()

  /** Row count from the parquet footer — a driver-side metadata read,
    * no Spark job. */
  private[table] def footerRowCount(p: Path): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), footerConf)
    Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(in))(
      _.getRecordCount)
  }

  /** Per-file statistics harvested from one parquet footer read —
    * driver-side, no Spark job. */
  final private[table] case class FooterStats(
      rows: Long,
      khashMin: Option[Long], khashMax: Option[Long],
      mins: Map[String, String], maxs: Map[String, String],
      nulls: Map[String, Long])

  /** Spark types whose parquet footer min/max are harvested for data
    * skipping (ints/longs/dates/timestamps as long, floats as double,
    * strings as UTF8 — parquet binary-stat truncation, when enabled,
    * only ever widens bounds, so skipping on them stays sound). */
  private[table] def statable(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType |
         org.apache.spark.sql.types.StringType => true
    case _ => false
  }

  /** How many leading statable schema columns carry skipping stats
    * (Delta's `dataSkippingNumIndexedCols` analog). */
  private[table] val STAT_COLS_MAX = 8

  private def encodeStat(v: AnyRef, dt: DataType): Option[String] = v match {
    case l: java.lang.Long => Some(l.toString)
    case i: java.lang.Integer => Some(i.toString)
    case d: java.lang.Double => Some(d.toString)
    case f: java.lang.Float => Some(f.doubleValue.toString)
    case b: org.apache.parquet.io.api.Binary
        if dt == org.apache.spark.sql.types.StringType =>
      Some(b.toStringUsingUTF8)
    case _ => None
  }

  /** Row count, `__khash` range, and per-column min/max/null-count from
    * the parquet footer, aggregated across row groups. */
  private[table] def footerStats(p: Path, statFields: Seq[StructField]): FooterStats = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(p.toUri), footerConf)
    Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(in)) { r =>
      val blocks = r.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val byCol = blocks.flatMap(_.getColumns.asScala).groupBy(_.getPath.toDotString)
      def chunks(name: String) = byCol.getOrElse(name, Seq.empty)
      def valued(name: String) = chunks(name).map(_.getStatistics)
        .filter(s => s != null && s.hasNonNullValue)

      val kh = valued(KHASH_COL)
      val (khMin, khMax) =
        if (kh.isEmpty) (None, None)
        else (Some(kh.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min),
          Some(kh.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max))

      val fields = statFields.filter(f => statable(f.dataType)).take(STAT_COLS_MAX)
      val mins = Map.newBuilder[String, String]
      val maxs = Map.newBuilder[String, String]
      val nulls = Map.newBuilder[String, Long]
      fields.foreach { f =>
        val vs = valued(f.name)
        if (vs.nonEmpty && vs.size == chunks(f.name).size) {
          val encMin = vs.flatMap(s =>
            encodeStat(s.genericGetMin.asInstanceOf[AnyRef], f.dataType))
          val encMax = vs.flatMap(s =>
            encodeStat(s.genericGetMax.asInstanceOf[AnyRef], f.dataType))
          if (encMin.size == vs.size && encMax.size == vs.size) {
            mins += f.name -> minOf(encMin, f.dataType)
            maxs += f.name -> maxOf(encMax, f.dataType)
          }
        }
        val cs = chunks(f.name)
        if (cs.nonEmpty && cs.forall(c =>
            c.getStatistics != null && c.getStatistics.isNumNullsSet))
          nulls += f.name -> cs.map(_.getStatistics.getNumNulls).sum
      }
      FooterStats(rows, khMin, khMax, mins.result(), maxs.result(), nulls.result())
    }
  }

  private def minOf(enc: Seq[String], dt: DataType): String =
    enc.reduce((a, b) => if (FileSkipping.compareStats(a, b, dt).exists(_ <= 0)) a else b)
  private def maxOf(enc: Seq[String], dt: DataType): String =
    enc.reduce((a, b) => if (FileSkipping.compareStats(a, b, dt).exists(_ >= 0)) a else b)
}

/** Filesystem-backed 2-level namespace (database -> table) standing in
  * for the reference's catalog DDL (D1, demo-notebook.py:104-110): a
  * database is a directory under the warehouse root, a table a
  * [[VersionedTable]] directory inside it. */
final class GraftCatalog(spark: SparkSession, warehouseRoot: String) {
  private val rootPath = Paths.get(warehouseRoot)
  private def dbPath(db: String): Path = rootPath.resolve(db)
  private def tablePath(db: String, t: String): Path = dbPath(db).resolve(t)

  def createDatabase(db: String, ifNotExists: Boolean = true): Unit = {
    if (!ifNotExists && Files.isDirectory(dbPath(db)))
      throw new IllegalStateException(s"database $db already exists")
    Files.createDirectories(dbPath(db))
  }

  def dropDatabase(db: String, cascade: Boolean = false): Unit = {
    val p = dbPath(db)
    if (!Files.isDirectory(p)) return
    if (!cascade && listTables(db).nonEmpty)
      throw new IllegalStateException(s"database $db is not empty")
    VersionedTable.deleteRecursively(p)
  }

  def listTables(db: String): Seq[String] =
    if (!Files.isDirectory(dbPath(db))) Seq.empty
    else Using.resource(Files.list(dbPath(db))) { s =>
      s.iterator.asScala
        .filter(p => VersionedTable.exists(p.toString))
        .map(_.getFileName.toString).toSeq.sorted
    }

  def createTable(
      db: String,
      name: String,
      schema: StructType,
      properties: Map[String, String] = Map.empty,
      ifNotExists: Boolean = false): VersionedTable =
    VersionedTable.create(spark, tablePath(db, name).toString, schema,
      properties, ifNotExists)

  def dropTable(db: String, name: String): Unit =
    VersionedTable.drop(tablePath(db, name).toString)

  def table(db: String, name: String): VersionedTable =
    VersionedTable.load(spark, tablePath(db, name).toString)
}
