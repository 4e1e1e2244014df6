package graft.table

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** One commit of a [[VersionedTable]] — the JSON manifest under
  * `_commits/<version>.json`.
  *
  * `txn` carries the last applied streaming batch id per application id,
  * accumulated across commits — the idempotence token that makes
  * `foreachBatch` retries exactly-once (reference relies on Delta's
  * txnAppId/txnVersion for this; see
  * /root/reference/notebooks/demo-notebook.py:282-287 and SURVEY §7.5
  * risk 1: the Gold additive merge is NOT retry-safe without it).
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
    bucketOwners: Option[Map[String, Long]] = None) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
}

/** Hash-bucketing spec for copy-on-write tables: rows live in
  * `pmod(hash(keys), numBuckets)` buckets; each commit rewrites only
  * the buckets its merge touched and inherits the rest by reference
  * (the manifest's `bucketOwners` maps bucket → owning version). */
final case class BucketSpec(keys: Seq[String], numBuckets: Int) {
  require(numBuckets > 0, "numBuckets must be positive")
}

/** A versioned parquet table with commit log, Change Data Feed and time
  * travel — the native replacement for the Delta Lake features the
  * reference leans on (MERGE INTO, `table_changes`, `VERSION AS OF`,
  * `delta.enableChangeDataFeed`; /root/reference/notebooks/demo-notebook.py:
  * 213-227, 363-373, 428-431, 533-535). No Delta jars exist in this
  * environment (SURVEY §7.1), so the layer is built directly on parquet:
  *
  * {{{
  * <root>/
  *   _commits/<%020d version>.json   // manifest; atomic-rename commit
  *   v=<version>/part-*.parquet      // full snapshot of that version
  *   _changes/v<version>-*.parquet   // CDF rows of that commit (flat files
  *                                   // so a streaming source can tail the
  *                                   // directory without partition-column
  *                                   // inference)
  * }}}
  *
  * Readers resolve the latest version by listing `_commits`; data written
  * for a version is invisible until its manifest lands (write-data-first,
  * publish-manifest-last). The manifest rename is the commit point.
  * Single-writer per table is assumed (the pipeline's streaming writers
  * are serialized per table by Structured Streaming itself).
  *
  * == 100 TB design notes ==
  * At demo scale every commit rewrites the full snapshot. The layout is
  * deliberately chosen so the scale path is an incremental change, not a
  * redesign:
  *   - manifests can list *files* instead of a directory, enabling
  *     file-level copy-on-write (rewrite only files containing matched
  *     keys — Delta's strategy) with identical read semantics;
  *   - snapshots can be hash-bucketed by merge key so the merge join
  *     reads co-partitioned buckets instead of shuffling the full target;
  *   - the CDF directory is already append-only and O(changed rows), so
  *     Gold-style consumers never scale with table size — that property
  *     is the reference pipeline's entire reason to exist (SURVEY §4).
  */
final class VersionedTable private (
    val spark: SparkSession,
    val root: Path) {

  import VersionedTable._

  private def commitsDir: Path = root.resolve(COMMITS_DIR)
  private def changesDir: Path = root.resolve(CHANGES_DIR)
  private def manifestPath(v: Long): Path = commitsDir.resolve(f"$v%020d.json")
  private def snapshotDir(v: Long): Path = root.resolve(s"v=$v")

  /** Absolute path of the CDF directory — the streaming CDF source
    * (SURVEY §2.1 S5) tails this with `spark.readStream.parquet`. */
  def changesLocation: String = changesDir.toString

  def versions: Seq[Long] =
    Files.list(commitsDir).iterator.asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .flatMap(n => Try(n.stripSuffix(".json").toLong).toOption)
      .toSeq.sorted

  def latestVersion: Long = versions.max

  def manifest(v: Long): CommitManifest = {
    implicit val fmts: Formats = DefaultFormats
    Serialization.read[CommitManifest](Files.readString(manifestPath(v)))
  }

  def latestManifest: CommitManifest = manifest(latestVersion)

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

  /** Current snapshot. */
  def snapshot(): DataFrame = snapshotAt(latestVersion)

  /** Time travel — `VERSION AS OF v` (S8, demo-notebook.py:533-535).
    * For bucketed tables the snapshot of version v is the union of each
    * bucket's owning version's files, per v's manifest — reads touch
    * every live bucket but NO rewriting ever happened to produce them.
    */
  def snapshotAt(v: Long): DataFrame = {
    val m = manifest(v) // throws for unknown versions
    val dirs = snapshotDirsAt(v)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(dirs: _*)
  }

  /** The concrete parquet directories backing version `v` — for
    * unbucketed tables the version's own dir; for copy-on-write tables
    * each bucket's owning directory. Used by the DSv2 catalog to hand
    * Spark a pushdown-capable scan of any version. */
  def snapshotDirsAt(v: Long): Seq[String] = manifest(v).bucketOwners match {
    case Some(owners) =>
      owners.toSeq
        .map { case (b, ownerV) => snapshotDir(ownerV).resolve(s"$BUCKET_COL=$b") }
        .filter(Files.isDirectory(_)) // a touched bucket can end empty
        .map(_.toString)
    case None =>
      Seq(snapshotDir(v).toString).filter(d => Files.isDirectory(Paths.get(d)))
  }

  /** Reads ONLY the given buckets of the current snapshot (copy-on-
    * write pruning: the merge engine joins against just the buckets the
    * source batch touches). */
  def snapshotBuckets(buckets: Seq[Int]): DataFrame = {
    val m = latestManifest
    val owners = m.bucketOwners.getOrElse(
      throw new IllegalStateException("snapshotBuckets on an unbucketed table"))
    val dirs = buckets
      .flatMap(b => owners.get(b.toString)
        .map(ownerV => snapshotDir(ownerV).resolve(s"$BUCKET_COL=$b")))
      .filter(Files.isDirectory(_))
      .map(_.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], m.schema)
    else spark.read.schema(m.schema).parquet(dirs: _*)
  }

  /** Last batch id committed under `appId`, for idempotent replays. */
  def lastTxn(appId: String): Option[Long] = latestManifest.txn.get(appId)

  /** CDF schema = table schema + the three change-metadata columns
    * (demo-notebook.py:363-371). */
  def changeSchema: StructType = changeSchemaOf(schema)

  /** Batch CDF read — `table_changes(name, from [, to])` (S7,
    * demo-notebook.py:371). Versions with no changes contribute nothing.
    */
  def changes(fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    val hi = toVersion.getOrElse(latestVersion)
    val files = changeFiles.collect {
      case (v, p) if v >= fromVersion && v <= hi => p.toString
    }
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], changeSchema)
    else spark.read.schema(changeSchema).parquet(files: _*)
  }

  private def changeFiles: Seq[(Long, Path)] =
    if (!Files.isDirectory(changesDir)) Seq.empty
    else Files.list(changesDir).iterator.asScala.flatMap { p =>
      val n = p.getFileName.toString
      // layout: v<version>-<original part file name>.parquet
      if (n.startsWith("v") && n.contains("-") && n.endsWith(".parquet"))
        Try(n.substring(1, n.indexOf('-')).toLong).toOption.map(_ -> p)
      else None
    }.toSeq

  /** Commits `newSnapshot` (and optionally CDF rows) as the next version.
    *
    * `changeRows` must already carry `_change_type`; the commit stamps
    * `_commit_version` / `_commit_timestamp` (pre/postimages of one
    * commit share both — demo-notebook.py:369). Both DataFrames should
    * read from already-materialized data (the merge engine stages its
    * join once, then feeds projections here) so nothing nondeterministic
    * is computed twice.
    *
    * If `txn = Some(appId -> batchId)` and that batch id is already
    * recorded, the commit is skipped and `None` is returned — this is
    * the exactly-once guard for `foreachBatch` retries (D5).
    */
  /** Commits a new version.
    *
    * Unbucketed tables: `newSnapshot` is the FULL next snapshot.
    * Bucketed tables (copy-on-write): `newSnapshot` must carry a
    * `__bucket` column and contain ONLY the rows of `touchedBuckets`;
    * those buckets' files are written under this version and every
    * other bucket is inherited by reference via `bucketOwners` — the
    * write cost is O(touched data), never O(table).
    */
  def commit(
      newSnapshot: DataFrame,
      changeRows: Option[DataFrame],
      operation: String,
      txn: Option[(String, Long)] = None,
      touchedBuckets: Option[Seq[Int]] = None): Option[Long] = {
    val prev = latestManifest
    val alreadyApplied = txn.exists { case (appId, batchId) =>
      prev.txn.get(appId).exists(_ >= batchId)
    }
    if (alreadyApplied) return None
    val v = prev.version + 1
    val ts = System.currentTimeMillis()

    val newOwners = (prev.bucketOwners, touchedBuckets) match {
      case (Some(owners), Some(touched)) =>
        Some(owners ++ touched.map(b => b.toString -> v))
      case (Some(owners), None) =>
        throw new IllegalArgumentException(
          "bucketed table commits must pass touchedBuckets")
      case (None, Some(_)) =>
        throw new IllegalArgumentException(
          "touchedBuckets passed for an unbucketed table")
      case (None, None) => None
    }
    if (newOwners.isDefined)
      newSnapshot.write.mode("overwrite").partitionBy(BUCKET_COL)
        .parquet(snapshotDir(v).toString)
    else
      newSnapshot.write.mode("overwrite").parquet(snapshotDir(v).toString)

    // Stale files from a previously failed (unpublished) attempt at this
    // version must not survive into the retry's change set.
    changeFiles.collect { case (`v`, p) => p }.foreach(Files.delete)
    changeRows.filter(_ => cdfEnabled).foreach { ch =>
      val tmp = root.resolve(s"$STAGING_DIR/changes-$v-${UUID.randomUUID()}")
      ch.withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp", timestamp_millis(lit(ts)))
        .write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(changesDir)
      Files.list(tmp).iterator.asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach { p =>
          Files.move(p, changesDir.resolve(s"v$v-${p.getFileName}"),
            StandardCopyOption.ATOMIC_MOVE)
        }
      deleteRecursively(tmp)
    }

    val m = CommitManifest(v, operation, ts, prev.schemaJson, prev.properties,
      prev.txn ++ txn.toMap, prev.bucketKeys, prev.numBuckets, newOwners)
    publish(m)
    Some(v)
  }

  /** Appends rows to the current snapshot as a new version (Bronze-style
    * append, S3). CDF for appends = plain 'insert' rows. */
  def append(rows: DataFrame, txn: Option[(String, Long)] = None): Option[Long] = {
    require(!isBucketed,
      "append is for log-style tables; bucketed (CoW) tables are maintained by merge")
    val aligned = align(rows)
    // Stage the incoming micro-batch once so snapshot + CDF projections
    // don't recompute nondeterministic inputs (current_timestamp etc.).
    val tmp = root.resolve(s"$STAGING_DIR/append-${UUID.randomUUID()}")
    aligned.write.mode("overwrite").parquet(tmp.toString)
    val staged = spark.read.schema(schema).parquet(tmp.toString)
    val res = commit(
      snapshot().unionByName(staged),
      Some(staged.withColumn("_change_type", lit("insert"))),
      "append", txn)
    deleteRecursively(tmp)
    res
  }

  private def align(df: DataFrame): DataFrame = {
    val cols = schema.fields.map(f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name))
    df.select(cols.toIndexedSeq: _*)
  }

  /** Compaction (OPTIMIZE analog): rewrites the current snapshot as one
    * fresh version — for copy-on-write tables this re-owns every live
    * bucket, collapsing the cross-version file scatter accumulated by
    * incremental merges so a following [[vacuum]] can reclaim all older
    * version directories. Emits no CDF rows (compaction changes no row
    * content). */
  def compact(): Option[Long] = bucketSpec match {
    case Some(BucketSpec(keys, n)) =>
      val full = snapshot().withColumn(BUCKET_COL,
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(
            keys.map(org.apache.spark.sql.functions.col): _*),
          lit(n)).cast("int"))
      val touched = latestManifest.bucketOwners.get.keys.map(_.toInt).toSeq.sorted
      commit(full, None, "compact", touchedBuckets = Some(touched))
    case None =>
      commit(snapshot(), None, "compact")
  }

  /** Storage maintenance: drops snapshots, change files and manifests
    * of all but the most recent `retainVersions` versions (Delta's
    * VACUUM analog — time travel to vacuumed versions becomes
    * unavailable; CDF consumers must have advanced past them). The
    * latest version is never removed, and for copy-on-write tables a
    * version's data directory survives as long as ANY retained
    * manifest still references one of its buckets. Returns the
    * versions whose manifests were removed. */
  def vacuum(retainVersions: Int = 2): Seq[Long] = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val vs = versions
    val retained = vs.takeRight(retainVersions)
    val cutoff = retained.head
    val removed = vs.filter(_ < cutoff)
    // data dirs still referenced by retained manifests (CoW inheritance)
    val live: Set[Long] = retained.toSet ++
      retained.flatMap(v => manifest(v).bucketOwners.toSeq.flatMap(_.values))
    removed.foreach { v =>
      if (!live.contains(v)) VersionedTable.deleteRecursively(snapshotDir(v))
      changeFiles.collect { case (`v`, p) => p }.foreach(Files.delete)
      Files.deleteIfExists(manifestPath(v))
    }
    removed
  }

  private def publish(m: CommitManifest): Unit = {
    implicit val fmts: Formats = DefaultFormats
    Files.createDirectories(commitsDir)
    val tmp = commitsDir.resolve(s".tmp-${m.version}-${UUID.randomUUID()}.json")
    Files.writeString(tmp, Serialization.write(m))
    Files.move(tmp, manifestPath(m.version), StandardCopyOption.ATOMIC_MOVE)
  }
}

object VersionedTable {
  val COMMITS_DIR = "_commits"
  val CHANGES_DIR = "_changes"
  val STAGING_DIR = "_staging"
  /** Partition column name for copy-on-write bucket directories. */
  val BUCKET_COL = "__bucket"
  /** Table property toggling CDF emission, mirroring
    * `delta.enableChangeDataFeed` (demo-notebook.py:225-227). */
  val PROP_CDF = "graft.enableChangeDataFeed"

  def changeSchemaOf(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType, nullable = false)))

  def exists(path: String): Boolean =
    Files.isDirectory(Paths.get(path).resolve(COMMITS_DIR))

  /** CREATE TABLE (D2): publishes version 0 with an empty snapshot.
    * Pass `bucketBy` for a copy-on-write hash-bucketed table whose
    * merges rewrite only touched buckets. */
  def create(
      spark: SparkSession,
      path: String,
      schema: StructType,
      properties: Map[String, String] = Map.empty,
      ifNotExists: Boolean = false,
      bucketBy: Option[BucketSpec] = None): VersionedTable = {
    val root = Paths.get(path)
    if (exists(path)) {
      if (ifNotExists) return load(spark, path)
      throw new IllegalStateException(s"table already exists at $path")
    }
    bucketBy.foreach(b => require(
      b.keys.forall(schema.fieldNames.contains),
      s"bucket keys ${b.keys} must be schema columns"))
    Files.createDirectories(root)
    val t = new VersionedTable(spark, root)
    if (bucketBy.isEmpty) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      empty.write.mode("overwrite").parquet(root.resolve("v=0").toString)
    }
    t.publish(CommitManifest(0L, "create", System.currentTimeMillis(),
      schema.json, properties, Map.empty,
      bucketBy.map(_.keys), bucketBy.map(_.numBuckets),
      bucketBy.map(_ => Map.empty[String, Long])))
    t
  }

  def load(spark: SparkSession, path: String): VersionedTable = {
    require(exists(path), s"no versioned table at $path")
    new VersionedTable(spark, Paths.get(path))
  }

  /** DROP TABLE (D1). */
  def drop(path: String): Unit = deleteRecursively(Paths.get(path))

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.delete)
    }
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
    else Files.list(dbPath(db)).iterator.asScala
      .filter(p => VersionedTable.exists(p.toString))
      .map(_.getFileName.toString).toSeq.sorted

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
