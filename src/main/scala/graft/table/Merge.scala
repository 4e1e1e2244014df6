package graft.table

import java.util.UUID

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One conditional action of a multi-clause MERGE (D3/D4). Conditions
  * reference the two sides as `col("source.x")` / `col("target.x")`,
  * exactly like the SQL form's qualified names.
  */
sealed trait MergeClause {
  def condition: Option[Column]
}
/** `WHEN MATCHED [AND cond] THEN DELETE`. */
final case class WhenMatchedDelete(condition: Option[Column] = None) extends MergeClause
/** `WHEN MATCHED [AND cond] THEN UPDATE SET ...`; empty `set` means
  * `UPDATE SET *` (every target column takes the like-named source
  * column, demo-notebook.py:277). */
final case class WhenMatchedUpdate(
    condition: Option[Column] = None,
    set: Map[String, Column] = Map.empty) extends MergeClause
/** `WHEN NOT MATCHED [AND cond] THEN INSERT ...`; empty `values` means
  * `INSERT *` (demo-notebook.py:279). */
final case class WhenNotMatchedInsert(
    condition: Option[Column] = None,
    values: Map[String, Column] = Map.empty) extends MergeClause

final case class MergeStats(
    version: Option[Long],
    inserted: Long,
    updated: Long,
    deleted: Long)

/** Native multi-clause MERGE INTO over a [[VersionedTable]] — the
  * operator the reference delegates to Delta Lake
  * (/root/reference/notebooks/demo-notebook.py:245-280 Silver upsert,
  * :394-425 Gold additive aggregate), rebuilt as one declarative Spark
  * plan:
  *
  *  1. full-outer equi-join of target snapshot and source on the key
  *     columns (J2/J3) — ONE shuffle, key-partitioned, subsumes the
  *     matched/not-matched split;
  *  2. first-match-wins clause dispatch as an ordered `when` chain
  *     (SQL MERGE clause order semantics) producing an action id plus
  *     the clause's result row as a struct — all codegen'd expressions,
  *     no UDFs;
  *  3. the action-annotated join output is staged to parquet ONCE, then
  *     the new snapshot and the CDF rows (insert / delete /
  *     update_preimage / update_postimage) are cheap columnar
  *     projections of the staging data — nondeterministic inputs
  *     (`current_timestamp` audit columns) are computed exactly once,
  *     and a commit failure can always be retried from the staging.
  *
  * Unmatched target rows pass through untouched; matched rows matching
  * no clause are kept (that is how the `data_hash` guard suppresses
  * inter-batch duplicates: the UPDATE clause's condition fails and no
  * CDF row is emitted, demo-notebook.py:273-277); source rows matching
  * no NOT-MATCHED clause are dropped.
  *
  * == Scale notes ==
  * The join is a plain shuffled hash join Catalyst/AQE plans freely
  * (broadcast when the source batch is small — the common CDC case).
  * Source must have at most one row per key (callers dedup first, as the
  * reference does with ROW_NUMBER, demo-notebook.py:263-267); set
  * `validateUniqueKeys` to fail fast instead of corrupting the snapshot.
  *
  * For tables created with a [[BucketSpec]], the merge is COPY-ON-WRITE:
  * only the hash buckets the source batch touches are read into the
  * join and rewritten; every other bucket is inherited by manifest
  * reference. A small CDC batch against a huge Silver table therefore
  * costs O(batch + touched buckets), not O(table) — the property that
  * makes the design hold at 100 TB. Unbucketed tables keep the simple
  * full-snapshot rewrite (right for small aggregates like Gold).
  */
object Merge {

  private val KEEP = -1

  def run(
      table: VersionedTable,
      source: DataFrame,
      onKeys: Seq[String],
      clauses: Seq[MergeClause],
      txn: Option[(String, Long)] = None,
      validateUniqueKeys: Boolean = false): MergeStats = {
    require(onKeys.nonEmpty, "merge requires at least one key column")
    require(clauses.nonEmpty, "merge requires at least one clause")
    val spark = table.spark
    val targetFields = table.schema.fields
    val srcCols = source.columns.toSet

    if (validateUniqueKeys) {
      val dups = source.groupBy(onKeys.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      require(dups == 0L,
        s"source has multiple rows for a merge key ${onKeys.mkString(",")}")
    }

    // Copy-on-write pruning for bucketed tables: the join reads ONLY the
    // buckets the source touches; untouched buckets are inherited by
    // reference at commit. (The source's KEY columns are evaluated once
    // here and once in the join — keys must be deterministic, which CDC
    // keys are; non-key source expressions are still evaluated exactly
    // once, inside the staged join.)
    val bucketed = table.bucketSpec.map { case BucketSpec(bkeys, n) =>
      require(bkeys == onKeys,
        s"merge keys $onKeys must equal the table's bucket keys $bkeys")
      val touched = source
        .select(pmod(hash(onKeys.map(col): _*), lit(n)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      (touched, n)
    }
    val targetDf = bucketed match {
      case Some((touched, _)) => table.snapshotBuckets(touched)
      case None => table.snapshot()
    }

    val t = targetDf.withColumn("__t_present", lit(true)).alias("target")
    val s = source.withColumn("__s_present", lit(true)).alias("source")
    val joinCond = onKeys.map(k => col(s"target.$k") === col(s"source.$k"))
      .reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val tPresent = col("__t_present").isNotNull
    val sPresent = col("__s_present").isNotNull
    val matched = tPresent && sPresent

    // Result row of clause i, as a struct in target-schema order/types.
    def resultStruct(c: MergeClause): Column = {
      val fields = targetFields.map { f =>
        val v = c match {
          case WhenMatchedUpdate(_, set) if set.nonEmpty =>
            set.getOrElse(f.name, col(s"target.${f.name}"))
          case _: WhenMatchedUpdate =>
            if (srcCols(f.name)) col(s"source.${f.name}") else col(s"target.${f.name}")
          case WhenNotMatchedInsert(_, values) if values.nonEmpty =>
            values.getOrElse(f.name, lit(null))
          case _: WhenNotMatchedInsert =>
            if (srcCols(f.name)) col(s"source.${f.name}") else lit(null)
          case _: WhenMatchedDelete => lit(null)
        }
        v.cast(f.dataType).as(f.name)
      }
      struct(fields.toIndexedSeq: _*)
    }

    // First-match-wins action dispatch: an ordered when-chain over the
    // clauses, exactly SQL MERGE's clause-order semantics.
    val indexed = clauses.zipWithIndex
    val action = indexed.foldLeft(Option.empty[Column]) { case (acc, (c, i)) =>
      val applies = c match {
        case _: WhenNotMatchedInsert =>
          !tPresent && sPresent && c.condition.getOrElse(lit(true))
        case _ =>
          matched && c.condition.getOrElse(lit(true))
      }
      Some(acc.fold(when(applies, lit(i)))(_.when(applies, lit(i))))
    }.get.otherwise(when(tPresent, lit(KEEP)))

    val rowType = org.apache.spark.sql.types.StructType(targetFields)
    val newRow = indexed
      .filter { case (c, _) => !c.isInstanceOf[WhenMatchedDelete] }
      .foldLeft(Option.empty[Column]) { case (acc, (c, i)) =>
        val st = resultStruct(c)
        val cond = col("__action") === i
        Some(acc.fold(when(cond, st))(_.when(cond, st)))
      }
      .getOrElse(lit(null)).cast(rowType)

    val targetStruct = when(tPresent,
      struct(targetFields.toIndexedSeq.map(f => col(s"target.${f.name}").as(f.name)): _*))

    val staged = joined
      .withColumn("__action", action)
      .filter(col("__action").isNotNull) // drop source rows no clause inserts
      .select(col("__action"), targetStruct.as("__t"), newRow.as("__new"))

    val stagingDir = table.root.resolve(
      s"${VersionedTable.STAGING_DIR}/merge-${UUID.randomUUID()}")
    staged.write.mode("overwrite").parquet(stagingDir.toString)
    try {
      val st = spark.read.parquet(stagingDir.toString)

      val deleteIds = indexed.collect { case (_: WhenMatchedDelete, i) => i }
      val updateIds = indexed.collect { case (_: WhenMatchedUpdate, i) => i }
      val insertIds = indexed.collect { case (_: WhenNotMatchedInsert, i) => i }
      def in(ids: Seq[Int]): Column =
        if (ids.isEmpty) lit(false) else col("__action").isin(ids: _*)

      val flat = st.filter(!in(deleteIds))
        .select(coalesce(col("__new"), col("__t")).as("r"))
        .select(col("r.*"))
      val newSnapshot = bucketed match {
        case Some((_, n)) => flat.withColumn(VersionedTable.BUCKET_COL,
          pmod(hash(onKeys.map(col): _*), lit(n)).cast("int"))
        case None => flat
      }

      val changes = {
        def side(ids: Seq[Int], structCol: String, changeType: String) =
          st.filter(in(ids)).select(col(s"$structCol.*"))
            .withColumn("_change_type", lit(changeType))
        side(insertIds, "__new", "insert")
          .unionByName(side(deleteIds, "__t", "delete"))
          .unionByName(side(updateIds, "__t", "update_preimage"))
          .unionByName(side(updateIds, "__new", "update_postimage"))
      }

      val version = table.commit(newSnapshot, Some(changes), "merge", txn,
        touchedBuckets = bucketed.map(_._1))
      val counts = st.groupBy(col("__action")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      def total(ids: Seq[Int]) = ids.map(i => counts.getOrElse(i, 0L)).sum
      MergeStats(version, total(insertIds), total(updateIds), total(deleteIds))
    } finally {
      VersionedTable.deleteRecursively(stagingDir)
    }
  }
}
