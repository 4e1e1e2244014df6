package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained GROUP BY aggregate view — the reference's
  * Gold-table signed-delta algorithm
  * (/root/reference/notebooks/demo-notebook.py:386-425) generalized
  * from the demo's hard-wired `(country, sum_visitors)` into a
  * reusable, self-describing component over ANY CDF-enabled source:
  *
  *   `V = SELECT g…, count(*) AS n_rows, sum(e1) AS s1, …
  *        FROM source GROUP BY g…`
  *
  * maintained from the source's change feed:
  *
  *   1. changes since the recorded watermark get sign −1 for
  *      `update_preimage`/`delete`, +1 otherwise (the demo's CASE,
  *      demo-notebook.py:401-413);
  *   2. one hash aggregation folds them to per-group deltas —
  *      O(changed rows), never a source scan (COUNT and SUM are
  *      self-maintainable: the delta is all the information needed);
  *   3. a three-clause additive [[Merge]] applies them: a group whose
  *      row count reaches zero is DELETED (the demo never shrinks;
  *      a correct general view must), surviving groups update
  *      additively, new groups insert.
  *
  * The additive update is NOT idempotent, so — unlike
  * [[JoinView]]'s convergent recompute — exactly-once rests on the
  * merge txn guard: the source version rides as the batch id and a
  * replayed refresh is a structural no-op (SURVEY §7.5 risk 1, the
  * same guard the Gold stream uses).
  *
  * Sum expressions must be exact types (integers / DECIMAL) for the
  * incremental result to equal a from-scratch recompute bit-for-bit —
  * double addition is order-sensitive and an incrementally-built double
  * sum drifts from a scan-order sum (AggViewSpec pins the invariant;
  * the q_agg_view oracle hashes it cross-engine via integer cents).
  */
final class AggView private (
    val table: VersionedTable,
    groupCols: Seq[String],
    sums: Seq[(String, String)]) {
  import AggView._

  private def spark: SparkSession = table.spark

  /** Per-group deltas of one change batch (`sums` exprs evaluate
    * against source-shaped change rows). */
  private def deltas(changes: DataFrame): DataFrame = {
    val sign = when(
      col("_change_type").isin("update_preimage", "delete"), lit(-1L))
      .otherwise(lit(1L))
    changes
      .withColumn("__sign", sign)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__sign")).as("d_n"),
        sums.map { case (name, e) =>
          sum(col("__sign") * expr(e)).as(s"d_$name")
        }: _*)
  }

  private def clauses: Seq[MergeClause] = Seq(
    WhenMatchedDelete(Some(col("target.n_rows") + col("source.d_n") === 0L)),
    WhenMatchedUpdate(set =
      Map("n_rows" -> (col("target.n_rows") + col("source.d_n"))) ++
        sums.map { case (name, _) =>
          s"sum_$name" ->
            (coalesce(col(s"target.sum_$name"), lit(0L)) +
              coalesce(col(s"source.d_$name"), lit(0L)))
        }),
    WhenNotMatchedInsert(values =
      groupCols.map(g => g -> col(s"source.$g")).toMap ++
        Map("n_rows" -> col("source.d_n")) ++
        sums.map { case (name, _) => s"sum_$name" -> col(s"source.d_$name") }))

  /** Applies all source changes the view has not seen; a replayed
    * refresh (crash + rerun) is a no-op via the txn guard. */
  def refresh(source: VersionedTable): Option[Long] = {
    val latest = source.latestVersion
    val since = table.lastTxn(APP).getOrElse(0L) + 1
    if (latest < since) return None
    Merge.run(table, deltas(source.changes(since)), groupCols, clauses,
      txn = Some(APP -> latest))
    Some(table.latestVersion)
  }

  /** Refresh against the source recorded at build time. */
  def refresh(): Option[Long] =
    refresh(VersionedTable.load(spark,
      table.latestManifest.properties(PROP_SOURCE)))
}

object AggView {
  val APP = "agg-view"
  val PROP_GROUP_COLS = "graft.aggview.groupCols"
  val PROP_SUMS = "graft.aggview.sums"
  val PROP_SOURCE = "graft.aggview.source"

  /** Creates the view table and computes it fully once from the
    * source's current snapshot; the definition + source path persist as
    * properties. `sums` are (name, SQL expression) pairs evaluated per
    * source row — use exact (integer / DECIMAL) expressions. */
  def build(
      source: VersionedTable,
      path: String,
      groupCols: Seq[String],
      sums: Seq[(String, String)]): AggView = {
    require(groupCols.nonEmpty, "an aggregate view needs group columns")
    val spark = source.spark
    val full = source.snapshot()
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        sums.map { case (name, e) => sum(expr(e)).as(s"sum_$name") }: _*)
    // all-nullable view schema: count(*) infers NOT NULL, which the
    // merge's conditional action struct (nullable by construction)
    // cannot cast into
    val viewSchema = org.apache.spark.sql.types.StructType(
      full.schema.fields.map(_.copy(nullable = true)))
    val t = VersionedTable.create(spark, path, viewSchema,
      Map(
        VersionedTable.PROP_CDF -> "true",
        PROP_GROUP_COLS -> groupCols.mkString(","),
        PROP_SUMS -> sums.map { case (n, e) => s"$n:$e" }.mkString(";"),
        PROP_SOURCE -> source.root.toAbsolutePath.toString))
    val v = new AggView(t, groupCols, sums)
    t.append(full)
    // watermark: everything up to the source's current version is in
    // the full compute
    t.commitFiles(Seq.empty, Seq.empty, None, "aggview-watermark",
      extraTxn = Map(APP -> source.latestVersion))
    v
  }

  /** Loads a view from its own recorded definition. */
  def load(spark: SparkSession, path: String): AggView = {
    val t = VersionedTable.load(spark, path)
    val p = t.latestManifest.properties
    require(p.contains(PROP_GROUP_COLS),
      s"$path is not a materialized aggregate view")
    val sums = p(PROP_SUMS).split(';').toSeq.filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf(':')
      kv.substring(0, i) -> kv.substring(i + 1)
    }
    new AggView(t, p(PROP_GROUP_COLS).split(',').toSeq, sums)
  }
}
