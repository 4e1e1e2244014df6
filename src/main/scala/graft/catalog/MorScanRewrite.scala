package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, DeleteFromTable, InsertIntoStatement, LogicalPlan, OverwriteByExpression, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.table.VersionedTable

/** Marker on catalog tables whose manifest carries merge-on-read
  * deletion vectors: `Some((table, version))` when tombstones must be
  * subtracted, `None` for plain parquet-scannable versions. */
trait DvRead {
  def dvTable: Option[(VersionedTable, Long)]
}

/** Analysis rule (installed by
  * `spark.sql.extensions=graft.functions.GraftExtensions`) that serves
  * SQL reads of deletion-vector'd table versions: a
  * [[DataSourceV2Relation]] over a [[DvRead]] table with live
  * tombstones is replaced by the engine's DV-subtracting read
  * ([[VersionedTable.snapshotAt]] — parquet scan + `(__file, __pos)`
  * anti-join against the tombstone files), re-aliased to the
  * relation's output attributes so downstream references stay bound.
  * Filters and column pruning still reach the parquet scan: Catalyst
  * pushes predicates and projections through the anti-join's left side
  * during optimization.
  *
  * Write/DML commands keep their target relation untouched (only their
  * SOURCE query is rewritten): INSERT resolves through the write
  * builder and row-level DELETE through `SupportsDelete`, neither of
  * which scans the target through this relation. */
case class MorScanRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d // metadata delete; engine handles DVs
    case a: AppendData => a.copy(query = apply(a.query))
    case o: OverwriteByExpression => o.copy(query = apply(o.query))
    case i: InsertIntoStatement => i.copy(query = apply(i.query))
    case other =>
      other.resolveOperatorsUp {
        case r: DataSourceV2Relation =>
          r.table match {
            case d: DvRead if d.dvTable.isDefined =>
              val (vt, v) = d.dvTable.get
              val sub = vt.snapshotAt(v).queryExecution.analyzed
              // rebind to the relation's attribute ids so parents'
              // references survive the swap
              Project(r.output.zip(sub.output).map { case (o, a) =>
                Alias(a, o.name)(exprId = o.exprId) }, sub)
            case _ => r
          }
      }
  }
}
