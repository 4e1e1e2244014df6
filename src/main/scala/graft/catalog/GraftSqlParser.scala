package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.table.VersionedTable

/** Parser extension adding the table-maintenance statements Delta users
  * run as SQL (Spark itself has no grammar for them):
  *
  * {{{
  *   VACUUM <table> [RETAIN <n> VERSIONS]
  *   OPTIMIZE <table> [TARGET <n> ROWS]        -- bin-packing compaction
  *   RESTORE [TABLE] <table> TO VERSION AS OF <v>
  * }}}
  *
  * `<table>` is either a `'quoted'` filesystem path of a versioned
  * table or a `cat.db.name` identifier resolved through the registered
  * graft catalog's warehouse conf. Anything else falls through to
  * Spark's parser untouched. Injected via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val Vacuum =
    """(?is)\s*VACUUM\s+(\S+?)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+(\S+?)(?:\s+TARGET\s+(\d+)\s+ROWS)?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?(\S+?)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(tbl, retain) =>
      VacuumCommand(tbl, Option(retain).map(_.toInt).getOrElse(2))
    case Optimize(tbl, target) =>
      OptimizeCommand(tbl, Option(target).map(_.toLong).getOrElse(1L << 20))
    case Restore(tbl, v) => RestoreCommand(tbl, v.toLong)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  /** `'path'` literal, or `cat.db.name` via `spark.sql.catalog.<cat>
    * .warehouse` — the same layout GraftSparkCatalog serves. */
  def resolve(spark: SparkSession, table: String): VersionedTable = {
    val clean = table.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("`").stripSuffix("`")
    if (VersionedTable.exists(clean)) VersionedTable.load(spark, clean)
    else {
      val parts = clean.split('.')
      require(parts.length >= 3,
        s"'$clean' is neither a versioned-table path nor a cat.db.table name")
      val wh = spark.conf.get(s"spark.sql.catalog.${parts.head}.warehouse")
      VersionedTable.load(spark, (wh +: parts.tail.toSeq).mkString("/"))
    }
  }
}

case class VacuumCommand(table: String, retain: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("removed_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.resolve(spark, table).vacuum(retain).map(Row(_))
}

case class OptimizeCommand(table: String, targetRows: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.resolve(spark, table).compactSmallFiles(targetRows)
      .map(Row(_)).toSeq
}

case class RestoreCommand(table: String, version: Long) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftSqlParser.resolve(spark, table).restore(version).map(Row(_)).toSeq
}
