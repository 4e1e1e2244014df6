package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * embedding columns, in double precision, as ONE fused loop with full
  * whole-stage-codegen support (`doGenCode`) — the SURVEY §7.4
  * "custom, inside Catalyst (perf-only)" artifact.
  *
  * Why an Expression and not a UDF or higher-order functions: Spark's
  * HOF lambdas (`aggregate`/`zip_with`) are interpreted per element —
  * measured as the dominant cost of the brute-force similarity scan —
  * and a Scala UDF adds serialization + codegen-barrier costs on top.
  * This expression compiles into the generated stage: three running
  * sums in one pass over the arrays, no allocations.
  *
  * Semantics are bit-identical to the left-to-right double-precision
  * fold the DuckDB oracle uses (each accumulator is an independent
  * sequential sum over dimension index): `dot/(sqrt(na)*sqrt(nb))`.
  * Arrays shorter than the other operand are treated as truncating the
  * iteration (mismatched lengths do not occur in practice); null
  * elements are not expected (embedding vectors are dense).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration surfaces for [[CosineSimilarity]]. */
object GraftFunctions {
  private val ident = FunctionIdentifier("cosine_sim")
  private val info = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "cosine_sim")
  private val builder = (children: Seq[Expression]) => {
    require(children.size == 2, "cosine_sim takes exactly 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Runtime registration of all graft functions on an existing
    * session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    Md5MinRegistration.register(spark)
    SimhashBands.register(spark)
    registerTableChanges(spark)
  }

  /** SQL table-valued function `table_changes('<table path>', from
    * [, to])` — the reference's Delta TVF surface verbatim (S7,
    * demo-notebook.py:371), resolved against [[graft.table.VersionedTable]].
    * Arguments must be literals (resolution happens at analysis time,
    * like Delta's own TVF). */
  def registerTableChanges(spark: SparkSession): Unit =
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.table.VersionedTable", "table_changes"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "table_changes(path, fromVersion [, toVersion])")
        def str(e: Expression) = e.eval().toString
        def lng(e: Expression) = e.eval() match {
          case l: Long => l
          case i: Int => i.toLong
          case other => other.toString.toLong
        }
        val t = graft.table.VersionedTable.load(spark, str(args.head))
        t.changes(lng(args(1)), args.lift(2).map(lng))
          .queryExecution.analyzed
      })
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * SparkSessionExtensions injection point for deployments that
  * configure the engine at session build: native functions plus the
  * maintenance-statement parser (VACUUM / OPTIMIZE / RESTORE —
  * [[graft.catalog.GraftSqlParser]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    // the session is threaded into the parser so GLOBAL RANK resolves
    // its source against the session that was invoked, never
    // SparkSession.active (ADVICE r11)
    ext.injectParser((s, parser) =>
      new graft.catalog.GraftSqlParser(parser, Some(s)))
    // serves SQL reads of merge-on-read (deletion-vector'd) versions
    ext.injectResolutionRule(s => graft.catalog.MorScanRewrite(s))
    // expands the deferred GLOBAL RANK node at first analysis
    ext.injectResolutionRule(s => graft.catalog.GlobalRankResolution(s))
  }
}
