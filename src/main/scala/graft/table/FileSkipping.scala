package graft.table

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Data skipping over the manifest's footer-derived per-file column
  * statistics (Delta's add-file stats evaluation, re-expressed): a
  * pushed conjunct plus a file's [min, max]/null-count can PROVE the
  * file holds no matching row, so the scan never opens it. Everything
  * unprovable stays conservative (`true`), and all comparisons honor
  * SQL semantics (stats ignore nulls; a null literal matches nothing).
  */
object FileSkipping {

  /** Typed comparison of two encoded stat strings. None = untyped. */
  private[table] def compareStats(a: String, b: String, dt: DataType): Option[Int] =
    dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType =>
        Some(java.lang.Long.compare(a.toLong, b.toLong))
      case FloatType | DoubleType =>
        Some(java.lang.Double.compare(a.toDouble, b.toDouble))
      case StringType =>
        Some(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      case _ => None
    }

  /** Encodes a literal's internal value in stat-string form. */
  private def encodeLiteral(l: Literal): Option[String] = l.value match {
    case null => None
    case b: Byte => Some(b.toLong.toString)
    case s: Short => Some(s.toLong.toString)
    case i: Int => Some(i.toLong.toString)
    case l2: Long => Some(l2.toString)
    case f: Float => Some(f.toDouble.toString)
    case d: Double => Some(d.toString)
    case u: UTF8String => Some(u.toString)
    case _ => None
  }

  /** Splits a predicate into conjuncts. */
  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** false => `f` provably contains no row satisfying `conjunct`. */
  def mayMatch(conjunct: Expression, f: DataFile, schema: StructType): Boolean = {
    if (f.rows.contains(0L)) return false // empty file matches nothing

    def dtOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    // cmp(stat, lit): Some(ordering) when both sides are typed + statted
    def stat(name: String, m: Map[String, String], l: Literal): Option[(String, String, DataType)] =
      for {
        dt <- dtOf(name)
        s <- m.get(name)
        v <- encodeLiteral(l)
      } yield (s, v, dt)
    def cmpMin(name: String, l: Literal): Option[Int] =
      stat(name, f.colMins, l).flatMap { case (s, v, dt) => compareStats(s, v, dt) }
    def cmpMax(name: String, l: Literal): Option[Int] =
      stat(name, f.colMaxs, l).flatMap { case (s, v, dt) => compareStats(s, v, dt) }

    conjunct match {
      case EqualTo(a: AttributeReference, l: Literal) => eqMay(a.name, l, cmpMin, cmpMax)
      case EqualTo(l: Literal, a: AttributeReference) => eqMay(a.name, l, cmpMin, cmpMax)

      case GreaterThan(a: AttributeReference, l: Literal) => cmpMax(a.name, l).forall(_ > 0)
      case LessThan(l: Literal, a: AttributeReference) => cmpMax(a.name, l).forall(_ > 0)

      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => cmpMax(a.name, l).forall(_ >= 0)
      case LessThanOrEqual(l: Literal, a: AttributeReference) => cmpMax(a.name, l).forall(_ >= 0)

      case LessThan(a: AttributeReference, l: Literal) => cmpMin(a.name, l).forall(_ < 0)
      case GreaterThan(l: Literal, a: AttributeReference) => cmpMin(a.name, l).forall(_ < 0)

      case LessThanOrEqual(a: AttributeReference, l: Literal) => cmpMin(a.name, l).forall(_ <= 0)
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => cmpMin(a.name, l).forall(_ <= 0)

      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => eqMay(a.name, v.asInstanceOf[Literal], cmpMin, cmpMax))
      case InSet(a: AttributeReference, vs) =>
        dtOf(a.name).forall(dt =>
          vs.exists(v => eqMay(a.name, Literal(v, dt), cmpMin, cmpMax)))

      case IsNull(a: AttributeReference) =>
        f.nullCounts.get(a.name).forall(_ > 0L)
      case IsNotNull(a: AttributeReference) =>
        !(f.rows.isDefined && f.nullCounts.get(a.name) == f.rows)

      case _ => true
    }
  }

  private def eqMay(
      name: String, l: Literal,
      cmpMin: (String, Literal) => Option[Int],
      cmpMax: (String, Literal) => Option[Int]): Boolean = {
    if (l.value == null) return false // `a = NULL` is never true
    cmpMin(name, l).forall(_ <= 0) && cmpMax(name, l).forall(_ >= 0)
  }
}
