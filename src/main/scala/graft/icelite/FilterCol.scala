package graft.icelite

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._

/** Converts Spark source filters back into Catalyst Columns, so row-level
  * operations (DELETE WHERE) can evaluate the pushed condition with full
  * SQL three-valued semantics inside a normal DataFrame plan. Returns None
  * for shapes we will not claim — `canDeleteWhere` refuses those and Spark
  * reports the condition as untranslatable instead of silently mis-deleting.
  */
object FilterCol {

  def toColumn(f: Filter): Option[Column] = f match {
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case EqualTo(c, v) => Some(col(c) === lit(v))
    case EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case GreaterThan(c, v) => Some(col(c) > lit(v))
    case GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case LessThan(c, v) => Some(col(c) < lit(v))
    case LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case In(c, vs) if vs != null => Some(col(c).isin(vs.toIndexedSeq: _*))
    case IsNull(c) => Some(col(c).isNull)
    case IsNotNull(c) => Some(col(c).isNotNull)
    case StringStartsWith(c, p) => Some(col(c).startsWith(p))
    case StringEndsWith(c, p) => Some(col(c).endsWith(p))
    case StringContains(c, p) => Some(col(c).contains(p))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(ch) => toColumn(ch).map(not)
    case _ => None
  }

  def supported(f: Filter): Boolean = toColumn(f).isDefined
}
