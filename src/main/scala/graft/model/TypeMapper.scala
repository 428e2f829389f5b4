package graft.model

import org.apache.spark.sql.types._

/** Keboola base-type mapping (SURVEY §1.2).
  *
  * Mapping A — engine type -> Keboola base type — mirrors the extractor's
  * `convert_base_types` (`components/ex-iceberg/src/component.py:110-136`):
  * integral widths collapse to INTEGER, REAL/DECIMAL to NUMERIC, DOUBLE to
  * FLOAT, temporal to TIMESTAMP/DATE, everything else (strings, binaries,
  * nested types, intervals) to STRING — lossy by design on the CSV path.
  *
  * Mapping B — base type -> engine type — mirrors the writer's
  * manifest-driven CSV dtypes (`components/wr-iceberg/src/component.py:67-77`).
  */
object TypeMapper {

  val Integer = "INTEGER"
  val Numeric = "NUMERIC"
  val Float = "FLOAT"
  val Boolean = "BOOLEAN"
  val Timestamp = "TIMESTAMP"
  val Date = "DATE"
  val Str = "STRING"

  /** Mapping A: Spark type -> Keboola base type. */
  def toBaseType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => Integer
    case _: DecimalType | FloatType => Numeric
    case DoubleType => Float
    case BooleanType => Boolean
    case TimestampType | TimestampNTZType => Timestamp
    case DateType => Date
    case _ => Str
  }

  /** Mapping B: Keboola base type -> Spark read-side type. */
  def toSparkType(baseType: String): DataType = baseType.toUpperCase match {
    case Integer => LongType
    case Numeric => DecimalType(38, 9)
    case Float => DoubleType
    case Boolean => BooleanType
    case Timestamp => TimestampNTZType
    case Date => DateType
    case _ => StringType
  }
}
