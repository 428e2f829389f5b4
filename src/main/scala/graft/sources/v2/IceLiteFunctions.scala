package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

import graft.icelite.{BucketField, DaysField, HoursField, MonthsField, PartField, Transforms, TruncateField, YearsField}

/** SQL faces of the hidden-partitioning transforms (`FunctionCatalog`):
  * `SELECT <cat>.system.bucket(4, k)`, `system.days(ts)`,
  * `system.truncate(8, s)` — the same implementation the writers and the
  * plan-time pruner run ([[graft.icelite.Transforms.applyCatalyst]]), so a
  * SQL user can compute exactly which partition a value lands in (the
  * Iceberg `FunctionCatalog` parity surface). Null in, null out.
  */
object IceLiteFunctions {

  def names: Seq[String] = Seq("bucket", "days", "months", "years", "hours", "truncate")

  def load(name: String): UnboundFunction = name match {
    case "bucket" => Bucket
    case "days" => Days
    case "months" => temporal("months", MonthsField("c"))
    case "years" => temporal("years", YearsField("c"))
    case "hours" => temporal("hours", HoursField("c"))
    case "truncate" => Truncate
    case other => throw new IllegalArgumentException(
      s"unknown icelite function '$other' (have: ${names.mkString(", ")})")
  }

  /** Bind-time input-type gate, mirroring [[Transforms.validate]]'s
    * per-transform rules — the SQL functions must accept exactly the types
    * the partition specs accept, or `system.hours(DATE '…')` would treat an
    * epoch-DAY int as epoch MICROS and silently return 0 instead of
    * erroring. `UnsupportedOperationException` is the `bind` contract's
    * cannot-bind signal (surfaced as an analysis error, not a runtime
    * ClassCastException mid-query).
    */
  private def gate(fname: String, dt: DataType, ok: Boolean, expected: String): Unit =
    if (!ok) throw new UnsupportedOperationException(
      s"icelite $fname does not accept ${dt.simpleString} (expects $expected)")

  private def temporalOk(fname: String, dt: DataType): Unit = fname match {
    case "hours" =>
      gate(fname, dt, dt == TimestampType || dt == TimestampNTZType, "timestamp")
    case _ =>
      gate(fname, dt,
        dt == DateType || dt == TimestampType || dt == TimestampNTZType,
        "date or timestamp")
  }

  /** One-argument temporal transform function (months/years/hours). */
  private def temporal(fname: String, field: PartField): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fname
      override def description(): String =
        s"$fname(ts): the hidden $fname() partition value of a timestamp/date"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.length == 1, s"$fname takes one timestamp/date argument")
        val dt = inputType(0).dataType
        temporalOk(fname, dt)
        scalar(fname, _ => field, Array(dt), dt, IntegerType)
      }
    }

  private def scalar(fname: String, field: DataType => PartField,
      inTypes: Array[DataType], srcType: DataType, out: DataType)
      : BoundFunction =
    TransformScalarFn(fname, field(srcType), inTypes.toSeq, srcType, out)

  /** Bound transform function. A CASE CLASS on purpose: two binds of the
    * same function over the same types must be `equals` — Catalyst's
    * `ApplyFunctionExpression` compares the bound-function object when
    * checking `SELECT f(ts) … GROUP BY f(ts)` semantic equality, and an
    * anonymous instance per bind() would fail "not in GROUP BY" analysis
    * (and block aggregate pushdown over transform groupings).
    */
  private final case class TransformScalarFn(fname: String, f: PartField,
      inTypes: Seq[DataType], srcType: DataType, out: DataType)
      extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = inTypes.toArray
    override def resultType(): DataType = out
    override def name(): String = fname
    override def canonicalName(): String = s"icelite.$fname(${srcType.simpleString})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = {
      val srcIdx = inTypes.length - 1
      if (input.isNullAt(srcIdx)) null
      else Transforms.applyCatalyst(f, srcType, input.get(srcIdx, srcType))
    }
  }

  private object Bucket extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): the hidden-partitioning bucket (Murmur3 mod n) col lands in"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2, "bucket takes (n INT, col)")
      gate("bucket", inputType(0).dataType,
        inputType(0).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }, "an integral bucket count")
      val dt = inputType(1).dataType
      gate("bucket", dt, dt match {
        case ByteType | ShortType | IntegerType | LongType | StringType |
             DateType => true
        case _: DecimalType => true
        case _ => false
      }, "integral, string, date or decimal")
      // n is fixed per spec entry; SQL binding reads it per-row, so the
      // produceResult path re-derives the field from the row's own n
      BucketFn(dt)
    }
  }

  private final case class BucketFn(dt: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"icelite.bucket(${dt.simpleString})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else Transforms.applyCatalyst(
        BucketField(input.getInt(0), "c"), dt, input.get(1, dt))
  }

  private object Days extends UnboundFunction {
    override def name(): String = "days"
    override def description(): String =
      "days(ts): epoch day of a timestamp/date (the hidden days() partition value)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1, "days takes (ts TIMESTAMP | DATE)")
      val dt = inputType(0).dataType
      temporalOk("days", dt)
      scalar("days", _ => DaysField("c"), Array(dt), dt, IntegerType)
    }
  }

  private object Truncate extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-floored integral / w-prefix string partition value"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2, "truncate takes (w INT, col)")
      gate("truncate", inputType(0).dataType,
        inputType(0).dataType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }, "an integral width")
      val dt = inputType(1).dataType
      gate("truncate", dt, dt match {
        case ByteType | ShortType | IntegerType | LongType | StringType => true
        case _ => false
      }, "integral or string")
      TruncateFn(dt)
    }
  }

  private final case class TruncateFn(dt: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = dt
    override def name(): String = "truncate"
    override def canonicalName(): String = s"icelite.truncate(${dt.simpleString})"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else Transforms.applyCatalyst(
        TruncateField(input.getInt(0), "c"), dt, input.get(1, dt))
  }
}
