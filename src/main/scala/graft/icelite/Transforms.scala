package graft.icelite

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hidden-partitioning transforms (Iceberg's signature layout capability):
  * a partition-spec entry is either a plain column name (identity, the
  * hive-style layout) or a derivation — `bucket(N, col)`, `days(col)`,
  * `truncate(W, col)` — whose value is computed AT WRITE time, rendered
  * into the directory layout, pruned against at plan time, and never
  * user-visible: queries filter on the SOURCE column and the engine maps
  * the predicate through the transform. This is what makes time-series +
  * high-cardinality keys layoutable at 100 TB — `days(ts)` keeps a
  * timestamp-partitioned table at one dir per day (where identity would be
  * one per microsecond), `bucket(N, key)` bounds a high-cardinality key to
  * N dirs.
  *
  * Specs are stored as strings in `TableMeta.partitionBy` / the
  * `PartSpecChange` ledger, so hidden partitioning composes with partition
  * evolution for free (the reference's PyIceberg tables carry the same
  * transform specs; this module re-derives the semantics Spark-side).
  *
  * The bucket hash is Spark's own `hash()` (Murmur3, seed 42), evaluated
  * through the SAME implementation on all three paths — the codegen'd write
  * expression, the DSv2 writer's row loop, and the driver-side prune of a
  * filter literal — so a value can never land in one bucket and be probed
  * in another.
  */
sealed trait PartField {
  def source: String

  /** Directory field name (what `<name>=<value>` segments carry). */
  def fieldName: String

  /** Canonical spec string (what TableMeta.partitionBy stores). */
  def spec: String
  def isIdentity: Boolean = false
}

final case class IdentityField(source: String) extends PartField {
  def fieldName: String = source
  def spec: String = source
  override def isIdentity: Boolean = true
}

final case class BucketField(n: Int, source: String) extends PartField {
  def fieldName: String = s"${source}_bucket"
  def spec: String = s"bucket($n,$source)"
}

final case class DaysField(source: String) extends PartField {
  def fieldName: String = s"${source}_day"
  def spec: String = s"days($source)"
}

final case class MonthsField(source: String) extends PartField {
  def fieldName: String = s"${source}_month"
  def spec: String = s"months($source)"
}

final case class YearsField(source: String) extends PartField {
  def fieldName: String = s"${source}_year"
  def spec: String = s"years($source)"
}

final case class HoursField(source: String) extends PartField {
  def fieldName: String = s"${source}_hour"
  def spec: String = s"hours($source)"
}

final case class TruncateField(w: Int, source: String) extends PartField {
  def fieldName: String = s"${source}_trunc"
  def spec: String = s"truncate($w,$source)"
}

object PartField {

  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r
  private val DaysRe = """days?\(\s*([^)\s]+)\s*\)""".r
  private val MonthsRe = """months?\(\s*([^)\s]+)\s*\)""".r
  private val YearsRe = """years?\(\s*([^)\s]+)\s*\)""".r
  private val HoursRe = """hours?\(\s*([^)\s]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([^)\s]+)\s*\)""".r

  def parse(entry: String): PartField = entry.trim match {
    case BucketRe(n, c) => BucketField(n.toInt, c)
    case DaysRe(c) => DaysField(c)
    case MonthsRe(c) => MonthsField(c)
    case YearsRe(c) => YearsField(c)
    case HoursRe(c) => HoursField(c)
    case TruncRe(w, c) => TruncateField(w.toInt, c)
    case c => IdentityField(c)
  }

  def parseSpec(spec: Seq[String]): Seq[PartField] = spec.map(parse)

  /** Identity column names of a spec — the only entries whose values bind
    * from directories at read time (transform sources always read from
    * data; their dir values exist purely for layout and pruning).
    */
  def identityCols(spec: Seq[String]): Seq[String] =
    parseSpec(spec).collect { case IdentityField(c) => c }

  /** Source columns of every entry (identity and transform alike). */
  def sources(spec: Seq[String]): Seq[String] = parseSpec(spec).map(_.source)

  def hasTransforms(spec: Seq[String]): Boolean =
    spec.exists(e => !parse(e).isIdentity)

  /** The partition spec in force for a file under a partition-evolution
    * ledger, consulting the manifest entry's RECORDED era first — imported
    * files (add_files) have no era in their path, so the entry carries the
    * import snapshot instead. ONE implementation on purpose — the DSv2
    * scan's pruning, the exact-filter claim, the manifest aggregate, and
    * the streaming planner must all resolve eras identically or the
    * exactness claims silently diverge from the files actually planned.
    * Deliberately NO path-based overload: a path form would resolve
    * imported files to the wrong (newest) spec — every consumer holds a
    * [[FileStat]] and must route era resolution through `f.eraOrPath`.
    */
  def specFor(f: FileStat, partitionBy: Seq[String],
      specs: Seq[PartSpecChange]): Seq[String] =
    specForEra(f.eraOrPath, partitionBy, specs)

  def specForEra(era: Long, partitionBy: Seq[String],
      specs: Seq[PartSpecChange]): Seq[String] =
    if (specs.isEmpty) partitionBy
    else specs.find(_.cutoffSnapshotId >= era).map(_.cols).getOrElse(partitionBy)
}

object Transforms {

  private val MicrosPerDay = 86400000000L

  /** Validate one spec entry against the table schema; returns the parsed
    * field. Shared by createTable, setPartitionSpec, and the DSv2 write
    * path, so every surface refuses the same invalid specs.
    */
  def validate(schema: StructType, entry: String): PartField = {
    val f = PartField.parse(entry)
    val field = schema.fields.find(_.name == f.source).getOrElse(
      throw new IllegalArgumentException(
        s"icelite: partition source column ${f.source} is not in the table schema"))
    val dt = field.dataType
    f match {
      case IdentityField(c) =>
        require(PartValues.renderable(dt),
          s"icelite: partition column $c has type ${dt.simpleString}, " +
            "which has no unambiguous directory rendering (timestamps depend " +
            "on the writer's session timezone); partition by days(" + c + "), " +
            "bucket(N, " + c + ") or another derivation instead")
      case BucketField(n, c) =>
        require(n >= 1, s"icelite: bucket($n, $c) needs N >= 1")
        require(dt match {
          case ByteType | ShortType | IntegerType | LongType | StringType |
               DateType => true
          // decimals bucket on the Murmur3 hash of the catalyst Decimal at
          // the DECLARED precision/scale — both the Column write path
          // (hash(col)) and applyCatalyst route through Spark's one
          // Murmur3HashFunction, so the spellings cannot drift; money-typed
          // join/lookup keys get hidden partitioning like any other
          case _: DecimalType => true
          case _ => false
        }, s"icelite: bucket source $c has unsupported type ${dt.simpleString} " +
          "(integral/string/date/decimal)")
      case DaysField(c) =>
        require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
          s"icelite: days source $c must be a date or timestamp, got ${dt.simpleString}")
      case MonthsField(c) =>
        require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
          s"icelite: months source $c must be a date or timestamp, got ${dt.simpleString}")
      case YearsField(c) =>
        require(dt == DateType || dt == TimestampType || dt == TimestampNTZType,
          s"icelite: years source $c must be a date or timestamp, got ${dt.simpleString}")
      case HoursField(c) =>
        require(dt == TimestampType || dt == TimestampNTZType,
          s"icelite: hours source $c must be a timestamp, got ${dt.simpleString}")
      case TruncateField(w, c) =>
        require(w >= 1, s"icelite: truncate($w, $c) needs W >= 1")
        require(dt match {
          case ByteType | ShortType | IntegerType | LongType | StringType => true
          case _ => false
        }, s"icelite: truncate source $c has unsupported type ${dt.simpleString} " +
          "(integral/string)")
    }
    f
  }

  /** Epoch day of the source as a Column, SESSION-TIMEZONE-FREE for every
    * temporal type: dates subtract directly, NTZ extracts its own wall-clock
    * date (never passing through TIMESTAMP, whose NTZ cast applies the
    * session zone), and zoned timestamps floor their true epoch micros
    * (UTC day, matching [[applyCatalyst]]'s `java.time` UTC math).
    */
  private def epochDayCol(c: String, dt: DataType): Column = dt match {
    case DateType => datediff(col(c), to_date(lit("1970-01-01")))
    case TimestampNTZType =>
      datediff(col(c).cast(DateType), to_date(lit("1970-01-01")))
    case _ =>
      floor(unix_micros(col(c)) / lit(MicrosPerDay.toDouble)).cast("int")
  }

  /** The source as a calendar DATE Column, timezone-free (year()/month()
    * over DATE never consult the session zone — the months/years path).
    */
  private def utcDateCol(c: String, dt: DataType): Column = dt match {
    case DateType => col(c)
    case TimestampNTZType => col(c).cast(DateType)
    case _ => date_add(to_date(lit("1970-01-01")), epochDayCol(c, dt))
  }

  /** The transform as a Column over the source — the WRITE-path value
    * (codegen'd built-ins only). Must agree exactly with [[applyCatalyst]]
    * IN ANY SESSION TIMEZONE: graft sessions pin UTC, but the catalog can
    * be mounted in arbitrary Spark apps, and a zone-dependent write value
    * would land rows in directories the (zone-free) pruner never probes —
    * silent missing rows. Hence no bare year()/month() over timestamps and
    * no NTZ→TIMESTAMP casts anywhere below.
    */
  def columnExpr(f: PartField, dt: DataType): Column = f match {
    case IdentityField(c) => col(c)
    case BucketField(n, c) =>
      // hash() is Murmur3 seed 42 over the column's own type
      pmod(hash(col(c)), lit(n))
    case DaysField(c) => epochDayCol(c, dt)
    case MonthsField(c) =>
      val d = utcDateCol(c, dt)
      ((org.apache.spark.sql.functions.year(d) - lit(1970)) * lit(12) +
        org.apache.spark.sql.functions.month(d) - lit(1)).cast("int")
    case YearsField(c) =>
      (org.apache.spark.sql.functions.year(utcDateCol(c, dt)) - lit(1970))
        .cast("int")
    case HoursField(c) => dt match {
      case TimestampNTZType =>
        // wall-clock hour of the NTZ value: epoch day × 24 + hour-of-day
        // (hour() over NTZ is zone-free; unix_micros would need a zoned cast)
        (epochDayCol(c, dt) * lit(24) +
          org.apache.spark.sql.functions.hour(col(c))).cast("int")
      case _ =>
        floor(unix_micros(col(c)) / lit(3600000000L.toDouble)).cast("int")
    }
    case TruncateField(w, c) => dt match {
      case StringType => substring(col(c), 1, w)
      // width-floor that is exact for negatives too (pmod >= 0)
      case _ => col(c) - pmod(col(c), lit(w))
    }
  }

  /** The transform applied to one catalyst-internal source value (Int /
    * Long / UTF8String / epoch-day Int / epoch-micros Long). Null in,
    * null out. This single implementation serves both the DSv2 writer's
    * row loop and the plan-time pruning of filter literals.
    */
  def applyCatalyst(f: PartField, dt: DataType, v: Any): Any = {
    if (v == null) return null
    f match {
      case IdentityField(_) => v
      case BucketField(n, _) =>
        val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(v, dt, 42L).toInt
        ((h % n) + n) % n
      case DaysField(_) => dt match {
        case DateType => v.asInstanceOf[Number].intValue
        case _ => Math.floorDiv(v.asInstanceOf[Number].longValue, MicrosPerDay).toInt
      }
      case MonthsField(_) =>
        val d = localDateOf(dt, v)
        (d.getYear - 1970) * 12 + d.getMonthValue - 1
      case YearsField(_) => localDateOf(dt, v).getYear - 1970
      case HoursField(_) =>
        Math.floorDiv(v.asInstanceOf[Number].longValue, 3600000000L).toInt
      case TruncateField(w, _) => dt match {
        case StringType =>
          val s = v.toString
          if (s.length <= w) s else s.substring(0, w)
        case _ =>
          val l = v.asInstanceOf[Number].longValue
          val t = l - Math.floorMod(l, w.toLong)
          dt match {
            case LongType => t
            case _ => t.toInt
          }
      }
    }
  }

  /** UTC calendar date of a catalyst date (epoch-day Int) or timestamp
    * (epoch-micros Long) value — the shared month/year math.
    */
  private def localDateOf(dt: DataType, v: Any): java.time.LocalDate = dt match {
    case DateType => java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue)
    case _ => java.time.LocalDate.ofEpochDay(
      Math.floorDiv(v.asInstanceOf[Number].longValue, MicrosPerDay))
  }

  /** External filter value -> catalyst value of the source type, for
    * pruning (None = unconvertible, caller stays conservative).
    */
  def toCatalyst(dt: DataType, v: Any): Option[Any] = Option(v).flatMap { x =>
    dt match {
      case ByteType => x match { case n: Number => Some(n.byteValue); case _ => None }
      case ShortType => x match { case n: Number => Some(n.shortValue); case _ => None }
      case IntegerType => x match { case n: Number => Some(n.intValue); case _ => None }
      case LongType => x match { case n: Number => Some(n.longValue); case _ => None }
      case StringType => Some(UTF8String.fromString(x.toString))
      case DateType => x match {
        case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
        case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
        case n: Number => Some(n.intValue)
        case _ => None
      }
      case TimestampType | TimestampNTZType => x match {
        case t: java.sql.Timestamp =>
          Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
        case i: java.time.Instant =>
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case l: java.time.LocalDateTime =>
          val i = l.toInstant(java.time.ZoneOffset.UTC)
          Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
        case n: Number => Some(n.longValue)
        case _ => None
      }
      // the Murmur3 hash of a Decimal depends on the DECLARED precision /
      // scale (p<=18 hashes the unscaled long), so the literal must be
      // rescaled to the column's type before hashing; a literal that does
      // not fit rescales to None and the caller stays conservative
      case d: DecimalType =>
        val bd = x match {
          case j: java.math.BigDecimal => Some(j)
          case s: BigDecimal => Some(s.underlying)
          case sd: org.apache.spark.sql.types.Decimal => Some(sd.toJavaBigDecimal)
          case _ => None
        }
        bd.flatMap { j =>
          val dec = org.apache.spark.sql.types.Decimal(j)
          if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
        }
      case _ => None
    }
  }
}

/** File pruning through hidden-partition transforms: given a file's
  * transform directory values, decide whether any row could satisfy a
  * filter on the SOURCE column. Conservative in every branch — an
  * unparseable value, an unknown filter shape, or a non-monotonic case
  * keeps the file.
  */
object TransformPrune {

  import org.apache.spark.sql.sources._

  /** Could any row of the file satisfy `f`, given `raw` dir values keyed
    * by transform fieldName (None = hive null partition)?
    */
  def canMatch(f: Filter, schema: StructType, fields: Seq[PartField],
      raw: Map[String, Option[String]]): Boolean = {
    val transforms = fields.filterNot(_.isIdentity)
      .filter(t => raw.contains(t.fieldName))
    if (transforms.isEmpty) return true
    def fieldsFor(c: String) = transforms.filter(_.source == c)
    def dt(c: String): Option[DataType] =
      schema.fields.find(_.name == c).map(_.dataType)

    f match {
      case And(l, r) =>
        canMatch(l, schema, fields, raw) && canMatch(r, schema, fields, raw)
      case Or(l, r) =>
        canMatch(l, schema, fields, raw) || canMatch(r, schema, fields, raw)
      case EqualTo(c, v) if v != null => eqPossible(c, v, fieldsFor(c), dt(c), raw)
      case EqualNullSafe(c, v) if v != null => eqPossible(c, v, fieldsFor(c), dt(c), raw)
      case In(c, vs) =>
        vs == null || vs.isEmpty ||
          vs.exists(v => v != null && eqPossible(c, v, fieldsFor(c), dt(c), raw))
      case IsNull(c) =>
        // a non-null transform dir value proves every row's source non-null
        fieldsFor(c).forall(t => raw(t.fieldName).isEmpty)
      case IsNotNull(c) =>
        // the hive null partition holds only null-source rows
        fieldsFor(c).forall(t => raw(t.fieldName).isDefined)
      case GreaterThan(c, v) if v != null =>
        rangePossible(c, v, fieldsFor(c), dt(c), raw, lower = true)
      case GreaterThanOrEqual(c, v) if v != null =>
        rangePossible(c, v, fieldsFor(c), dt(c), raw, lower = true)
      case LessThan(c, v) if v != null =>
        rangePossible(c, v, fieldsFor(c), dt(c), raw, lower = false)
      case LessThanOrEqual(c, v) if v != null =>
        rangePossible(c, v, fieldsFor(c), dt(c), raw, lower = false)
      case StringStartsWith(c, p) if p != null =>
        fieldsFor(c).forall {
          case t @ TruncateField(w, _) =>
            raw(t.fieldName) match {
              case Some(tv) =>
                if (p.length >= w) tv == p.substring(0, w) else tv.startsWith(p)
              case None => false // all-null source: never starts with anything
            }
          case _ => true
        }
      case _ => true
    }
  }

  /** Could source == v hold for some row, per the file's transform values? */
  private def eqPossible(c: String, v: Any, ts: Seq[PartField],
      dtOpt: Option[DataType], raw: Map[String, Option[String]]): Boolean =
    dtOpt.forall { dt =>
      Transforms.toCatalyst(dt, v) match {
        case None => true
        case Some(cv) => ts.forall { t =>
          raw(t.fieldName) match {
            case None => false // null partition cannot equal a non-null v
            case Some(dirVal) =>
              renderOf(t, dt, cv).forall(_ == dirVal)
          }
        }
      }
    }

  /** Range predicate vs a MONOTONIC transform (days/months/years/hours,
    * integer truncate): `lower = true` for `source > / >= v`. Rows of the
    * file live in `[dirVal, dirVal + width)` of the transform's domain; v
    * maps to `t0 = transform(v)` — overlap exists iff dirVal >= t0 (lower
    * bound) / dirVal <= t0 (upper bound). Bucket and string-truncate are
    * non-monotonic here and never prune ranges.
    */
  private def rangePossible(c: String, v: Any, ts: Seq[PartField],
      dtOpt: Option[DataType], raw: Map[String, Option[String]],
      lower: Boolean): Boolean =
    dtOpt.forall { dt =>
      Transforms.toCatalyst(dt, v) match {
        case None => true
        case Some(cv) => ts.forall {
          case t @ (DaysField(_) | MonthsField(_) | YearsField(_) |
                    HoursField(_) | TruncateField(_, _))
              if !(t.isInstanceOf[TruncateField] && dt == StringType) =>
            raw(t.fieldName) match {
              case None => false // all-null source never satisfies a comparison
              case Some(dirVal) =>
                (dirVal.toLongOption, Some(Transforms.applyCatalyst(t, dt, cv))) match {
                  case (Some(dv), Some(t0: Number)) =>
                    if (lower) dv >= t0.longValue else dv <= t0.longValue
                  case _ => true
                }
            }
          case _ => true // bucket / string truncate: no range order
        }
      }
    }

  /** Directory rendering of transform(sourceValue), for equality probes —
    * must match what the writers produce.
    */
  private def renderOf(t: PartField, dt: DataType, catalystV: Any): Option[String] =
    Transforms.applyCatalyst(t, dt, catalystV) match {
      case null => None
      case u: UTF8String => Some(u.toString)
      case other => Some(other.toString)
    }
}
