package graft.icelite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive-style partition-value plumbing: parse `col=value` path segments,
  * unescape, and decode to typed values (catalyst-internal for the batch
  * vectors; the same representations — boxed numbers / strings — serve
  * FilePrune's external comparisons).
  */
object PartValues {

  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Decode a RECORDED raw-value map ([[FileStat.partVals]] — directory
    * string encoding, [[HiveDefaultPartition]] = null) for the requested
    * columns. Columns absent from the recorded map are absent from the
    * result (= "no such directory segment"), exactly like [[parse]] on a
    * path without the segment.
    */
  def fromRecorded(recorded: Map[String, String], cols: Seq[String])
      : Map[String, Option[String]] =
    cols.flatMap(c => recorded.get(c).map(v =>
      c -> (if (v == HiveDefaultPartition) None else Some(v)))).toMap

  /** Encode parsed raw values into the recorded form (inverse of
    * [[fromRecorded]]): the directory string, nulls as the hive marker.
    */
  def toRecorded(raw: Map[String, Option[String]]): Map[String, String] =
    raw.map { case (c, v) => c -> v.getOrElse(HiveDefaultPartition) }

  /** Directory-column alias used when the DataFrame write path must keep the
    * partition column IN the data file too (partition evolution: files must
    * be self-contained so later specs can read old columns from data).
    * Spark's writer always strips the `partitionBy` column from data, so the
    * write duplicates it under this prefix for layout only.
    */
  val DirAliasPrefix = "__p_"

  /** Raw (still-string) partition values keyed by column name; None encodes
    * the hive null partition. Data-file paths never contain '=' outside
    * partition segments (snapshot dirs are `snap-NNNNN`, files `part-*`).
    * Accepts both `col=v` and the aliased `__p_col=v` directory spellings.
    */
  def parse(path: String, partitionBy: Seq[String]): Map[String, Option[String]] = {
    if (partitionBy.isEmpty) return Map.empty
    val byName = path.split('/').iterator.flatMap { seg =>
      val i = seg.indexOf('=')
      if (i <= 0) None
      else {
        val name = seg.substring(0, i)
        val logical =
          if (name.startsWith(DirAliasPrefix)) name.substring(DirAliasPrefix.length)
          else name
        Some(logical -> unescape(seg.substring(i + 1)))
      }
    }.toMap
    partitionBy.flatMap(c => byName.get(c)
      .map(v => c -> (if (v == HiveDefaultPartition) None else Some(v)))).toMap
  }

  /** Spark escapes special chars in partition dirs as %xx (one escape per
    * byte of the UTF-8 encoding).
    */
  private def unescape(s: String): String = {
    if (!s.contains('%')) return s
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      val hex = if (ch == '%' && i + 2 < s.length) {
        try Integer.parseInt(s.substring(i + 1, i + 3), 16)
        catch { case _: NumberFormatException => -1 }
      } else -1
      if (hex >= 0) { out.write(hex); i += 3 }
      else {
        val bytes = ch.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.write(bytes, 0, bytes.length)
        i += 1
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Partition-column types with an unambiguous external string form.
    * Timestamps are deliberately excluded: their directory rendering depends
    * on the writing session's timezone, so round-tripping them through path
    * segments is a silent-corruption trap. Both write paths (DSv2's HivePath
    * and the catalog's createTable) enforce this.
    */
  def renderable(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         BooleanType | DateType => true
    case _ => false
  }

  /** Catalyst-internal value of one partition column. */
  private def internalValue(dt: DataType, raw: String): Any = dt match {
    case StringType => UTF8String.fromString(raw)
    case IntegerType => raw.toInt
    case LongType => raw.toLong
    case ShortType => raw.toShort
    case ByteType => raw.toByte
    case DoubleType => raw.toDouble
    case FloatType => raw.toFloat
    case BooleanType => raw.toBoolean
    case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
    // Kept for reading tables that predate the renderable() validation:
    // Spark's partitioned writer renders timestamps as a session-timezone
    // local datetime ("yyyy-MM-dd HH:mm:ss[.S]"); graft sessions pin UTC.
    // ISO instants ("...T...Z") are accepted as a fallback.
    case TimestampType | TimestampNTZType =>
      val i =
        if (raw.contains(' ')) {
          val fmt = java.time.format.DateTimeFormatter.ofPattern(
            "yyyy-MM-dd HH:mm:ss[.SSSSSS][.SSS][.S]")
          java.time.LocalDateTime.parse(raw, fmt).toInstant(java.time.ZoneOffset.UTC)
        } else
          try java.time.Instant.parse(raw)
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(raw).toInstant(java.time.ZoneOffset.UTC)
          }
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new UnsupportedOperationException(
      s"icelite: unsupported partition column type $other")
  }

  /** InternalRow of partition values matching `partSchema` field order. */
  def internalRow(partSchema: StructType, raw: Map[String, Option[String]]): InternalRow = {
    val row = new GenericInternalRow(partSchema.length)
    partSchema.fields.zipWithIndex.foreach { case (f, i) =>
      raw.getOrElse(f.name, None) match {
        case Some(v) => row.update(i, internalValue(f.dataType, v))
        case None => row.setNullAt(i)
      }
    }
    row
  }

  /** Typed values for FilePrune (name -> value or null). Columns whose
    * raw value fails to decode are omitted — absent means unprunable.
    */
  def decodeExternal(tableSchema: StructType, partitionBy: Seq[String],
      raw: Map[String, Option[String]]): Map[String, Any] =
    raw.flatMap { case (c, r) =>
      if (!tableSchema.fieldNames.contains(c)) None
      else r match {
        case None => Some(c -> null)
        case Some(s) =>
          try Some(c -> internalValue(tableSchema(c).dataType, s))
          catch { case _: Exception => None }
      }
    }
}
