package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.icelite.MetaIo

/** DataSource V2 surface for IceLite tables: `spark.read.format("icelite")
  * .option("warehouse", wh).option("table", "ns.tbl").load()`, with optional
  * `snapshotId` time travel.
  *
  * This is the scan-level re-expression of the reference's
  * `table.scan(limit, snapshot_id, selected_fields)`
  * (`components/ex-iceberg/src/component.py:36-40`): the three manual knobs
  * become DSv2 pushdowns — `SupportsPushDownRequiredColumns` (projection
  * reaches the parquet page level via a requested reader schema),
  * `SupportsPushDownFilters` (row filters evaluated at the source), and
  * `SupportsPushDownLimit` (readers stop early). SURVEY §7 step 6.
  *
  * Scale: one input partition per parquet data file, so parallelism tracks
  * the file count exactly as a native file source's would; planning is
  * O(snapshot file list), driver-side metadata only.
  *
  * Scope notes (documented limits of the slice): unpartitioned tables only
  * (the DataFrame-API `IceTable.scan` covers hive-partitioned layouts), and
  * the type surface is IceLite's own writer output — primitives, string,
  * date, timestamp (INT64 micros or legacy INT96).
  */
class IceLiteSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "icelite"

  private def loadMeta(options: CaseInsensitiveStringMap) = {
    val warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException("icelite: missing option 'warehouse'"))
    val ident = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("icelite: missing option 'table' (ns.tbl)"))
    val Array(ns, tbl) = ident.split("\\.", 2)
    IceLiteV2.loadMeta(warehouse, ns, tbl)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val meta = loadMeta(options)._1
    IceLiteV2.schemaAt(meta, IceLiteV2.pinnedSnapshot(meta, Option(options.get("snapshotId"))))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (meta, fs) = loadMeta(options)
    val warehouse = Option(options.get("warehouse")).get
    IceLiteV2.buildTable(warehouse, meta, fs,
      Option(options.get("snapshotId")), Some(schema))
  }
}

/** Shared table-construction logic for the [[IceLiteSource]] format path and
  * the [[IceLiteCatalog]] SQL-catalog path.
  */
private[v2] object IceLiteV2 {

  def loadMeta(warehouse: String, ns: String, tbl: String)
      : (graft.icelite.TableMeta, org.apache.hadoop.fs.FileSystem) = {
    val dir = new Path(new Path(warehouse, ns), tbl)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    if (!MetaIo.exists(fs, dir))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(ns, tbl))
    (MetaIo.read(fs, dir), fs)
  }

  def pinnedSnapshot(meta: graft.icelite.TableMeta,
      snapshotId: Option[String]): graft.icelite.SnapshotMeta =
    snapshotId match {
      case Some(id) => meta.snapshot(id.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot $id in ${meta.namespace}.${meta.name}"))
      case None => meta.currentSnapshot.orNull
    }

  /** Schema of the table as of the pinned snapshot (replace() may have
    * changed it since; old files carry the old schema).
    */
  def schemaAt(meta: graft.icelite.TableMeta,
      snap: graft.icelite.SnapshotMeta): StructType =
    StructType.fromDDL(
      if (snap != null && snap.schemaDdl.nonEmpty) snap.schemaDdl else meta.schemaDdl)

  def buildTable(warehouse: String, meta: graft.icelite.TableMeta,
      fs: org.apache.hadoop.fs.FileSystem,
      snapshotId: Option[String], schema: Option[StructType] = None): IceLiteTable = {
    require(meta.partitionBy.isEmpty,
      "icelite DSv2 scan supports unpartitioned tables; use IceTable.scan for partitioned layouts")
    val snap = pinnedSnapshot(meta, snapshotId)
    val files: Seq[String] =
      if (snap == null) Nil
      else snap.dataDirs.flatMap { d =>
        val it = fs.listFiles(new Path(d), true)
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next().getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(_.toString).toSeq
      }.sorted
    new IceLiteTable(warehouse, meta.namespace, meta.name,
      schema.getOrElse(schemaAt(meta, snap)), files)
  }
}

private[v2] class IceLiteTable(
    warehouse: String, ns: String, tbl: String,
    tableSchema: StructType, files: Seq[String])
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"$ns.$tbl"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IceLiteScanBuilder(name(), tableSchema, files)

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new IceLiteWriteBuilder(warehouse, ns, tbl, info)
}

private[v2] class IceLiteScanBuilder(
    tableName: String, tableSchema: StructType, files: Seq[String])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve table-declared field order for a stable reader projection
    required = StructType(tableSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(FilterEval.supports(_, tableSchema))
    pushed = ok
    residual // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(n: Int): Boolean = { limit = n; false /* partial: per-partition */ }

  override def build(): Scan =
    new IceLiteScan(tableName, tableSchema, required, files, pushed, limit)
}

private[v2] class IceLiteScan(
    tableName: String, tableSchema: StructType, required: StructType,
    files: Seq[String], filters: Array[Filter], limit: Int) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"icelite $tableName files=${files.size} " +
      s"readSchema=${required.fieldNames.mkString(",")} " +
      s"pushedFilters=[${filters.mkString(", ")}] limit=$limit"

  /** Columns the readers must decode: the required output plus any column a
    * pushed filter references (Spark prunes fully-pushed filter columns out
    * of the required schema, but the source still has to evaluate them).
    */
  private def readerSchema: StructType = {
    val filterCols = filters.flatMap(_.references).toSet
    StructType(tableSchema.fields.filter(f =>
      required.fieldNames.contains(f.name) || filterCols.contains(f.name)))
  }

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => IceLiteInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new IceLiteReaderFactory(readerSchema, required.fieldNames, filters, limit)
}

private[v2] case class IceLiteInputPartition(file: String) extends InputPartition

private[v2] class IceLiteReaderFactory(
    readerSchema: StructType, outputCols: Array[String],
    filters: Array[Filter], limit: Int)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[IceLiteInputPartition].file
    new IceLitefileReader(file, readerSchema, outputCols, filters, limit)
  }
}

/** Reads one parquet data file through the public parquet-mr Group API with
  * a projected requested schema (true column pruning: unrequested columns'
  * pages are never decoded), applying pushed filters row-wise and stopping
  * at the pushed (per-partition) limit.
  */
private[v2] class IceLitefileReader(
    file: String, readerSchema: StructType, outputCols: Array[String],
    filters: Array[Filter], limit: Int)
    extends PartitionReader[InternalRow] {

  private val conf = new Configuration()

  private val reader: ParquetReader[Group] = {
    // a zero-column scan (e.g. count(*)) still has to iterate rows: decode
    // the narrowest thing available — the first file column — and emit
    // empty rows
    val path = new Path(file)
    val footer = org.apache.parquet.hadoop.ParquetFileReader
      .readFooter(conf, path, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
    val fileSchema = footer.getFileMetaData.getSchema
    val names: Seq[String] =
      if (readerSchema.nonEmpty) readerSchema.fieldNames.toSeq
      else Seq(fileSchema.getFields.get(0).getName)
    val fieldList: Seq[org.apache.parquet.schema.Type] =
      names.map(n => fileSchema.getType(Seq(n): _*))
    val requested = new org.apache.parquet.schema.MessageType(
      fileSchema.getName, fieldList.asJava)
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA, requested.toString)
    ParquetReader.builder(new GroupReadSupport(), path).withConf(conf).build()
  }

  private val outputIdx: Array[Int] = outputCols.map(readerSchema.fieldIndex)
  private var row: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var g = reader.read()
    while (g != null) {
      if (readerSchema.isEmpty) {
        row = new GenericInternalRow(0)
        emitted += 1
        return true
      }
      val candidate = convert(g)
      if (filters.forall(FilterEval.eval(_, readerSchema, candidate))) {
        row = project(candidate)
        emitted += 1
        return true
      }
      g = reader.read()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()

  private def project(r: InternalRow): InternalRow =
    if (outputIdx.length == readerSchema.length &&
        outputIdx.zipWithIndex.forall { case (a, b) => a == b }) r
    else {
      val out = new GenericInternalRow(outputIdx.length)
      var i = 0
      while (i < outputIdx.length) {
        val v = r.get(outputIdx(i), readerSchema.fields(outputIdx(i)).dataType)
        out.update(i, v)
        i += 1
      }
      out
    }

  private def convert(g: Group): InternalRow = {
    val required = readerSchema
    val out = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      if (g.getFieldRepetitionCount(i) == 0) out.setNullAt(i)
      else required.fields(i).dataType match {
        case LongType => out.setLong(i, g.getLong(i, 0))
        case IntegerType => out.setInt(i, g.getInteger(i, 0))
        case DoubleType => out.setDouble(i, g.getDouble(i, 0))
        case FloatType => out.setFloat(i, g.getFloat(i, 0))
        case BooleanType => out.setBoolean(i, g.getBoolean(i, 0))
        case StringType => out.update(i, UTF8String.fromString(g.getString(i, 0)))
        case DateType => out.setInt(i, g.getInteger(i, 0))
        case TimestampType | TimestampNTZType =>
          val prim = g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName
          if (prim == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96)
            out.setLong(i, int96ToMicros(g.getInt96(i, 0)))
          else out.setLong(i, g.getLong(i, 0))
        case dt => throw new UnsupportedOperationException(
          s"icelite DSv2 reader: unsupported type $dt for ${required.fields(i).name}")
      }
      i += 1
    }
    out
  }

  /** Legacy INT96 timestamp: 8 bytes nanos-of-day LE + 4 bytes julian day LE. */
  private def int96ToMicros(b: org.apache.parquet.io.api.Binary): Long = {
    val buf = b.toByteBuffer.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }
}

/** Evaluates Spark source filters against converted rows. Only the filter
  * shapes and column types listed in [[supports]] are claimed at pushdown
  * time; everything else stays in the Spark plan above the scan.
  */
private[v2] object FilterEval {

  import org.apache.spark.sql.sources._

  private def comparable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | FloatType | BooleanType | StringType => true
    case _ => false
  }

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(c, v) => colOk(c, v, schema)
    case GreaterThan(c, v) => colOk(c, v, schema)
    case GreaterThanOrEqual(c, v) => colOk(c, v, schema)
    case LessThan(c, v) => colOk(c, v, schema)
    case LessThanOrEqual(c, v) => colOk(c, v, schema)
    case In(c, vs) => vs.nonEmpty && vs.forall(v => colOk(c, v, schema))
    // null checks are only claimable on types value() can decode — Spark
    // auto-generates IsNotNull for every referenced column, including
    // date/timestamp ones this reader does not evaluate
    case IsNull(c) => colTypeOk(c, schema)
    case IsNotNull(c) => colTypeOk(c, schema)
    case And(l, r) => supports(l, schema) && supports(r, schema)
    case Or(l, r) => supports(l, schema) && supports(r, schema)
    case Not(ch) => supports(ch, schema)
    case _ => false
  }

  private def colTypeOk(c: String, schema: StructType): Boolean =
    schema.fields.exists(f => f.name == c && comparable(f.dataType))

  private def colOk(c: String, v: Any, schema: StructType): Boolean =
    colTypeOk(c, schema) &&
      (v.isInstanceOf[Number] || v.isInstanceOf[String] || v.isInstanceOf[Boolean])

  def eval(f: Filter, schema: StructType, row: InternalRow): Boolean = {
    import org.apache.spark.sql.sources._
    def value(c: String): Any = {
      val i = schema.fieldIndex(c)
      if (row.isNullAt(i)) null
      else schema.fields(i).dataType match {
        case LongType => row.getLong(i)
        case IntegerType => row.getInt(i)
        case DoubleType => row.getDouble(i)
        case FloatType => row.getFloat(i)
        case BooleanType => row.getBoolean(i)
        case StringType => row.getUTF8String(i)
        case dt => throw new IllegalStateException(s"unexpected pushed type $dt")
      }
    }
    def isIntegral(x: Any): Boolean = x match {
      case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
           _: java.lang.Byte => true
      case _ => false
    }
    def cmp(a: Any, b: Any): Int = (a, b) match {
      // integral-integral compares exactly (a double detour loses precision
      // above 2^53); anything involving a floating side compares as double
      case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
        java.lang.Long.compare(x.longValue(), y.longValue())
      case (x: Number, y: Number) => java.lang.Double.compare(x.doubleValue(), y.doubleValue())
      // binary (UTF-8 byte) order — Spark's own string comparison semantics,
      // which differs from java.lang.String UTF-16 order beyond the BMP
      case (x: UTF8String, y: String) => x.binaryCompare(UTF8String.fromString(y))
      case (x: UTF8String, y: UTF8String) => x.binaryCompare(y)
      case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
      case _ => throw new IllegalStateException(s"incomparable $a / $b")
    }
    f match {
      case EqualTo(c, v) => val x = value(c); x != null && cmp(x, v) == 0
      case GreaterThan(c, v) => val x = value(c); x != null && cmp(x, v) > 0
      case GreaterThanOrEqual(c, v) => val x = value(c); x != null && cmp(x, v) >= 0
      case LessThan(c, v) => val x = value(c); x != null && cmp(x, v) < 0
      case LessThanOrEqual(c, v) => val x = value(c); x != null && cmp(x, v) <= 0
      case In(c, vs) => val x = value(c); x != null && vs.exists(v => cmp(x, v) == 0)
      case IsNull(c) => value(c) == null
      case IsNotNull(c) => value(c) != null
      case And(l, r) => eval(l, schema, row) && eval(r, schema, row)
      case Or(l, r) => eval(l, schema, row) || eval(r, schema, row)
      case Not(ch) => !eval(ch, schema, row)
      case other => throw new IllegalStateException(s"unsupported pushed filter $other")
    }
  }
}
