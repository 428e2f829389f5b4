package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.icelite.{FileStat, FileStats, MetaIo, SnapshotMeta}

/** Distributed append for IceLite tables through the DSv2 write API
  * (`INSERT INTO <catalog>.<ns>.<tbl>`, `df.writeTo(...).append()`).
  *
  * Commit protocol (two-phase, same shape as any object-store table
  * format): executors write parquet task files into a staging directory
  * `data/.staging-<uuid>` and report (file, rows, column stats) back as
  * commit messages; only the driver's `commit()` renames the staging
  * directory to the next `data/snap-NNNNN` and appends the snapshot — with
  * its complete file manifest — to the metadata log via the existing
  * version-file commit. Failed/speculative task output is doubly invisible:
  * the per-task `abort()` deletes the partial file, and scans plan from the
  * committed manifest (never directory listings), so only files named in a
  * commit message can ever be read. Parallelism: one writer (and one output
  * file) per input partition.
  */
private[v2] class IceLiteWriteBuilder(
    warehouse: String, ns: String, table: String, info: LogicalWriteInfo)
    extends WriteBuilder {

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new IceLiteBatchWrite(warehouse, ns, table, info.schema())
  }
}

private[v2] case class IceLiteCommitMessage(stat: FileStat)
    extends WriterCommitMessage

private[v2] class IceLiteBatchWrite(
    warehouse: String, ns: String, table: String, schema: StructType)
    extends BatchWrite {

  private val stagingName = s".staging-${UUID.randomUUID()}"

  private def tableDir = new Path(new Path(warehouse, ns), table)
  private def hadoopConf = SparkSession.active.sparkContext.hadoopConfiguration
  private def fs = tableDir.getFileSystem(hadoopConf)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // verify the incoming schema against the table before any task runs:
    // same column set AND same types (a name-only check would let an
    // int-vs-bigint drift write files that disagree with the table schema
    // and only fail at scan time)
    val meta = MetaIo.read(fs, tableDir)
    val tableSchema = StructType.fromDDL(meta.schemaDdl)
    require(tableSchema.fieldNames.sorted.sameElements(schema.fieldNames.sorted),
      s"schema mismatch writing to $ns.$table: " +
        s"incoming ${schema.fieldNames.toSeq.sorted} vs table ${tableSchema.fieldNames.toSeq.sorted}")
    val typeDrift = tableSchema.fields.flatMap { f =>
      val in = schema(f.name).dataType
      if (in == f.dataType) None else Some(s"${f.name}: $in vs ${f.dataType}")
    }
    require(typeDrift.isEmpty,
      s"type mismatch writing to $ns.$table (incoming vs table): ${typeDrift.mkString(", ")}")
    require(meta.partitionBy.isEmpty,
      s"icelite DSv2 write supports unpartitioned tables; " +
        s"use IceTable.append for partitioned layouts")
    new IceLiteWriterFactory(
      new Path(tableDir, s"data/$stagingName").toString, schema.toDDL,
      new SerializableConfiguration(hadoopConf))
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val m = MetaIo.read(fs, tableDir)
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val dataDir = new Path(tableDir, f"data/snap-$snapId%05d")
    val staging = new Path(tableDir, s"data/$stagingName")
    if (!fs.exists(staging)) fs.mkdirs(staging) // zero-partition write
    require(fs.rename(staging, dataDir),
      s"failed to publish staging dir for $ns.$table snapshot $snapId")
    val added = messages.collect { case msg: IceLiteCommitMessage =>
      msg.stat.copy(path =
        msg.stat.path.replace(s"data/$stagingName", f"data/snap-$snapId%05d"))
    }.toSeq.sortBy(_.path)
    val rows = added.map(_.rows).sum
    val prev = m.currentSnapshot
    val carried: Seq[FileStat] = prev.map { p =>
      if (p.files.nonEmpty || p.dataDirs.isEmpty) p.files
      else p.dataDirs.flatMap { d => // legacy snapshot: degrade to listing
        val it = fs.listFiles(new Path(d), true)
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next())
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(st => FileStat(st.getPath.toString, rows = -1L, bytes = st.getLen))
          .toSeq
      }
    }.getOrElse(Nil)
    val snap = SnapshotMeta(
      snapshotId = snapId, timestampMs = System.currentTimeMillis(),
      operation = "append",
      dataDirs = prev.map(_.dataDirs).getOrElse(Nil) :+ dataDir.toString,
      addedFiles = added.map(_.path), addedRows = rows,
      totalRows = prev.map(_.totalRows).getOrElse(0L) + rows,
      schemaDdl = m.schemaDdl,
      files = (carried ++ added).sortBy(_.path))
    MetaIo.commit(fs, tableDir, m.copy(
      currentSnapshotId = snapId,
      snapshots = m.snapshots :+ snap,
      version = m.version + 1))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(tableDir, s"data/$stagingName")
    if (fs.exists(staging)) fs.delete(staging, true)
    ()
  }
}

private[v2] class IceLiteWriterFactory(
    stagingDir: String, schemaDdl: String, conf: SerializableConfiguration)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new IceLiteDataWriter(stagingDir, StructType.fromDDL(schemaDdl),
      partitionId, taskId, conf)
}

/** Writes one parquet file per task via the public parquet-mr Group API —
  * the symmetric inverse of the scan's type surface. Uses the driver's
  * Hadoop configuration (serialized into the factory), so `spark.hadoop.*`
  * settings — object-store credentials, endpoints — reach parquet-mr.
  */
private[v2] class IceLiteDataWriter(
    stagingDir: String, schema: StructType, partitionId: Int, taskId: Long,
    conf: SerializableConfiguration)
    extends DataWriter[InternalRow] {

  private val file = f"$stagingDir/part-$partitionId%05d-$taskId.parquet"
  private val messageType: MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t: Type = f.dataType match {
        case LongType => Types.optional(PrimitiveType.PrimitiveTypeName.INT64).named(f.name)
        case IntegerType => Types.optional(PrimitiveType.PrimitiveTypeName.INT32).named(f.name)
        case DoubleType => Types.optional(PrimitiveType.PrimitiveTypeName.DOUBLE).named(f.name)
        case FloatType => Types.optional(PrimitiveType.PrimitiveTypeName.FLOAT).named(f.name)
        case BooleanType => Types.optional(PrimitiveType.PrimitiveTypeName.BOOLEAN).named(f.name)
        case StringType => Types.optional(PrimitiveType.PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
        case DateType => Types.optional(PrimitiveType.PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType()).named(f.name)
        case TimestampType => Types.optional(PrimitiveType.PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case TimestampNTZType => Types.optional(PrimitiveType.PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.MICROS))
          .named(f.name)
        case dt => throw new UnsupportedOperationException(
          s"icelite DSv2 writer: unsupported type $dt for ${f.name}")
      }
      b.addField(t)
    }
    b.named("icelite")
  }

  private val writer = ExampleParquetWriter.builder(new Path(file))
    .withConf(conf.value)
    .withType(messageType)
    .build()
  private val factory = new SimpleGroupFactory(messageType)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val g: Group = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType => g.add(i, row.getLong(i))
        case IntegerType | DateType => g.add(i, row.getInt(i))
        case DoubleType => g.add(i, row.getDouble(i))
        case FloatType => g.add(i, row.getFloat(i))
        case BooleanType => g.add(i, row.getBoolean(i))
        case StringType => g.add(i, row.getUTF8String(i).toString)
        case TimestampType | TimestampNTZType => g.add(i, row.getLong(i))
        case dt => throw new IllegalStateException(s"unreachable: $dt")
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    // stats from this task's own freshly-written footer, executor-side —
    // the driver never re-opens data files
    IceLiteCommitMessage(FileStats.fromFooter(conf.value, file))
  }

  /** A failed/retried/speculative task must leave nothing behind: close the
    * writer (its footer would otherwise be readable) and delete the file.
    */
  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    val p = new Path(file)
    val pfs = p.getFileSystem(conf.value)
    if (pfs.exists(p)) pfs.delete(p, false)
    ()
  }

  override def close(): Unit = ()
}
