package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.icelite.{FileStat, FileStats, MetaIo, SnapshotMeta}

/** Group-based (copy-on-write) row-level operations: SQL `UPDATE`,
  * `MERGE INTO`, and the rewrite form of `DELETE` against icelite tables.
  *
  * Spark's rewrite plans work in groups: the operation's scan selects the
  * files that MAY contain affected rows (manifest-stat + partition-value
  * pruning on the pushed condition — the same `FilePrune` machinery as
  * plain scans), the rewrite query recomputes the full post-operation
  * content of exactly those files, and the operation's write commits a
  * snapshot in which the scanned files are replaced by the newly written
  * ones while every unscanned file carries forward untouched. A 1-row
  * UPDATE on a 100 TB table therefore rewrites one file.
  *
  * Two properties keep this correct:
  *  - the row-level scan NEVER drops rows inside a planned file (filters
  *    stay residual AND no parquet row-group predicate is installed —
  *    skipped rows would silently vanish from the rewrite);
  *  - scan and write are paired through this operation instance: whatever
  *    the scan planned is exactly what commit() replaces, so the pairing
  *    holds under AQE replanning (recording is idempotent by path).
  */
private[v2] class IceLiteRowLevelOperation(
    warehouse: String, ns: String, tbl: String,
    tableSchema: StructType, partitionBy: Seq[String], files: Seq[FileStat],
    cmd: RowLevelOperation.Command,
    renames: Seq[graft.icelite.ColumnRename] = Nil,
    specs: Seq[graft.icelite.PartSpecChange] = Nil,
    // outstanding position deletes: the operation's scan must apply them
    // (rewritten files are rebuilt from POST-delete content) and its
    // commit carries the survivors' entries forward
    deletes: Seq[graft.icelite.DeleteStat] = Nil) extends RowLevelOperation {

  private val scanned =
    new java.util.concurrent.ConcurrentHashMap[String, FileStat]()

  private[v2] def recordPlanned(fs: Seq[FileStat]): Unit =
    fs.foreach(f => scanned.put(f.path, f))

  private[v2] def scannedPaths: Set[String] = {
    import scala.jdk.CollectionConverters._
    scanned.keySet().asScala.toSet
  }

  override def command(): RowLevelOperation.Command = cmd

  /** Requesting `_file` does two jobs: it is the natural bookkeeping column
    * of a group-based operation (which file each row came from), and its
    * presence makes Spark build a metadata projection for the rewrite —
    * ReplaceDataExec applies the paired DATA projection only then, so the
    * writer receives exactly table-shaped rows instead of raw query rows
    * with bookkeeping columns prepended (whose layout is an implementation
    * detail of the rewrite plan and not stable across Spark versions).
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(
      IceLiteScan.FileMetaCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IceLiteScanBuilder(warehouse, ns, tbl, tableSchema, partitionBy, files,
      rowLevel = Some(this), renames = renames, specs = specs, deletes = deletes)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new IceLiteReplaceGroupsWriteBuilder(warehouse, ns, tbl, partitionBy,
      info.schema(), this)

  override def description(): String =
    s"icelite row-level ${cmd.toString.toLowerCase} of $ns.$tbl"
}

/** Write half of a row-level operation: identical task-level mechanics to
  * the append write (staging dir, per-task parquet files with executor-side
  * stats, abort cleanup), but commit() REPLACES the operation's scanned
  * files instead of carrying the full previous file set.
  */
private[v2] class IceLiteReplaceGroupsWriteBuilder(
    warehouse: String, ns: String, tbl: String, partitionBy: Seq[String],
    schema: StructType, op: IceLiteRowLevelOperation)
    extends WriteBuilder {

  override def build(): Write = {
    // COW rewrites of a sorted table must re-sort what they rewrite, or a
    // single UPDATE would silently break the reported ordering
    val dir = new Path(new Path(warehouse, ns), tbl)
    val sortOrder = MetaIo.read(
      dir.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration),
      dir).sortOrder
    IceLiteWriteShape.of(partitionBy,
      new IceLiteReplaceGroupsBatchWrite(warehouse, ns, tbl, partitionBy, schema, op),
      sortOrder = sortOrder,
      // row-level SQL (DELETE/UPDATE/MERGE) only ever reaches a table
      // through the catalog, so transforms are always resolvable here
      transformsResolvable = true)
  }
}

private[v2] class IceLiteReplaceGroupsBatchWrite(
    warehouse: String, ns: String, tbl: String, partitionBy: Seq[String],
    schema: StructType, op: IceLiteRowLevelOperation) extends BatchWrite {

  private val stagingName = s".staging-${UUID.randomUUID()}"
  private def tableDir = new Path(new Path(warehouse, ns), tbl)
  private def hadoopConf = SparkSession.active.sparkContext.hadoopConfiguration
  private def fs = tableDir.getFileSystem(hadoopConf)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new IceLiteWriterFactory(
      new Path(tableDir, s"data/$stagingName").toString, schema.toDDL,
      partitionBy,
      new org.apache.spark.util.SerializableConfiguration(hadoopConf),
      rowLevel = true)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val m = MetaIo.read(fs, tableDir)
    val added0 = messages.collect { case msg: IceLiteCommitMessage => msg.stats }
      .toSeq.flatten
    // a no-op operation (nothing scanned, nothing written) must not commit
    // a snapshot: a spurious non-append entry would break incremental and
    // streaming readers for no change at all
    if (op.scannedPaths.isEmpty && added0.isEmpty) {
      abort(messages)
      return
    }
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val dataDir = new Path(tableDir, f"data/snap-$snapId%05d")
    val staging = new Path(tableDir, s"data/$stagingName")
    if (!fs.exists(staging)) fs.mkdirs(staging) // zero-partition rewrite
    require(fs.rename(staging, dataDir),
      s"failed to publish staging dir for $ns.$tbl snapshot $snapId")
    val added = added0
      .map(st => st.copy(path = fs.makeQualified(new Path(
        st.path.replace(s"data/$stagingName", f"data/snap-$snapId%05d"))).toString))
      .sortBy(_.path)
    val prev = m.currentSnapshot
    val visible = prev.map(p => FileStats.visible(fs, p)).getOrElse(Nil)
    val replaced = op.scannedPaths
    // legacy carried entries (unknown rows) cannot fall back to the
    // previous total here — the carried set EXCLUDES the replaced files,
    // so derive real counts from footers (also heals the manifest)
    val carried = FileStats.ensureRows(hadoopConf,
      visible.filterNot(f => replaced.contains(f.path)))
    val carriedDirs = prev.map(p => FileStats.dataDirsOf(fs, p)).getOrElse(Nil)
      .filter(d =>
        carried.exists(f => fs.makeQualified(new Path(f.path)).toString
          .startsWith(fs.makeQualified(new Path(d)).toString + "/")))
    val addedRows = added.map(_.rows).sum
    val carriedRows = carried.map(_.rows).sum
    // replaced files were rebuilt from POST-delete content; carried files
    // keep their position-delete entries (and the delete dirs stay
    // referenced so expiry cannot reclaim them early)
    val carriedDeletes = FileStats.trimDeletes(
      prev.map(p => FileStats.deletesOf(fs, p)).getOrElse(Nil),
      carried.map(f => fs.makeQualified(new Path(f.path)).toString).toSet)
    val delDirs = carriedDeletes
      .map(d => new Path(d.path).getParent.toString).distinct
    val snap = SnapshotMeta(
      snapshotId = snapId, timestampMs = System.currentTimeMillis(),
      operation = op.command().toString.toLowerCase,
      dataDirs = carriedDirs ++ delDirs :+ dataDir.toString,
      addedFiles = added.map(_.path), addedRows = addedRows,
      totalRows = carriedRows + addedRows - carriedDeletes.map(_.rows).sum,
      addedFileCount = added.length.toLong,
      schemaDdl = m.schemaDdl,
      files = (carried ++ added).sortBy(_.path),
      deletes = carriedDeletes,
      parentId = m.currentSnapshotId)
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
