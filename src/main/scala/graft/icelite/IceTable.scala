package graft.icelite

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** A versioned Parquet table: snapshot-pinned scans with projection/limit
  * pushdown, and append / replace / primary-key-upsert writes.
  *
  * Spark-native re-expression of the reference's PyIceberg table surface:
  * scan with `snapshot_id` + `selected_fields` + `limit`
  * (`components/ex-iceberg/src/component.py:36-40`), `append`
  * (`wr/src/component.py:110`), `upsert` (`wr:107-108`), replace
  * (`wr:115-124`). Scans are plain Catalyst parquet relations, so filter /
  * projection / limit pushdown, vectorized reads, and AQE all apply — the
  * scan-level pushdowns the reference wires by hand arrive via the optimizer.
  *
  * Scale notes: data is addressed per snapshot *directory* (not per file), so
  * planning cost is O(snapshots), and each write is a normal distributed
  * Spark parquet job. Optional `partitionBy` (honoring the config key the
  * reference parses but never uses, `wr/src/configuration.py:31`) lays data
  * out hive-style for partition pruning.
  */
class IceTable(
    spark: SparkSession,
    catalog: IceCatalog,
    val namespace: String,
    val name: String) {

  private val tableDir: Path = catalog.tablePath(namespace, name)
  private def fs = catalog.fs

  def meta: TableMeta = MetaIo.read(fs, tableDir)
  def schema: StructType = StructType.fromDDL(meta.schemaDdl)
  def snapshots: Seq[SnapshotMeta] = meta.snapshots

  // -- read path --------------------------------------------------------------

  /** Snapshot-pinned scan with optional projection and limit (S1/R1-R3). */
  def scan(columns: Seq[String] = Nil, limit: Option[Long] = None,
      snapshotId: Option[Long] = None): DataFrame = {
    val m = meta
    val snap = snapshotId match {
      case Some(id) => m.snapshot(id).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $id in $namespace.$name"))
      case None => m.currentSnapshot.orNull
    }
    // read pinned snapshots with their own schema: replace() may have
    // changed the table schema since, and old files carry the old one
    val tableSchema = StructType.fromDDL(
      if (snap != null && snap.schemaDdl.nonEmpty) snap.schemaDdl else m.schemaDdl)
    val base =
      if (snap == null || snap.dataDirs.isEmpty) {
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], tableSchema)
      } else if (m.partitionBy.nonEmpty) {
        // partitioned layout: partition values live in directory names, so
        // read per-directory with basePath and let Spark reconstruct them
        snap.dataDirs
          .map(d => spark.read.option("basePath", d).parquet(d)
            .select(tableSchema.fieldNames.map(col): _*))
          .reduce(_ unionByName _)
      } else {
        spark.read.schema(tableSchema).parquet(snap.dataDirs: _*)
      }
    val projected = if (columns.nonEmpty) base.select(columns.map(col): _*) else base
    limit.map(n => projected.limit(n.toInt)).getOrElse(projected)
  }

  def toDF: DataFrame = scan()

  // -- write path -------------------------------------------------------------

  /** Align an incoming DataFrame to the table schema: same column set
    * (any order), each column cast to the declared type. Schema drift fails
    * loudly, matching the reference's PyIceberg behavior (SURVEY §7).
    */
  private def conform(df: DataFrame, tableSchema: StructType): DataFrame = {
    val have = df.columns.toSet
    val want = tableSchema.fieldNames.toSet
    require(have == want,
      s"schema mismatch for $namespace.$name: incoming ${have.toSeq.sorted} vs table ${want.toSeq.sorted}")
    df.select(tableSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Write df into a fresh snapshot directory; returns (dir, files, rows). */
  private def writeData(df: DataFrame, snapId: Long, partitionBy: Seq[String]): (String, Seq[String], Long) = {
    val dataDir = new Path(tableDir, f"data/snap-$snapId%05d")
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir.toString)
    val it = fs.listFiles(dataDir, true)
    val files = Iterator.continually(it).takeWhile(_.hasNext)
      .map(_.next().getPath).filter(_.getName.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
    // count() over freshly written parquet resolves from footer metadata only
    val rows = spark.read.parquet(dataDir.toString).count()
    (dataDir.toString, files, rows)
  }

  private def commitSnapshot(operation: String, dataDirs: Seq[String],
      added: (String, Seq[String], Long), prevTotal: Long,
      newSchemaDdl: Option[String] = None): IceTable = {
    val m = meta
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val snap = SnapshotMeta(
      snapshotId = snapId, timestampMs = System.currentTimeMillis(),
      operation = operation, dataDirs = dataDirs,
      addedFiles = added._2, addedRows = added._3, totalRows = prevTotal + added._3,
      schemaDdl = newSchemaDdl.getOrElse(m.schemaDdl))
    MetaIo.commit(fs, tableDir, m.copy(
      schemaDdl = newSchemaDdl.getOrElse(m.schemaDdl),
      currentSnapshotId = snapId,
      snapshots = m.snapshots :+ snap,
      version = m.version + 1))
    this
  }

  /** Bag-union append — one snapshot per call (K4, `wr:110`). */
  def append(df: DataFrame): IceTable = {
    val m = meta
    val conformed = conform(df, StructType.fromDDL(m.schemaDdl))
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val added = writeData(conformed, snapId, m.partitionBy)
    val prevDirs = m.currentSnapshot.map(_.dataDirs).getOrElse(Nil)
    commitSnapshot("append", prevDirs :+ added._1, added,
      m.currentSnapshot.map(_.totalRows).getOrElse(0L))
  }

  /** Full rewrite with the incoming schema (K6 CTAS semantics, `wr:115-124`). */
  def replace(df: DataFrame): IceTable = {
    val m = meta
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val added = writeData(df, snapId, m.partitionBy)
    commitSnapshot("replace", Seq(added._1), added, 0L,
      newSchemaDdl = Some(df.schema.toDDL))
  }

  /** Compaction: rewrite the current snapshot's file set into
    * `targetFiles` larger files (bin-packing many small append outputs —
    * the maintenance half of an Iceberg-style table's lifecycle). Pure
    * rewrite: same rows, new snapshot with operation "compact"; older
    * snapshots keep pointing at the original immutable directories, so time
    * travel is unaffected. The data move is one distributed coalesce-write;
    * planning stays O(files).
    */
  def compact(targetFiles: Int = 1): IceTable = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val m = meta
    val current = m.currentSnapshot.getOrElse(
      throw new IllegalStateException(s"nothing to compact in $namespace.$name"))
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val df = toDF.coalesce(targetFiles)
    val added = writeData(df, snapId, m.partitionBy)
    require(added._3 == current.totalRows,
      s"compaction row-count drift: ${added._3} != ${current.totalRows}")
    commitSnapshot("compact", Seq(added._1), added, 0L)
  }

  /** Primary-key upsert (K5, `wr:107-108`): matched target rows take the
    * source's values, unmatched source rows are inserted, unmatched target
    * rows survive. Null-safe key equality. Physically a full rewrite into a
    * new snapshot — the Spark plan is one anti-join + union, which Catalyst
    * executes as broadcast or shuffle join depending on source size.
    */
  def upsert(df: DataFrame, keys: Seq[String]): IceTable = {
    require(keys.nonEmpty,
      s"upsert into $namespace.$name requires a primary key (config or manifest)")
    val m = meta
    val tableSchema = StructType.fromDDL(m.schemaDdl)
    val src = conform(df, tableSchema)
    val tgt = toDF
    val cond = keys.map(k => tgt(k) <=> src(k)).reduce(_ && _)
    val merged = tgt.join(src, cond, "left_anti").unionByName(src)
    val snapId = m.snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val added = writeData(merged, snapId, m.partitionBy)
    commitSnapshot("upsert", Seq(added._1), added, 0L)
  }
}
