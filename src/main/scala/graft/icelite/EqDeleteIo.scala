package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared write-side machinery for EQUALITY delete files, used by the
  * batch ops ([[IceTable.upsertMorEq]]/[[IceTable.deleteKeysEq]]) and the
  * native streaming sink's CDC upsert mode — one implementation, one file
  * format, identical pruning metadata.
  */
private[graft] object EqDeleteIo {

  /** Key column types the equality-delete probe can hash and compare by
    * value on both the write (delete file) and read (scan filter) side.
    * Binary keys are excluded (array equality is referential in the
    * probe's domain); nested types have no stat encoding.
    */
  def keyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | StringType |
           BooleanType | DateType | TimestampType | TimestampNTZType |
           FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
  }

  /** Write `keyDf`'s DISTINCT rows as ONE sorted parquet file under
    * `data/eqdeletes-snap-<id>-<uuid>` and return
    * `(delDir, delFile, keyRows, eqMin, eqMax)` — bounds taken from the
    * delete file's own footer (the exact stat encoding FilePrune compares
    * against), withheld for any key column that holds NULLs or lacks
    * usable stats (bounds prune by VALUE range, and a null key matches
    * outside any range — absent bounds keep planning conservative).
    * Returns None (and removes the dir) when the key set is empty.
    */
  def writeKeyFile(spark: SparkSession, fs: FileSystem, tableDir: Path,
      snapId0: Long, keyDf: DataFrame, keys: Seq[String])
      : Option[(String, String, Long, Map[String, String], Map[String, String])] = {
    val delDir = new Path(tableDir,
      f"data/eqdeletes-snap-$snapId0%05d-${java.util.UUID.randomUUID().toString.take(8)}")
    keyDf.select(keys.map(col): _*).distinct()
      .repartition(1).sortWithinPartitions(keys.map(col): _*)
      .write.mode("errorifexists").parquet(delDir.toString)
    val it = fs.listFiles(delDir, true)
    val delFiles = Iterator.continually(it).takeWhile(_.hasNext)
      .map(_.next().getPath).filter(_.getName.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
    require(delFiles.length == 1,
      s"equality-delete write produced ${delFiles.length} files, expected 1")
    val delStat = FileStats.collect(
      spark.sparkContext.hadoopConfiguration, delFiles).head
    if (delStat.rows == 0) {
      fs.delete(delDir, true)
      return None
    }
    val boundedCols = keys.filter(c => delStat.nullCount(c).contains(0L)).toSet
    Some((delDir.toString, delFiles.head, delStat.rows,
      delStat.min.view.filterKeys(boundedCols).toMap,
      delStat.max.view.filterKeys(boundedCols).toMap))
  }
}
