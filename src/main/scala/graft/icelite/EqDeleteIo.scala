package graft.icelite

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Equality-delete key-file IO shared by `deleteKeysEq` and `upsertMorEq`:
  * one sorted parquet file of distinct key tuples per commit, whose own
  * footer supplies the delete's key bounds.
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

  /** Small deletes inline their key values in the manifest (stat-encoded,
    * per column) so plan time can probe each value against a data file's
    * min/max range and opt-in bloom and EXEMPT files that provably hold
    * none of them. The cap bounds the manifest entry (~tens of KB worst
    * case) and the plan-time probe count; larger deletes fall back to the
    * range test alone.
    */
  val InlineKeyCap = 1000

  /** Stat-string encoding of one EXTERNAL key value, the exact inverse of
    * [[FilePrune.keyValue]]'s decode domain. None = this type/value does
    * not participate in inline-key exemption (conservative).
    */
  private def encodeKey(dt: org.apache.spark.sql.types.DataType,
      v: Any): Option[String] = {
    import org.apache.spark.sql.types._
    if (v == null) return None
    (dt, v) match {
      case (ByteType | ShortType | IntegerType | LongType, n: Number) =>
        Some(n.longValue.toString)
      case (DateType, d: java.sql.Date) =>
        Some(d.toLocalDate.toEpochDay.toString)
      case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay.toString)
      case (TimestampType | TimestampNTZType, t: java.sql.Timestamp) =>
        Some((Math.floorDiv(t.getTime, 1000L) * 1000000L +
          t.getNanos / 1000L).toString)
      case (TimestampType | TimestampNTZType, i: java.time.Instant) =>
        Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
      case (TimestampType | TimestampNTZType, l: java.time.LocalDateTime) =>
        val i = l.toInstant(java.time.ZoneOffset.UTC)
        Some((i.getEpochSecond * 1000000L + i.getNano / 1000L).toString)
      case (StringType, s: String) => Some(s)
      case (BooleanType, b: java.lang.Boolean) => Some(b.toString)
      // decimals inline in the stat-string encoding (scaled plain string
      // at the column's DECLARED scale — scale>0 always emits a '.', so
      // the decode side's legacy dot-guard accepts it); values read back
      // from the written delete file already carry the declared scale, so
      // setScale is exact (the Try only guards a caller bypassing that)
      case (d: DecimalType, bd: java.math.BigDecimal) =>
        scala.util.Try(bd.setScale(d.scale).toPlainString).toOption
      case _ => None
    }
  }

  /** Write `keyDf`'s DISTINCT rows as ONE sorted parquet file under
    * `data/eqdeletes-snap-<id>-<uuid>` and return
    * `(delDir, delFile, keyRows, eqMin, eqMax, eqKeys)` — bounds taken
    * from the delete file's own footer (the exact stat encoding FilePrune
    * compares against), withheld for any key column that holds NULLs or
    * lacks usable stats (bounds prune by VALUE range, and a null key
    * matches outside any range — absent bounds keep planning
    * conservative); `eqKeys` carries the inline per-column key values when
    * the key set fits [[InlineKeyCap]] and every value encodes. Returns
    * None (and removes the dir) when the key set is empty.
    */
  def writeKeyFile(spark: SparkSession, fs: FileSystem, tableDir: Path,
      snapId0: Long, keyDf: DataFrame, keys: Seq[String])
      : Option[(String, String, Long, Map[String, String],
        Map[String, String], Map[String, Seq[String]])] = {
    val delDir = new Path(tableDir,
      f"data/eqdeletes-snap-$snapId0%05d-${java.util.UUID.randomUUID().toString.take(8)}")
    val sorted = keyDf.select(keys.map(col): _*).distinct()
      .repartition(1).sortWithinPartitions(keys.map(col): _*)
    // the write below rides the row-loop writer unconditionally (its footer
    // stats ARE the delete's bounds), so refuse driver-side, naming the
    // column, rather than dying per-task inside parquet-mr. [[keyType]]
    // keys are all row-writable, so this only fires on a caller bypassing
    // that gate.
    require(graft.sources.v2.IceLiteRowWrite.supports(sorted.schema, Nil),
      s"equality-delete key column(s) ${sorted.schema.fields
        .map(f => s"${f.name} (${f.dataType.simpleString})").mkString(", ")} " +
        "outside the row-loop writer's type surface")
    fs.mkdirs(delDir)
    val stats = graft.sources.v2.IceLiteRowWrite.write(
      sorted, fs.makeQualified(delDir).toString, partitionBy = Nil,
      ndvCols = "")
    if (stats.isEmpty || stats.map(_.rows).sum == 0) {
      fs.delete(delDir, true)
      return None
    }
    require(stats.length == 1,
      s"equality-delete write produced ${stats.length} files, expected 1")
    val delStat = stats.head
    val boundedCols = keys.filter(c => delStat.nullCount(c).contains(0L)).toSet
    // inline keys: one bounded driver-side read of the WRITTEN delete file
    // (<= InlineKeyCap rows, gated by its exact row count). Reading the
    // file — not re-collecting the input DataFrame — is load-bearing: a
    // non-deterministic source recomputed differently could omit a key the
    // file actually holds, and a missing inline key would wrongly exempt a
    // file from the delete. Any null or non-encodable value drops that
    // COLUMN's list (per-column semantics stay independently sound).
    val eqKeys: Map[String, Seq[String]] =
      if (delStat.rows > InlineKeyCap) Map.empty
      else {
        val back = spark.read.schema(sorted.schema).parquet(delStat.path)
        val schema = back.schema
        val rows = back.collect()
        keys.zipWithIndex.flatMap { case (k, i) =>
          val dt = schema(k).dataType
          val enc = rows.map(r => encodeKey(dt, r.get(i)))
          if (enc.contains(None)) None
          else Some(k -> enc.flatten.toSeq.distinct)
        }.toMap
      }
    Some((delDir.toString, delStat.path, delStat.rows,
      delStat.min.view.filterKeys(boundedCols).toMap,
      delStat.max.view.filterKeys(boundedCols).toMap,
      eqKeys))
  }
}
