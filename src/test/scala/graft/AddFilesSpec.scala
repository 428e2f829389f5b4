package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.icelite.IceCatalog

/** `add_files` — import foreign parquet by reference (no rewrite, no
  * copy, no ownership transfer): footer-derived manifest entries, caller
  * keeps the files, the refusal surface names its remedies.
  */
class AddFilesSpec extends SparkSpec {

  private def hfs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("imports serve by reference with footer stats; lifecycle never deletes them") {
    import spark.implicits._
    val wh = scratch("addf1")
    val ext = scratch("addf1-external")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 100L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "v", "x")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 50).repartition(1))
    df.filter(col("id") > 50).repartition(2)
      .write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    assert(tbl.toDF.count() == 100)
    assert(tbl.toDF.where(col("id") === 99L).collect()
      .map(_.getString(1)).toSeq == Seq("v99"))
    // footer stats are REAL: a filter outside the imported range plans
    // zero imported files (min/max pruning on foreign files)
    val snap = tbl.meta.currentSnapshot.get
    assert(snap.operation == "add_files" && snap.addedRows == 50)
    val planned = tbl.toDF.where(col("id") <= 10L).inputFiles
    assert(planned.forall(p => !p.contains("addf1-external")),
      s"imported files not pruned by footer stats: ${planned.toSeq}")
    // expiry + orphan GC never touch foreign files (ownership stays out)
    tbl.append(df.limit(3))
    tbl.append(df.limit(3))
    tbl.expireSnapshots(keepLast = 1)
    tbl.removeOrphanFiles(graceMs = 0L)
    val extFiles = hfs(ext).listStatus(new Path(ext))
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(extFiles.length == 2, "lifecycle ops must not delete foreign files")
    assert(cat.loadTable("lake", "t").toDF.count() == 106)
    // re-import refuses
    val e = intercept[IllegalArgumentException](tbl.addFiles(ext))
    assert(e.getMessage.contains("already referenced"))
  }

  test("refusals: partitioned, sorted, schema drift, inside-tree, missing") {
    import spark.implicits._
    val wh = scratch("addf2")
    val ext = scratch("addf2-external")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(1).write.mode("overwrite").parquet(ext)
    // partitioned table refuses
    val pt = cat.createTable("lake", "pt", df.schema, partitionBy = Seq("v"))
    assert(intercept[IllegalArgumentException](pt.addFiles(ext))
      .getMessage.contains("partition"))
    // declared sort order refuses, naming the clearing procedure
    val st = cat.createTable("lake", "st", df.schema, sortedBy = Seq("id"))
    assert(intercept[IllegalArgumentException](st.addFiles(ext))
      .getMessage.contains("set_sort_order"))
    val tbl = cat.createTable("lake", "t", df.schema)
    // foreign column refuses
    val extraDir = scratch("addf2-extra")
    df.withColumn("zz", lit(1)).repartition(1)
      .write.mode("overwrite").parquet(extraDir)
    assert(intercept[IllegalArgumentException](tbl.addFiles(extraDir))
      .getMessage.contains("zz"))
    // type mismatch refuses with both spellings named
    val intDir = scratch("addf2-int")
    df.withColumn("id", col("id").cast("int")).repartition(1)
      .write.mode("overwrite").parquet(intDir)
    val te = intercept[IllegalArgumentException](tbl.addFiles(intDir))
    assert(te.getMessage.contains("int") && te.getMessage.contains("bigint"))
    // a MISSING column is fine: reads serve NULL (column-add contract)
    val slimDir = scratch("addf2-slim")
    df.select("id").repartition(1).write.mode("overwrite").parquet(slimDir)
    tbl.addFiles(slimDir)
    val out = tbl.toDF.collect()
    assert(out.length == 20 && out.forall(_.isNullAt(1)))
    // inside-the-table-tree import refuses (appending first so the table
    // actually owns a data/ tree to point at)
    tbl.append(df.limit(2).repartition(1))
    val inside = intercept[IllegalArgumentException](tbl.addFiles(
      cat.tablePath("lake", "t").toString + "/data"))
    assert(inside.getMessage.contains("INSIDE"))
    // missing source refuses
    assert(intercept[IllegalArgumentException](
      tbl.addFiles(wh + "/nope")).getMessage.contains("not found"))
  }

  test("incremental readers flow through an add_files snapshot (pure insert)") {
    import spark.implicits._
    val wh = scratch("addf5")
    val ext = scratch("addf5-external")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 10).repartition(1))
    val from = tbl.meta.currentSnapshotId
    df.filter(col("id") > 10 && col("id") <= 20).repartition(1)
      .write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    val importSnap = tbl.meta.currentSnapshotId
    tbl.append(df.filter(col("id") > 20).repartition(1))
    // batch incremental scan: the window contains the import — imported
    // rows ARE inserts at that snapshot, so they flow, not refuse
    val inc = tbl.changesSince(from).collect().map(_.getLong(0)).sorted.toSeq
    assert(inc == (11L to 30L), s"got $inc")
    // the CDC changelog classifies them as inserts at the import snapshot
    val log = tbl.changelog(from).collect()
    assert(log.length == 20 && log.forall(_.getString(2) == "insert"))
    // cherry-pick transplants an import (bag union by reference)
    tbl.rollbackTo(from)
    tbl.cherryPick(importSnap)
    val out = cat.loadTable("lake", "t").toDF.collect().map(_.getLong(0)).sorted
    assert(out.toSeq == (1L to 20L))
  }

  test("the streaming source delivers an add_files snapshot as its micro-batch") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    val wh = scratch("addf6")
    val ext = scratch("addf6-external")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 10).repartition(1))
    val ckpt = java.nio.file.Files.createTempDirectory("addf-stream").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("icelite")
        .option("warehouse", wh).option("table", "lake.t").load()
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => seen.add(r.getLong(0))); ()
        }.start()
      q.awaitTermination()
    }
    drain()
    assert(seen.size == 10, s"initial drain saw $seen")
    // import lands while the stream is down; resume delivers EXACTLY the
    // imported rows (an import is that snapshot's inserts)
    seen.clear()
    df.filter(col("id") > 10).repartition(2).write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    drain()
    assert(seen.size == 10 && (11L to 20L).forall(seen.contains),
      s"resume must deliver exactly the imported rows, saw $seen")
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  test("CALL system.snapshot migrates a parquet directory to a new table") {
    import spark.implicits._
    val wh = scratch("addf4")
    val ext = scratch("addf4-external")
    val df = (1L to 25L).map(i => (i, s"s$i")).toDF("id", "v")
    df.repartition(2).write.mode("overwrite").parquet(ext)
    spark.conf.set("spark.sql.catalog.ice_snap", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_snap.warehouse", wh)
    val r = spark.sql(
      s"CALL ice_snap.system.snapshot('$ext', 'lake.m')").collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 25, s"got $r")
    assert(spark.sql("SELECT count(*) FROM ice_snap.lake.m")
      .collect()(0).getLong(0) == 25)
    // schema was inferred, data serves by reference from the source dir
    assert(spark.sql("SELECT v FROM ice_snap.lake.m WHERE id = 7")
      .collect().map(_.getString(0)).toSeq == Seq("s7"))
    val cat = new IceCatalog(spark, wh)
    // a failing call leaves no table behind
    intercept[Exception](spark.sql(
      s"CALL ice_snap.system.snapshot('$wh/definitely-missing', 'lake.bad')"))
    assert(!cat.tableExists("lake", "bad"))
    // an existing table name refuses (snapshot CREATES; add_files appends)
    intercept[Exception](spark.sql(
      s"CALL ice_snap.system.snapshot('$ext', 'lake.m')"))
  }

  test("CALL system.add_files reports counts; DML after import stays correct") {
    import spark.implicits._
    val wh = scratch("addf3")
    val ext = scratch("addf3-external")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 20).repartition(1))
    df.filter(col("id") > 20).repartition(2)
      .write.mode("overwrite").parquet(ext)
    spark.conf.set("spark.sql.catalog.ice_addf", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_addf.warehouse", wh)
    val r = spark.sql(
      s"CALL ice_addf.system.add_files('lake.t', '$ext')").collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 20, s"got $r")
    // COW DML over imported files rewrites INTO the table (ownership
    // transfers on rewrite; the foreign original is simply dereferenced)
    spark.sql("UPDATE ice_addf.lake.t SET v = 'X' WHERE id = 30")
    val out = spark.sql(
      "SELECT v FROM ice_addf.lake.t WHERE id = 30").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("X"))
    assert(spark.sql("SELECT count(*) FROM ice_addf.lake.t")
      .collect()(0).getLong(0) == 40)
    // the foreign parquet itself is untouched by the rewrite
    assert(hfs(ext).listStatus(new Path(ext))
      .count(_.getPath.getName.endsWith(".parquet")) == 2)
  }
}
