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
    val planned = graft.sources.v2.HasPlannedFiles.of(
      tbl.toDF.where(col("id") <= 10L))
    assert(planned.nonEmpty && planned.forall(p => !p.contains("addf1-external")),
      s"imported files not pruned by footer stats: $planned")
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

  test("partitioned import: hive layout binds, prunes, and mixes with native files") {
    import spark.implicits._
    val cat = new IceCatalog(spark, scratch("addf8"))
    val ext = scratch("addf8-external")
    val df = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b", s"v$i"))
      .toDF("id", "k", "v")
    val tbl = cat.createTable("lake", "t", df.schema, partitionBy = Seq("k"))
    tbl.append(df.filter(col("k") === "a"))
    // hive layout WITHOUT the partition column in data — the migration shape
    df.filter(col("k") === "b").write.mode("overwrite")
      .partitionBy("k").parquet(ext)
    tbl.addFiles(ext)
    // values bind from the import dirs; content is complete and typed
    val out = tbl.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.size == 40 && out(25L) == "b" && out(5L) == "a")
    // a partition predicate prunes across the MIXED native/imported set:
    // k='b' plans only imported files, k='a' only native ones
    val plannedB = graft.sources.v2.HasPlannedFiles.of(
      tbl.toDF.where(col("k") === "b"))
    assert(plannedB.nonEmpty && plannedB.forall(_.contains("k=b")),
      s"k='b' must plan only imported files, got $plannedB")
    val plannedA = graft.sources.v2.HasPlannedFiles.of(
      tbl.toDF.where(col("k") === "a"))
    assert(plannedA.nonEmpty && plannedA.forall(p => !p.contains("addf8-external")),
      s"k='a' must plan only native files, got $plannedA")
    // manifest-only aggregate still answers (partition-exact claim holds
    // over the mixed set: every file decodes its identity value)
    assert(tbl.toDF.where(col("k") === "b").count() == 20)
  }

  test("partitioned import refusals: layout mismatch, bad value, transform segments") {
    import spark.implicits._
    val cat = new IceCatalog(spark, scratch("addf9"))
    val df = (1L to 10L).map(i => (i, i % 3, s"v$i")).toDF("id", "part", "v")

    // source with NO hive dirs into a partitioned table: layout mismatch
    val flat = scratch("addf9-flat")
    df.repartition(1).write.mode("overwrite").parquet(flat)
    val pt = cat.createTable("lake", "pt", df.schema, partitionBy = Seq("part"))
    val e1 = intercept[IllegalArgumentException](pt.addFiles(flat))
    assert(e1.getMessage.contains("carries no 'part=") &&
      e1.getMessage.contains("partitioned by"), e1.getMessage)

    // a segment that does not decode as the column type refuses loudly
    val bad = scratch("addf9-bad")
    df.drop("part").repartition(1).write.mode("overwrite")
      .parquet(bad + "/part=abc")
    val e2 = intercept[IllegalArgumentException](pt.addFiles(bad))
    assert(e2.getMessage.contains("does not parse as bigint"), e2.getMessage)

    // transform fields: claimed bucket segments are unverifiable → refuse;
    // the same files WITHOUT segments import fine and read from data
    val bt = cat.createTable("lake", "bt", df.schema,
      partitionBy = Seq("bucket(4,id)"))
    val claimed = scratch("addf9-claimed")
    df.repartition(1).write.mode("overwrite").parquet(claimed + "/id_bucket=0")
    val e3 = intercept[IllegalArgumentException](bt.addFiles(claimed))
    assert(e3.getMessage.contains("id_bucket=") &&
      e3.getMessage.contains("transform"), e3.getMessage)
    val plainDir = scratch("addf9-plain")
    df.repartition(1).write.mode("overwrite").parquet(plainDir)
    bt.addFiles(plainDir)
    assert(bt.toDF.where(col("id") === 7L).collect()
      .map(_.getString(2)).toSeq == Seq("v7"))
  }

  test("storage-partitioned join holds across a MIXED native/imported table") {
    import spark.implicits._
    val wh = scratch("addf12")
    val ext = scratch("addf12-external")
    val cat = new IceCatalog(spark, wh)
    val a = (1L to 400L).map(k => (k % 8, k, k * 1.5)).toDF("p", "k", "v")
    val b = (1L to 400L).map(k => (k % 8, k, k * 2.0)).toDF("p", "k", "w")
    val ta = cat.createTable("lake", "mix_a", a.schema, partitionBy = Seq("p"))
    val tb = cat.createTable("lake", "mix_b", b.schema, partitionBy = Seq("p"))
    // half of A lands natively, the other half arrives as a hive-layout
    // import — the join layout must survive the mixture (every file's key
    // decodes from its path, native __p_p= and imported p= alike)
    ta.append(a.filter(col("p") < 4))
    a.filter(col("p") >= 4).write.mode("overwrite").partitionBy("p").parquet(ext)
    ta.addFiles(ext)
    tb.append(b)
    spark.conf.set("spark.sql.catalog.ice_mix", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_mix.warehouse", wh)
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = spark.sql(
        """SELECT a.p, a.k, b.k AS bk
          |FROM ice_mix.lake.mix_a a JOIN ice_mix.lake.mix_b b ON a.p = b.p
          |""".stripMargin)
      assert(q.count() == 8L * 50 * 50)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"mixed native/imported co-partitioned tables must join shuffle-free: $plan")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
  }

  test("partitioned import survives a LATER spec change (import-era spec sticks)") {
    import spark.implicits._
    val cat = new IceCatalog(spark, scratch("addf10"))
    val ext = scratch("addf10-external")
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "e" else "o", s"v$i"))
      .toDF("id", "k", "v")
    val tbl = cat.createTable("lake", "t", df.schema, partitionBy = Seq("k"))
    df.write.mode("overwrite").partitionBy("k").parquet(ext)
    tbl.addFiles(ext)
    // drop the partitioning afterwards; imported files must KEEP binding k
    // from their import-time hive dirs (their era predates the change)
    tbl.setPartitionSpec(Nil)
    tbl.append(df.limit(0))
    val out = cat.loadTable("lake", "t").toDF.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 20 && (1L to 20L).forall(i =>
      out(i) == (if (i % 2 == 0) "e" else "o")),
      s"imported files must keep serving k from their import-era dirs, got $out")
  }

  test("post-import evolution: spec change, rename, MOR eq-delete reach imported files") {
    import spark.implicits._

    // (1) spec evolution AFTER an import: the documented remedy for
    // partitioned migration is "import unpartitioned, evolve the spec
    // after" — the imported files' era must resolve to the spec in force
    // AT IMPORT (no dirs), not to the new identity spec (whose columns
    // would bind from directories the foreign paths do not have).
    locally {
      val cat = new IceCatalog(spark, scratch("addf7a"))
      val ext = scratch("addf7a-external")
      val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "v")
      val tbl = cat.createTable("lake", "t", df.schema)
      df.filter(col("id") > 10).repartition(1).write.mode("overwrite").parquet(ext)
      tbl.append(df.filter(col("id") <= 10).repartition(1))
      tbl.addFiles(ext)
      tbl.setPartitionSpec(Seq("v"))
      tbl.append(df.limit(0)) // a post-evolution snapshot exists
      val out = cat.loadTable("lake", "t").toDF
        .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1))
      assert(out.length == 20 && out.forall(_._2 != null),
        s"imported files must keep serving 'v' from data after spec evolution, got ${out.toSeq.sortBy(_._1)}")
    }

    // (2) column rename AFTER an import: the imported files carry the
    // import-time physical names; a later rename must map the new logical
    // name back onto them (era = import snapshot, not "newest").
    locally {
      val wh = scratch("addf7b")
      val ext = scratch("addf7b-external")
      val cat = new IceCatalog(spark, wh)
      val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      val tbl = cat.createTable("lake", "t", df.schema)
      tbl.append(df.filter(col("id") <= 5).repartition(1))
      df.filter(col("id") > 5).repartition(1).write.mode("overwrite").parquet(ext)
      tbl.addFiles(ext)
      spark.conf.set("spark.sql.catalog.ice_addf7", "graft.sources.v2.IceLiteCatalog")
      spark.conf.set("spark.sql.catalog.ice_addf7.warehouse", wh)
      spark.sql("ALTER TABLE ice_addf7.lake.t RENAME COLUMN v TO label")
      val out = spark.sql("SELECT id, label FROM ice_addf7.lake.t")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.size == 10 && (1L to 10L).forall(i => out(i) == s"v$i"),
        s"imported files must serve the renamed column from their import-era physical name, got $out")
    }

    // (3) MOR equality delete AFTER an import: a delete committed after
    // the import must reach rows living in imported files (their era
    // precedes the delete's sequence).
    locally {
      val cat = new IceCatalog(spark, scratch("addf7c"))
      val ext = scratch("addf7c-external")
      val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
      val tbl = cat.createTable("lake", "t", df.schema)
      tbl.append(df.filter(col("id") <= 10).repartition(1))
      df.filter(col("id") > 10).repartition(1).write.mode("overwrite").parquet(ext)
      tbl.addFiles(ext)
      tbl.deleteKeysEq(Seq(3L, 15L).toDF("id"), Seq("id"))
      val ids = tbl.toDF.select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (1L to 20L).filterNot(Set(3L, 15L)),
        s"post-import equality delete must reach imported files, got $ids")
    }
  }

  test("recorded era survives rewrite_manifests and expiry (serialization round-trip)") {
    import spark.implicits._
    val cat = new IceCatalog(spark, scratch("addf15"))
    val ext = scratch("addf15-external")
    val df = (1L to 20L).map(i => (i, s"v$i", if (i % 2 == 0) "e" else "o"))
      .toDF("id", "v", "k")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 10).repartition(1))
    df.filter(col("id") > 10).repartition(1).write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    val importEra = tbl.meta.currentSnapshotId
    tbl.append(df.limit(0))
    // rebase the chain into a FULL document, then expire history: the
    // imported entries' recorded era must ride the rewrite byte-for-byte
    tbl.rewriteManifests()
    tbl.expireSnapshots(keepLast = 1)
    val t2 = cat.loadTable("lake", "t")
    val imported = t2.visibleFiles(t2.meta.currentSnapshot.get)
      .filter(_.path.contains("addf15-external"))
    assert(imported.nonEmpty && imported.forall(_.era == importEra),
      s"era lost in rebase/expiry: ${imported.map(f => f.path -> f.era)}")
    // and it still GOVERNS: a spec change after the rebase keeps imported
    // files reading k from data (their era precedes the change)
    t2.setPartitionSpec(Seq("k"))
    cat.loadTable("lake", "t").append(df.limit(0))
    val out = cat.loadTable("lake", "t").toDF.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.size == 20 && (1L to 20L).forall(i =>
      out(i) == (if (i % 2 == 0) "e" else "o")), s"got $out")
  }

  test("compaction FINISHES a migration: imported files rewrite into the table") {
    import spark.implicits._
    val wh = scratch("addf14")
    val ext = scratch("addf14-external")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.filter(col("id") <= 30).repartition(1))
    df.filter(col("id") > 30).repartition(3)
      .write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    // the Iceberg migration epilogue: compact to take ownership — every
    // visible file is now INSIDE the table tree (imported entries simply
    // dereferenced), the foreign originals untouched on disk, content equal
    tbl.compact(targetFiles = 2)
    val t2 = cat.loadTable("lake", "t")
    val tableRoot = cat.tablePath("lake", "t").toString
    val files = t2.visibleFiles(t2.meta.currentSnapshot.get)
    assert(files.nonEmpty && files.forall(_.path.contains(tableRoot)),
      s"post-compact files must all live in the table tree: ${files.map(_.path)}")
    assert(hfs(ext).listStatus(new Path(ext))
      .count(_.getPath.getName.endsWith(".parquet")) == 3,
      "compaction must not touch the caller-owned originals")
    assert(t2.toDF.count() == 60 &&
      t2.toDF.where(col("id") === 45L).collect()(0).getString(1) == "v45")
    // ... and the dereferenced foreign paths are beyond GC's reach forever
    t2.removeOrphanFiles(graceMs = 0L)
    assert(hfs(ext).listStatus(new Path(ext))
      .count(_.getPath.getName.endsWith(".parquet")) == 3)
  }

  test("imports survive STACKED evolution: eq-delete, rename, spec change, append") {
    import spark.implicits._
    val wh = scratch("addf13")
    val ext = scratch("addf13-external")
    val cat = new IceCatalog(spark, wh)
    val mk = (r: Range) => r.map(i =>
      (i.toLong, s"v$i", if (i % 2 == 0) "e" else "o")).toDF("id", "v", "k")
    val tbl = cat.createTable("lake", "t", mk(1 to 10).schema)
    tbl.append(mk(1 to 10).repartition(1))
    mk(11 to 20).repartition(1).write.mode("overwrite").parquet(ext)
    tbl.addFiles(ext)
    val importSnap = tbl.meta.currentSnapshotId
    // MOR equality delete reaching BOTH eras (native 5, imported 15)
    tbl.deleteKeysEq(Seq(5L, 15L).toDF("id"), Seq("id"))
    // then a rename AND a partition-spec change land on top
    spark.conf.set("spark.sql.catalog.ice_addf13", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_addf13.warehouse", wh)
    spark.sql("ALTER TABLE ice_addf13.lake.t RENAME COLUMN v TO label")
    cat.loadTable("lake", "t").setPartitionSpec(Seq("k"))
    cat.loadTable("lake", "t").append(
      mk(21 to 30).toDF("id", "label", "k"))
    // every era serves correctly: imported files resolve their import-time
    // name for `label`, their import-time (empty) spec for `k` (from
    // data), the delete holds, and the new era binds k from its dirs
    val out = spark.sql("SELECT id, label, k FROM ice_addf13.lake.t")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.size == 28 && !out.contains(5L) && !out.contains(15L), s"ids: ${out.keys.toSeq.sorted}")
    (1 to 30).filterNot(i => i == 5 || i == 15).foreach { i =>
      assert(out(i.toLong) == (s"v$i", if (i % 2 == 0) "e" else "o"),
        s"row $i diverged: ${out(i.toLong)}")
    }
    // time travel to the import snapshot still reads pre-evolution state
    assert(cat.loadTable("lake", "t")
      .scan(snapshotId = Some(importSnap)).count() == 20)
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
    // a hive-partitioned source KEEPS its partitioning: the migrated table
    // prunes on the partition column from the first query (round 15)
    val pext = scratch("addf4-part")
    df.withColumn("k", col("id") % 2).write.mode("overwrite")
      .partitionBy("k").parquet(pext)
    val rp = spark.sql(
      s"CALL ice_snap.system.snapshot('$pext', 'lake.mp')").collect()(0)
    assert(rp.getString(3) == "k", s"got $rp")
    assert(spark.sql("SELECT count(*) FROM ice_snap.lake.mp WHERE k = 0")
      .collect()(0).getLong(0) == 12)
    val plannedP = graft.sources.v2.HasPlannedFiles.of(
      spark.sql("SELECT id FROM ice_snap.lake.mp WHERE k = 1"))
    assert(plannedP.nonEmpty && plannedP.forall(_.contains("k=1")),
      s"migrated partitioning must prune, got $plannedP")
    val cat = new IceCatalog(spark, wh)
    // a failing call leaves no table behind
    intercept[Exception](spark.sql(
      s"CALL ice_snap.system.snapshot('$wh/definitely-missing', 'lake.bad')"))
    assert(!cat.tableExists("lake", "bad"))
    // an existing table name refuses (snapshot CREATES; add_files appends)
    intercept[Exception](spark.sql(
      s"CALL ice_snap.system.snapshot('$ext', 'lake.m')"))
  }

  test("ancestor 'col=value' directories never bind: segments parse relative to the import root") {
    import spark.implicits._
    val cat = new IceCatalog(spark, scratch("addf16"))
    val base = scratch("addf16-src")
    val df = (1L to 20L).map(i => (i, if (i <= 10) "a" else "b", s"v$i"))
      .toDF("id", "k", "v")

    // (1) flat tree under a misleading ancestor into a k-partitioned
    // table: an absolute-path parse would silently bind k='test' for
    // every imported row; the gate must refuse instead
    val trap = base + "/k=test/dump"
    df.drop("k").repartition(1).write.mode("overwrite").parquet(trap)
    val pt = cat.createTable("lake", "pt", df.schema, partitionBy = Seq("k"))
    val e1 = intercept[IllegalArgumentException](pt.addFiles(trap))
    assert(e1.getMessage.contains("BELOW the source root"), e1.getMessage)

    // (2) a single FILE cannot import into a partitioned table (no
    // segments below the root by construction)
    val oneFile = hfs(trap).listStatus(new Path(trap)).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get.toString
    val e2 = intercept[IllegalArgumentException](pt.addFiles(oneFile))
    assert(e2.getMessage.contains("BELOW the source root"), e2.getMessage)

    // (3) proper hive layout UNDER a misleading ancestor: the below-root
    // values are authoritative, RECORDED on the manifest entries, and
    // nothing ever serves the ancestor's 'zzz'
    val good = base + "/k=zzz/srcroot"
    df.write.mode("overwrite").partitionBy("k").parquet(good)
    pt.addFiles(good)
    val out = pt.toDF.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.size == 20 && out(5L) == "a" && out(15L) == "b", s"got $out")
    assert(pt.toDF.where(col("k") === "zzz").count() == 0)
    val entries = pt.visibleFiles(pt.meta.currentSnapshot.get)
    assert(entries.nonEmpty && entries.forall(f =>
      f.era >= 0 && f.partVals.keySet == Set("k") &&
        Set("a", "b").contains(f.partVals("k"))),
      s"import must record root-relative partition values: $entries")

    // (4) COW rewrite of imported partitioned files binds the RECORDED
    // values (path discovery under a foreign parent would serve NULLs)
    pt.upsert(Seq((5L, "a", "UPDATED")).toDF("id", "k", "v"), Seq("id"))
    val out2 = pt.toDF.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out2.size == 20 && out2(5L) == ("a", "UPDATED") &&
      out2(6L) == ("a", "v6") && out2(15L) == ("b", "v15"),
      s"COW rewrite must preserve imported partition values: $out2")

    // (5) a misleading TRANSFORM ancestor neither blocks the import nor
    // fakes a prune: id_bucket=0 above the root is tree layout, and the
    // scan must still find ids of every bucket
    val bt = cat.createTable("lake", "bt", df.schema,
      partitionBy = Seq("bucket(4,id)"))
    val tsrc = base + "/id_bucket=0/dump2"
    df.repartition(1).write.mode("overwrite").parquet(tsrc)
    bt.addFiles(tsrc)
    assert((1L to 20L).forall(i =>
      bt.toDF.where(col("id") === i).count() == 1),
      "an ancestor transform segment must never prune imported files")
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
