package graft

import org.apache.spark.sql.functions._
import graft.icelite.{FilePrune, FileStat, FileStats, IceCatalog}

/** Manifest-level Bloom filters: opt-in per-column point-lookup pruning.
  * Min/max ranges prove nothing on a randomly-distributed key (every file
  * spans the whole domain); a per-file bloom proves definite ABSENCE at
  * plan time, so `WHERE id = k` plans O(1) files. False positives only
  * cost an extra scanned file — the assertions below check both the
  * pruning win AND the zero-false-negative contract.
  */
class BloomSpec extends SparkSpec {

  private def planned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val desc = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    val m = """files=(\d+) planned=(\d+)""".r.findFirstMatchIn(desc)
      .getOrElse(fail(s"no planning counters in scan description: $desc"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("point predicates prune via blooms where min/max cannot; no false negatives") {
    val wh = scratch("bloom")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    // keys INTERLEAVED across appends so every file spans the full range:
    // min/max is useless, only the bloom can prune. d rides the long hash
    // domain through its epoch-day spelling.
    val df = (0L until 40000L).map(i => (i, s"k$i")).toDF("id", "name")
      .withColumn("d", date_add(lit(java.time.LocalDate.of(2000, 1, 1)),
        (col("id") % 20000).cast("int")))
    val tbl = cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "id,name,d",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_bloom", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bloom.warehouse", wh)
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_bloom.lake.t").append())
    val t1 = cat.loadTable("lake", "t")
    val files = t1.visibleFiles(t1.meta.currentSnapshot.get)
    assert(files.size == 4, s"expected 4 files, got ${files.size}")
    assert(files.forall(f => f.bloom.contains("id") && f.bloom.contains("name") &&
      f.bloom.contains("d") &&
      f.bloom.get(FileStats.BloomVersionKey).contains(FileStats.BloomVersion)),
      s"every file must carry versioned blooms: ${files.map(_.bloom.keySet)}")

    def load() = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load()
    // id=4 lives only in the m=0 file; min/max alone would plan all 4
    val q = load().filter(col("id") === 4L)
    val (nf, np) = planned(q)
    assert(nf == 4 && np == 1, s"bloom must prune to 1 of 4 files, planned $np of $nf")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L))
    // IN-lists probe per value: ids 4 and 9 live in two different files
    val qin = load().filter(col("id").isin(4L, 9L))
    assert(planned(qin)._2 == 2, s"IN must plan exactly the 2 holding files")
    assert(qin.collect().map(_.getLong(0)).toSet == Set(4L, 9L))
    // string domain: present key prunes to its file, an in-range absent
    // key ("k4x" sorts between real keys) proves absent in ALL files
    assert(planned(load().filter(col("name") === "k4"))._2 == 1)
    assert(planned(load().filter(col("name") === "k4x"))._2 == 0,
      "an absent in-range key must plan zero files")
    assert(load().filter(col("name") === "k4x").count() == 0)
    // date domain (epoch-day longs): 2000-01-05 = id 4 (and 20004), file 0
    val qd = load().filter(col("d") === lit(java.time.LocalDate.of(2000, 1, 5)))
    assert(planned(qd)._2 == 1, s"date bloom must prune: ${planned(qd)}")
    assert(qd.count() == 2L) // ids 4 and 20004
    // NO FALSE NEGATIVES: every sampled present key must return its row
    (0L until 40000L by 977L).foreach { k =>
      assert(load().filter(col("id") === k).count() == 1L,
        s"bloom must never prune the file holding id=$k")
    }
    // table-API appends ride the same gate (property travels on the table)
    tbl.append(Seq((90001L, "extra", java.sql.Date.valueOf("2031-01-01")))
      .toDF("id", "name", "d"))
    val t2 = cat.loadTable("lake", "t")
    val newest = t2.visibleFiles(t2.meta.currentSnapshot.get)
      .filterNot(f => files.map(_.path).contains(f.path))
    assert(newest.nonEmpty && newest.forall(_.bloom.contains("id")),
      "the table-API funnel must bloom under the same table property")
    assert(planned(load().filter(col("id") === 90001L))._2 == 1)
  }

  test("broadcast-join keys runtime-filter the fact scan through the blooms") {
    val wh = scratch("bloom-rt")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val fact = (0L until 20000L).map(i => (i, i % 97)).toDF("id", "grp")
    cat.createTable("lake", "fact", fact.schema,
      properties = Map("write.bloom.columns" -> "id",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_brt", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_brt.warehouse", wh)
    (0 until 4).foreach(m => fact.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_brt.lake.fact").append())
    // dim must be file-backed (a LocalRelation's filter constant-folds
    // before PartitionPruning sees it) — same shape as the DPP test, but
    // the join key is a DATA column: only the bloom advertisement makes
    // the scan a runtime-filter target
    val dimPath = scratch("bloom-rt-dim")
    Seq((4L, "keep"), (8L, "keep"), (12L, "drop"))
      .toDF("k", "tag").write.parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("bloom_dim")
    val q = spark.sql(
      """SELECT f.id, f.grp, d.tag
        |FROM ice_brt.lake.fact f JOIN bloom_dim d ON f.id = d.k
        |WHERE d.tag = 'keep'""".stripMargin)
    val rows = q.collect()
    assert(rows.map(_.getLong(0)).toSet == Set(4L, 8L),
      s"join result wrong: ${rows.toSeq}")
    val runtime = q.queryExecution.executedPlan.toString
    assert(runtime.contains("dynamicpruningexpression"),
      s"no runtime filter reached the bloom-advertised data column:\n$runtime")
  }

  test("COW upsert rewrites only the files that actually hold source keys") {
    val wh = scratch("bloom-upsert")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (0L until 8000L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "id",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_bup", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bup.warehouse", wh)
    // interleaved keys: every file spans [0, 8000) — the RANGE candidate
    // test would rewrite all four files for any source
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_bup.lake.t").append())
    val t1 = cat.loadTable("lake", "t")
    val before = t1.visibleFiles(t1.meta.currentSnapshot.get).map(_.path).toSet
    assert(before.size == 4)
    // source keys all live in the m=1 file; the exact-key refinement
    // (IN through min/max + blooms) must leave the other three untouched
    val srcKeys = Seq(1L, 401L, 801L)
    val source = srcKeys.map(k => (k, "updated")).toDF("id", "v")
    t1.upsert(source, keys = Seq("id"))
    val t2 = cat.loadTable("lake", "t")
    val after = t2.visibleFiles(t2.meta.currentSnapshot.get).map(_.path).toSet
    val carried = before.intersect(after)
    assert(carried.size == 3,
      s"exactly the three key-free files must survive untouched: " +
        s"carried ${carried.size} of ${before.size}")
    // and the merge semantics are exactly right
    val got = t2.toDF.filter(col("id").isin(srcKeys: _*))
      .select("v").as[String].collect().toSet
    assert(got == Set("updated"), s"matched rows must take source values: $got")
    assert(t2.toDF.count() == 8000L)
    assert(t2.toDF.filter(col("v") === "updated").count() == 3L)
  }

  test("the streaming sink builds blooms under the table property") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = scratch("bloom-sink")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("lake", "src", df.schema).append(df)
    cat.createTable("lake", "dst", df.schema,
      properties = Map("write.bloom.columns" -> "id"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("icelite-bloom-sink").toString
    val q = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "lake.src").load()
      .writeStream.format("icelite")
      .option("warehouse", wh).option("table", "lake.dst")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val dst = cat.loadTable("lake", "dst")
    assert(dst.toDF.count() == 30)
    val sunk = dst.visibleFiles(dst.meta.currentSnapshot.get)
    assert(sunk.nonEmpty && sunk.forall(f => f.bloom.contains("id") &&
      f.bloom.get(FileStats.BloomVersionKey).contains(FileStats.BloomVersion)),
      s"streaming-sink files must carry blooms: ${sunk.map(_.bloom.keySet)}")
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  test("index an existing table: ALTER adds the property, compact builds the blooms") {
    val wh = scratch("bloom-index")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.ice_bix", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bix.warehouse", wh)
    val df = (0L until 8000L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema) // no property: no blooms
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_bix.lake.t").append())
    def load() = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load()
    assert(planned(load().filter(col("id") === 4L))._2 == 4,
      "no blooms yet: interleaved keys defeat min/max, all files planned")
    // the retrofit flow a 100 TB operator runs: declare the index column,
    // then one maintenance rewrite builds the filters
    spark.sql("ALTER TABLE ice_bix.lake.t SET TBLPROPERTIES " +
      "('write.bloom.columns' = 'id', 'write.bloom.capacity' = '20000')")
    cat.loadTable("lake", "t").compact(targetFiles = 4,
      sortBy = Seq("id"))
    val t2 = cat.loadTable("lake", "t")
    assert(t2.visibleFiles(t2.meta.currentSnapshot.get)
      .forall(_.bloom.contains("id")),
      "compaction under the property must build blooms for every file")
    // the .stats metadata table answers "is the retrofit done?"
    val bloomedCols = spark.table("ice_bix.lake.t.stats")
      .filter(col("bloomed")).select("column")
      .collect().map(_.getString(0)).toSet
    assert(bloomedCols == Set("id"),
      s".stats must report full bloom coverage for id only: $bloomedCols")
    val q = load().filter(col("id") === 4L)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(4L))
    // sorted compaction makes min/max sufficient here; the point is the
    // blooms now EXIST — prove they answer by probing an in-range absent
    // key against the file that covers it
    assert(load().filter(col("id") === 4L).count() == 1L)
    // COW DELETE WHERE id IN (...) rides the same canMatch probes: only
    // the key-holding file is rewritten, the rest are carried
    val before = t2.visibleFiles(t2.meta.currentSnapshot.get).map(_.path).toSet
    t2.deleteWhere(Seq(org.apache.spark.sql.sources.In("id", Array(4L, 5L))))
    val t3 = cat.loadTable("lake", "t")
    val after = t3.visibleFiles(t3.meta.currentSnapshot.get).map(_.path).toSet
    assert(before.intersect(after).size >= 2,
      s"delete must carry the key-free files: kept ${before.intersect(after).size}")
    assert(t3.toDF.count() == 7998L)
    assert(t3.toDF.filter(col("id").isin(4L, 5L)).count() == 0L)
  }

  test("equality deletes exempt bloom-disjoint files at plan time") {
    val wh = scratch("bloom-eq")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (0L until 8000L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "id",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_beq", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_beq.warehouse", wh)
    // interleaved keys: every file's [min, max] spans the whole domain, so
    // the RANGE test alone would demote all four files to the row-based
    // probing read path for any scattered delete
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_beq.lake.t").append())
    val t1 = cat.loadTable("lake", "t")
    // all delete keys live in the m=2 file
    t1.deleteKeysEq(Seq(2L, 402L, 802L).toDF("id"), keys = Seq("id"))
    val t2 = cat.loadTable("lake", "t")
    val snap = t2.meta.currentSnapshot.get
    val del = t2.deletesOf(snap).find(_.isEquality).getOrElse(
      fail("expected an equality delete"))
    assert(del.eqKeys.get("id").exists(_.toSet == Set("2", "402", "802")),
      s"a small delete must inline its stat-encoded keys: ${del.eqKeys}")
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(t2.meta.schemaDdl)
    val applied = t2.visibleFiles(snap)
      .filter(f => graft.icelite.FileStats.eqAppliesTo(del, f, schema))
    assert(applied.size == 1,
      s"bloom disjointness must exempt the three key-free files; " +
        s"the delete applies to ${applied.size} of 4")
    // semantics stay exactly right: the keys are gone, nothing else is
    assert(t2.toDF.count() == 7997L)
    assert(t2.toDF.filter(col("id").isin(2L, 402L, 802L)).count() == 0L)
    assert(t2.toDF.filter(col("id") === 3L).count() == 1L)
  }

  test("inline-key exemption holds for string and date keys without blooms") {
    val wh = scratch("eqkeys-typed")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    // three files with DISJOINT sorted key ranges (a*, b*, c*) and
    // era-correlated dates — no bloom property anywhere: the exemption
    // must come from inline keys probing min/max point containment
    def block(p: String, year: Int) = (0 until 500).map(i =>
      (f"$p$i%04d", java.sql.Date.valueOf(f"$year-01-01").toLocalDate
        .plusDays(i % 28).toString, i.toLong))
    val mk = (p: String, y: Int) => block(p, y)
      .toDF("k", "ds", "v").withColumn("d", col("ds").cast("date")).drop("ds")
    val tbl = cat.createTable("lake", "t", mk("a", 2020).schema)
    Seq(("a", 2020), ("b", 2021), ("c", 2022)).foreach { case (p, y) =>
      tbl.append(mk(p, y).repartition(1)) }
    val t1 = cat.loadTable("lake", "t")
    // scattered STRING keys: the delete's [min, max] spans a..c, so the
    // range test alone would demote all three files; the inline probes
    // prove the b* file holds neither key
    t1.deleteKeysEq(Seq("a0005", "c0005").toDF("k"), keys = Seq("k"))
    val t2 = cat.loadTable("lake", "t")
    val delK = t2.deletesOf(t2.meta.currentSnapshot.get)
      .find(_.eqCols == Seq("k")).getOrElse(fail("string delete missing"))
    assert(delK.eqKeys.get("k").exists(_.toSet == Set("a0005", "c0005")))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(t2.meta.schemaDdl)
    val appliedK = t2.visibleFiles(t2.meta.currentSnapshot.get)
      .filter(f => graft.icelite.FileStats.eqAppliesTo(delK, f, schema))
    assert(appliedK.size == 2,
      s"b* must be exempt from the scattered string delete: ${appliedK.size} of 3")
    assert(t2.toDF.count() == 1498L)
    assert(t2.toDF.filter(col("k").isin("a0005", "c0005")).count() == 0L)
    // scattered DATE keys ride the epoch-day encoding the same way
    t2.deleteKeysEq(
      Seq(java.sql.Date.valueOf("2020-01-03"),
        java.sql.Date.valueOf("2022-01-03")).toDF("d"), keys = Seq("d"))
    val t3 = cat.loadTable("lake", "t")
    val delD = t3.deletesOf(t3.meta.currentSnapshot.get)
      .find(_.eqCols == Seq("d")).getOrElse(fail("date delete missing"))
    assert(delD.eqKeys.get("d").exists(_.size == 2),
      s"date keys must inline as epoch days: ${delD.eqKeys}")
    val appliedD = t3.visibleFiles(t3.meta.currentSnapshot.get)
      .filter(f => graft.icelite.FileStats.eqAppliesTo(delD, f, schema))
    assert(appliedD.size == 2,
      s"the 2021 file must be exempt from the date delete: ${appliedD.size} of 3")
    // value-level ground truth: exactly the rows with those dates are gone
    val expect = 1498L - (Seq(("a", 2020), ("b", 2021), ("c", 2022))
      .map { case (p, y) => block(p, y) }.reduce(_ ++ _)
      .count(r => !Set("a0005", "c0005").contains(r._1) &&
        Set(s"2020-01-03", s"2022-01-03").contains(r._2)))
    assert(t3.toDF.count() == expect,
      s"date delete must remove exactly the matching rows: got ${t3.toDF.count()}")
  }

  test("inline-key exemption holds for decimal keys (scaled-string encoding)") {
    val wh = scratch("eqkeys-dec")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    // three files with DISJOINT amount ranges; scattered delete keys span
    // all three, so only the inline point probes can exempt the middle
    def block(base: Int) = (0 until 400).map(i =>
      (f"$base%d.${i % 100}%02d", base * 1000L + i))
    def mk(base: Int) = block(base).toDF("a", "v")
      .select(col("a").cast("decimal(12,2)").as("amt"), col("v"))
    val tbl = cat.createTable("lake", "t", mk(10).schema)
    Seq(10, 20, 30).foreach(b => tbl.append(mk(b).repartition(1)))
    val t1 = cat.loadTable("lake", "t")
    t1.deleteKeysEq(Seq("10.05", "30.05").toDF("a")
      .select(col("a").cast("decimal(12,2)").as("amt")), keys = Seq("amt"))
    val t2 = cat.loadTable("lake", "t")
    val del = t2.deletesOf(t2.meta.currentSnapshot.get)
      .find(_.eqCols == Seq("amt")).getOrElse(fail("decimal delete missing"))
    assert(del.eqKeys.get("amt").exists(_.toSet == Set("10.05", "30.05")),
      s"decimal keys must inline as scaled strings: ${del.eqKeys}")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(t2.meta.schemaDdl)
    val applied = t2.visibleFiles(t2.meta.currentSnapshot.get)
      .filter(f => graft.icelite.FileStats.eqAppliesTo(del, f, schema))
    assert(applied.size == 2,
      s"the 20.* file must be exempt from the scattered decimal delete: " +
        s"${applied.size} of 3")
    // value-level ground truth: each key matches 4 rows (i % 100 recurs)
    assert(t2.toDF.count() == 1200L - 8L)
    assert(t2.toDF.filter(col("amt").isin(
      new java.math.BigDecimal("10.05"), new java.math.BigDecimal("30.05")))
      .count() == 0L)
  }

  test("blooms are opt-in, version-gated, and never prove a false absence") {
    val wh = scratch("bloom-gate")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "name")
    // no property, no conf: the default writes NO blooms
    val tbl = cat.createTable("lake", "plain", df.schema)
    tbl.append(df)
    val t1 = cat.loadTable("lake", "plain")
    assert(t1.visibleFiles(t1.meta.currentSnapshot.get).forall(_.bloom.isEmpty),
      "blooms must be opt-in")
    // an unknown scheme marker is ignored: a wrong-scheme probe could
    // manufacture a false absence, so the prune must stay conservative
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType)))
    val real = org.apache.datasketches.filters.bloomfilter.BloomFilterBuilder
      .createByAccuracy(100, FileStats.BloomFpp, FileStats.BloomSeed)
    real.update(7L)
    val b64 = java.util.Base64.getEncoder.encodeToString(real.toByteArray)
    def stat(marker: String) = FileStat("file:/w/t/data/snap-00001/a.parquet",
      rows = 1, bytes = 10,
      bloom = Map("id" -> b64, FileStats.BloomVersionKey -> marker))
    // current marker: 8 is provably absent, 7 must stay
    assert(!FilePrune.canMatch(EqualTo("id", 8L), schema, stat(FileStats.BloomVersion)))
    assert(FilePrune.canMatch(EqualTo("id", 7L), schema, stat(FileStats.BloomVersion)))
    // foreign marker: ignored, both keep the file
    assert(FilePrune.canMatch(EqualTo("id", 8L), schema, stat("0")))
    // corrupted bytes: ignored. NB the distinct path — FilePrune memoizes
    // decoded filters by (file path, column), which is sound precisely
    // because committed data-file paths are immutable and writer-unique;
    // a same-path stat with different bytes cannot exist in production.
    val junk = stat(FileStats.BloomVersion).copy(
      path = "file:/w/t/data/snap-00002/junk.parquet",
      bloom = Map("id" -> "AAAA",
        FileStats.BloomVersionKey -> FileStats.BloomVersion))
    assert(FilePrune.canMatch(EqualTo("id", 8L), schema, junk))
    // empty string is a countable value in the sentinel byte form
    val sSchema = StructType(Seq(StructField("name", StringType)))
    val sb = org.apache.datasketches.filters.bloomfilter.BloomFilterBuilder
      .createByAccuracy(100, FileStats.BloomFpp, FileStats.BloomSeed)
    sb.update(Array[Byte](0)) // the writer's sentinel form of ""
    val sStat = FileStat("file:/w/t/data/snap-00001/b.parquet", rows = 1,
      bytes = 10, bloom = Map("name" ->
        java.util.Base64.getEncoder.encodeToString(sb.toByteArray),
        FileStats.BloomVersionKey -> FileStats.BloomVersion))
    assert(FilePrune.canMatch(EqualTo("name", ""), sSchema, sStat),
      "empty string must round-trip the sentinel form")
    assert(!FilePrune.canMatch(EqualTo("name", "x"), sSchema, sStat))
  }

  test("decimal blooms prune point lookups; v1 markers refuse the decimal probe") {
    val wh = scratch("bloom-dec")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    // amounts interleaved across appends so every file spans the range:
    // only the bloom can prune. `big` (p=30) exercises the byte-form hash.
    val df = (0L until 20000L).map(i => (i,
        f"${i % 5000}%d.${i % 100}%02d", f"9999999999999999999${i % 4000}%04d.25"))
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("decimal(10,2)").as("amt"),
        col("b").cast("decimal(30,2)").as("big"))
    cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "amt,big",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_bdec", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bdec.warehouse", wh)
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_bdec.lake.t").append())
    def load() = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load()
    // amt "4.04" recurs every 5000 ids, all ≡ 0 (mod 4): one file holds
    // every occurrence, so the bloom prunes to exactly it
    val amtTarget = new java.math.BigDecimal("4.04")
    val q = load().filter(col("amt") === lit(amtTarget))
    assert(planned(q)._2 == 1,
      s"decimal bloom must prune to 1 of 4 files, got ${planned(q)}")
    assert(q.count() == df.filter(col("amt") === lit(amtTarget)).count())
    // byte-form domain (p>18): big of id=5 recurs every 4000 ids, all ≡ 1
    val bigTarget = new java.math.BigDecimal(f"9999999999999999999${5}%04d.25")
    val qb = load().filter(col("big") === lit(bigTarget))
    assert(planned(qb)._2 == 1, s"wide-decimal bloom must prune: ${planned(qb)}")
    assert(qb.count() == df.filter(col("big") === lit(bigTarget)).count())
    // an absent in-range value proves absent in ALL files
    assert(planned(load().filter(
      col("amt") === lit(new java.math.BigDecimal("4.05"))))._2 == 0)
    // NO FALSE NEGATIVES: sampled present values always return their rows
    (0L until 20000L by 977L).foreach { i =>
      val v = new java.math.BigDecimal(f"${i % 5000}%d.${i % 100}%02d")
      assert(load().filter(col("amt") === lit(v)).count() >= 1L,
        s"bloom must never prune the file holding amt=$v")
    }
    // a v1-era filter must REFUSE decimal probes (v1 writers were
    // decimal-blind — probing would manufacture false absences) while
    // still serving v1-era types
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("m", DecimalType(10, 2))))
    val bf = org.apache.datasketches.filters.bloomfilter.BloomFilterBuilder
      .createByAccuracy(100, FileStats.BloomFpp, FileStats.BloomSeed)
    bf.update(7L)
    val b64 = java.util.Base64.getEncoder.encodeToString(bf.toByteArray)
    def stat(marker: String) = FileStat("file:/w/t/data/snap-00001/a.parquet",
      rows = 1, bytes = 10, bloom = Map("id" -> b64, "m" -> b64,
        FileStats.BloomVersionKey -> marker))
    val v1 = stat(FileStats.BloomVersionV1)
    assert(!FilePrune.canMatch(EqualTo("id", 8L), schema, v1),
      "v1 filters keep pruning v1-era types")
    assert(FilePrune.canMatch(
      EqualTo("m", new java.math.BigDecimal("0.08")), schema, v1),
      "a v1 marker must not prove a decimal absence")
    val v2 = stat(FileStats.BloomVersion).copy(
      path = "file:/w/t/data/snap-00001/b.parquet")
    assert(!FilePrune.canMatch(
      EqualTo("m", new java.math.BigDecimal("0.08")), schema, v2),
      "a v2 filter prunes decimals (0.08 hashes to unscaled 8 != 7)")
    assert(FilePrune.canMatch(
      EqualTo("m", new java.math.BigDecimal("0.07")), schema, v2),
      "unscaled 7 was inserted: must stay")
  }

  test("decimal bloom probes survive a fixed-scale precision widening") {
    val wh = scratch("bloom-dwide")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = Seq("12.34", "99.99", "0.01").toDF("a")
      .select(col("a").cast("decimal(10,2)").as("amt"))
    cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "amt"))
    spark.conf.set("spark.sql.catalog.ice_bdw", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bdw.warehouse", wh)
    df.writeTo("ice_bdw.lake.t").append()
    // widen across the long/byte physical boundary: the OLD file's filter
    // was built from unscaled longs; probes under the widened type must
    // still find those values (hash dispatch is by VALUE, not precision)
    spark.sql("ALTER TABLE ice_bdw.lake.t ALTER COLUMN amt TYPE DECIMAL(20,2)")
    def load() = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load()
    assert(load().filter(
      col("amt") === lit(new java.math.BigDecimal("12.34"))).count() == 1L,
      "pre-widening value must stay findable through the old bloom")
    assert(planned(load().filter(
      col("amt") === lit(new java.math.BigDecimal("55.55"))))._2 == 0,
      "absent value still proves absent under the widened type")
  }

  test("runtime re-prune is probe-budgeted: over-budget In keeps the static plan") {
    import org.apache.spark.sql.sources.In
    val wh = scratch("bloom-budget")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (0L until 20000L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("lake", "t", df.schema,
      properties = Map("write.bloom.columns" -> "id",
        "write.bloom.capacity" -> "20000"))
    spark.conf.set("spark.sql.catalog.ice_bb", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_bb.warehouse", wh)
    (0 until 4).foreach(m => df.filter(col("id") % 4 === m)
      .repartition(1).writeTo("ice_bb.lake.t").append())

    // drive the runtime path directly: grab the physical scan and hand it
    // an In the way Spark's runtime filtering does
    def runtimePlanned(keys: Array[Any]): Int = {
      val q = spark.read.format("icelite")
        .option("warehouse", wh).option("table", "lake.t").load()
      val scan = q.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.head
      scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
        .filter(Array[org.apache.spark.sql.sources.Filter](In("id", keys)))
      scan.toBatch.planInputPartitions().length
    }
    val keys: Array[Any] = Array(4L, 9L) // live in 2 different files
    // in budget (2 keys x 4 files = 8 probes): blooms prune to 2 files
    assert(runtimePlanned(keys) == 2,
      "an in-budget runtime In must prune through the blooms")
    // over budget: the filter is dropped, the static plan (all 4) stands —
    // pruning is optional, so the fallback is sound, never wrong rows
    spark.conf.set("graft.prune.probeBudget", "7")
    try {
      assert(runtimePlanned(keys) == 4,
        "an over-budget runtime In must leave the statically planned set")
      // and the QUERY through a real broadcast join still answers correctly
      val dimPath = scratch("bloom-budget-dim")
      Seq((4L, "keep"), (9L, "keep")).toDF("k", "tag").write.parquet(dimPath)
      spark.read.parquet(dimPath).createOrReplaceTempView("budget_dim")
      val rows = spark.sql(
        """SELECT f.id FROM ice_bb.lake.t f
          |JOIN budget_dim d ON f.id = d.k""".stripMargin).collect()
      assert(rows.map(_.getLong(0)).toSet == Set(4L, 9L))
    } finally spark.conf.unset("graft.prune.probeBudget")
  }
}
