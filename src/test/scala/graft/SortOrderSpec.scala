package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.icelite.{IceCatalog, MetaIo}
import org.apache.hadoop.fs.Path

/** Declared table sort order: enforced on every write path, carried through
  * schema evolution, reported by the scan (SupportsReportOrdering) so merge
  * joins of co-bucketed co-sorted tables skip both shuffles and sorts.
  */
class SortOrderSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed data-file paths of the table's current snapshot. */
  private def dataFiles(tbl: graft.icelite.IceTable): Seq[String] =
    tbl.meta.currentSnapshot.map(tbl.visibleFiles).getOrElse(Nil).map(_.path)

  /** Assert each file's rows are individually sorted on `col` ascending. */
  private def assertFilesSorted(paths: Seq[String], c: String): Unit = {
    assert(paths.nonEmpty, "no data files committed")
    paths.foreach { p =>
      val vals = spark.read.parquet(p).select(c).collect().map(_.get(0))
      val sorted = vals.sortBy(_.asInstanceOf[Long])
      assert(vals.toSeq == sorted.toSeq, s"file $p not sorted on $c")
    }
  }

  test("API append writes every file sorted on the declared order") {
    val wh = scratch("sort-append")
    val cat = new IceCatalog(spark, wh)
    val df = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(rand(7)) // deliberately unsorted input
    val tbl = cat.createTable("lake", "t", df.schema, sortedBy = Seq("o_custkey"))
    tbl.append(df.repartition(3))
    assertFilesSorted(dataFiles(tbl), "o_custkey")
  }

  test("declared sort survives compaction; z-order compaction is refused") {
    val wh = scratch("sort-compact")
    val cat = new IceCatalog(spark, wh)
    val df = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val tbl = cat.createTable("lake", "t", df.schema, sortedBy = Seq("o_orderkey"))
    tbl.append(df.repartition(4))
    tbl.compact(targetFiles = 2)
    assertFilesSorted(dataFiles(tbl), "o_orderkey")
    val e = intercept[IllegalArgumentException] {
      tbl.compact(zorderBy = Seq("o_orderkey", "o_custkey"))
    }
    assert(e.getMessage.contains("sort order"))
  }

  test("SQL CREATE TABLE ('sorted_by') + INSERT writes sorted files") {
    val wh = scratch("sort-sql")
    spark.conf.set("spark.sql.catalog.ice_so1", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_so1.warehouse", wh)
    spark.sql("""CREATE TABLE ice_so1.lake.t
                |  (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
                |  TBLPROPERTIES ('sorted_by' = 'o_custkey')""".stripMargin)
    graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(rand(11)).repartition(3)
      .createOrReplaceTempView("so1_src")
    spark.sql("INSERT INTO ice_so1.lake.t SELECT * FROM so1_src")
    val tbl = new IceCatalog(spark, wh).loadTable("lake", "t")
    assert(tbl.meta.sortOrder == Seq("o_custkey"))
    assertFilesSorted(dataFiles(tbl), "o_custkey")
  }

  test("rename carries the sort order; drop truncates it to the valid prefix") {
    val wh = scratch("sort-evolve")
    spark.conf.set("spark.sql.catalog.ice_so2", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_so2.warehouse", wh)
    spark.sql("""CREATE TABLE ice_so2.lake.t
                |  (a BIGINT, b BIGINT, c STRING)
                |  TBLPROPERTIES ('sorted_by' = 'a,b')""".stripMargin)
    val cat = new IceCatalog(spark, wh)
    spark.sql("ALTER TABLE ice_so2.lake.t RENAME COLUMN a TO a2")
    assert(cat.loadTable("lake", "t").meta.sortOrder == Seq("a2", "b"))
    spark.sql("ALTER TABLE ice_so2.lake.t DROP COLUMN b")
    // files sorted by (a2, b) are still sorted by (a2) — prefix survives
    assert(cat.loadTable("lake", "t").meta.sortOrder == Seq("a2"))
    spark.sql("ALTER TABLE ice_so2.lake.t DROP COLUMN a2")
    assert(cat.loadTable("lake", "t").meta.sortOrder == Nil)
  }

  test("replace() whose schema drops a sort column clears the declaration") {
    val wh = scratch("sort-replace")
    val cat = new IceCatalog(spark, wh)
    val df = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val tbl = cat.createTable("lake", "t", df.schema, sortedBy = Seq("o_custkey"))
    tbl.append(df)
    tbl.replace(df.select("o_orderkey")) // sort column gone
    assert(tbl.meta.sortOrder == Nil)
    // same-shape replace keeps (and re-enforces) the declaration
    val tbl2 = cat.createTable("lake", "t2", df.schema, sortedBy = Seq("o_custkey"))
    tbl2.append(df)
    tbl2.replace(df.orderBy(rand(3)))
    assert(tbl2.meta.sortOrder == Seq("o_custkey"))
    assertFilesSorted(dataFiles(tbl2), "o_custkey")
  }

  test("COW row-level UPDATE rewrites files back into sorted order") {
    val wh = scratch("sort-update")
    spark.conf.set("spark.sql.catalog.ice_so3", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_so3.warehouse", wh)
    val cat = new IceCatalog(spark, wh)
    val df = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    cat.createTable("lake", "t", df.schema, sortedBy = Seq("o_custkey"))
      .append(df.repartition(2))
    spark.sql("UPDATE ice_so3.lake.t SET o_totalprice = 0.0 WHERE o_orderkey % 7 = 0")
    val tbl = cat.loadTable("lake", "t")
    assertFilesSorted(dataFiles(tbl), "o_custkey")
  }

  test("scan reports the order: co-bucketed co-sorted merge join has no sort") {
    val wh = scratch("sort-spj")
    val cat = new IceCatalog(spark, wh)
    val o = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.queries.QUtil.t(spark, sfDir, "customer")
      .select("c_custkey", "c_name")
    cat.createTable("lake", "ord", o.schema,
      partitionBy = Seq("bucket(4,o_custkey)"), sortedBy = Seq("o_custkey"))
      .append(o.repartition(4, pmod(hash(col("o_custkey")), lit(4))))
    cat.createTable("lake", "cust", c.schema,
      partitionBy = Seq("bucket(4,c_custkey)"), sortedBy = Seq("c_custkey"))
      .append(c.repartition(4, pmod(hash(col("c_custkey")), lit(4))))
    spark.conf.set("spark.sql.catalog.ice_so4", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_so4.warehouse", wh)
    val joined = spark.sql(
      """SELECT /*+ MERGE(o) */ c_custkey, o_totalprice
        |FROM ice_so4.lake.cust c JOIN ice_so4.lake.ord o
        |  ON o.o_custkey = c.c_custkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ: $plan")
    assert(!plan.contains("Exchange"), s"expected zero shuffles: $plan")
    assert(!plan.contains("Sort ["), s"expected zero sorts: $plan")
    // and the result is right
    val expected = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "o_totalprice")
    assert(joined.orderBy("c_custkey", "o_totalprice").collect().toSeq ==
      expected.orderBy("c_custkey", "o_totalprice").collect().toSeq)
  }

  test("catalog INSERT clusters by transform value: O(buckets) files, each sorted") {
    val wh = scratch("sort-bucketins")
    spark.conf.set("spark.sql.catalog.ice_so5", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_so5.warehouse", wh)
    // sort column differs from the bucket source: within one bucket dir
    // many k values interleave, so file order must be s alone — the exact
    // case a (source, sort) write order would get wrong
    spark.sql("""CREATE TABLE ice_so5.lake.t (k BIGINT, s BIGINT, v DOUBLE)
                |  PARTITIONED BY (bucket(4, k))
                |  TBLPROPERTIES ('sorted_by' = 's')""".stripMargin)
    spark.range(2000).select(
      col("id").as("k"),
      pmod(col("id") * 131, lit(2000)).cast("long").as("s"),
      rand(13).as("v"))
      .repartition(8) // many tasks: the transform clustering must coalesce them
      .createOrReplaceTempView("so5_src")
    spark.sql("INSERT INTO ice_so5.lake.t SELECT * FROM so5_src")
    val tbl = new IceCatalog(spark, wh).loadTable("lake", "t")
    val files = dataFiles(tbl)
    // transform-value clustering: one task per non-empty bucket, one file
    // per (task, dir) => at most one file per bucket, not tasks x buckets
    assert(files.size <= 4, s"expected <= 4 files (one per bucket), got ${files.size}")
    assertFilesSorted(files, "s")
    // and every row landed in the dir its bucket transform maps to
    val total = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load().count()
    assert(total == 2000)
  }

  test("projection keeps only the surviving prefix of the reported order") {
    // files sorted by (a, b): a projection that drops `a` must not claim
    // rows are sorted by (b) — exercised through the table-level prune path
    val wh = scratch("sort-prefix")
    val cat = new IceCatalog(spark, wh)
    val df = spark.range(100).select(
      (col("id") / 10).cast("long").as("a"),
      pmod(col("id") * 37, lit(100)).cast("long").as("b"))
    val tbl = cat.createTable("lake", "t", df.schema, sortedBy = Seq("a", "b"))
    tbl.append(df.orderBy(rand(5)))
    assertFilesSorted(dataFiles(tbl), "a")
    val meta = MetaIo.read(fs, cat.tablePath("lake", "t"))
    assert(meta.sortOrder == Seq("a", "b"))
  }

  test("CALL system.set_sort_order declares post-create: rewrite + declaration atomic") {
    val wh = scratch("sort-declare")
    val cat = new IceCatalog(spark, wh)
    val df = graft.queries.QUtil.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(rand(11)) // deliberately unsorted
    val tbl = cat.createTable("lake", "t", df.schema) // NO declared order
    tbl.append(df.repartition(3))
    spark.conf.set("spark.sql.catalog.ice_sso", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_sso.warehouse", wh)
    val snapsBefore = tbl.snapshots.length
    val r = spark.sql("CALL ice_sso.system.set_sort_order('lake.t', " +
      "array('o_custkey'), target_files => 2)").collect()(0)
    assert(r.getString(1) == "o_custkey" && r.getString(2) == "", s"got $r")
    val t1 = cat.loadTable("lake", "t")
    // ONE commit carries both the rewrite and the declaration
    assert(t1.meta.sortOrder == Seq("o_custkey"))
    assert(t1.snapshots.length == snapsBefore + 1,
      "rewrite + declaration must be one atomic commit")
    assertFilesSorted(dataFiles(t1), "o_custkey")
    assert(t1.toDF.count() == df.count())
    // the declaration is live: subsequent appends write sorted
    t1.append(df.limit(500).orderBy(rand(13)).repartition(2))
    assertFilesSorted(dataFiles(cat.loadTable("lake", "t")), "o_custkey")
    // clearing is metadata-only — no new snapshot
    val preClear = cat.loadTable("lake", "t").snapshots.length
    spark.sql("CALL ice_sso.system.set_sort_order('lake.t', array())")
    val t2 = cat.loadTable("lake", "t")
    assert(t2.meta.sortOrder.isEmpty)
    assert(t2.snapshots.length == preClear, "clearing must not rewrite")
    // the TBLPROPERTIES spelling still refuses (no rewrite = wrong report)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE ice_sso.lake.t SET TBLPROPERTIES ('sorted_by' = 'o_orderkey')"))
    assert(e.getMessage.contains("set_sort_order"))
    // unknown sort column refuses
    intercept[Exception](spark.sql(
      "CALL ice_sso.system.set_sort_order('lake.t', array('nope'))"))
  }
}
