package graft

import org.apache.spark.sql.functions._
import graft.icelite.IceCatalog

/** Writer-recorded per-file HLL NDV sketches (FileStat.ndv) and the
  * manifest-only table-level estimate (IceTable.approxDistinct).
  */
class NdvSpec extends SparkSpec {

  test("approxDistinct answers from manifests within the HLL bound, with zero data IO") {
    val wh = scratch("ndv")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = (1L to 5000L).map(i => (i, i % 97, s"u${i % 613}", s"t${i % 7}"))
      .toDF("id", "grp", "user", "kind")
    cat.createTable("lake", "t", df.schema)
    spark.conf.set("spark.sql.catalog.ice_ndv", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_ndv.warehouse", wh)
    // two appends through the sketching DSv2 writer: sketches must UNION
    // across files (5000 ids split over two commits)
    df.filter(col("id") <= 2500).writeTo("ice_ndv.lake.t").append()
    df.filter(col("id") > 2500).writeTo("ice_ndv.lake.t").append()
    val tbl = cat.loadTable("lake", "t")
    val expect = Map("id" -> 5000L, "grp" -> 97L, "user" -> 613L, "kind" -> 7L)
    expect.foreach { case (c, exact) =>
      val est = tbl.approxDistinct(c).getOrElse(fail(s"no sketch for $c"))
      assert(math.abs(est - exact) <= math.max(1.0, exact * 0.05),
        s"$c: estimate $est vs exact $exact breaches the 5% bound")
    }
    // the zero-data-IO proof: physically DELETE every data file — the
    // estimates must still answer, unchanged, from the manifest alone
    val before = expect.keys.map(c => c -> tbl.approxDistinct(c).get).toMap
    val dataDir = new org.apache.hadoop.fs.Path(s"$wh/lake/t/data")
    val fs = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(dataDir, true)
    var deleted = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        fs.delete(f.getPath, false); deleted += 1
      }
    }
    assert(deleted > 0, "fixture must have had data files to delete")
    val t2 = cat.loadTable("lake", "t")
    expect.keys.foreach { c =>
      assert(t2.approxDistinct(c).contains(before(c)),
        s"$c estimate must survive data-file deletion (manifest-only read)")
    }
  }

  test("approxDistinct refuses on sketchless files and non-sketch columns; empty table is 0") {
    val wh = scratch("ndv-refuse")
    val cat = new IceCatalog(spark, wh)
    import spark.implicits._
    val df = Seq((1L, 2.5), (2L, 3.5)).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    assert(tbl.approxDistinct("id").contains(0.0), "empty table estimates 0")
    // refusal is CONSISTENT: nonexistent and non-sketchable columns refuse
    // on empty tables too — Some(0.0) means "sketchable, zero rows"
    assert(tbl.approxDistinct("nope").isEmpty, "unknown column refuses")
    assert(tbl.approxDistinct("v").isEmpty, "double refuses even when empty")
    // IceTable.append collects stats from footers only — no sketches —
    // so the table-level estimate must refuse, not undercount
    tbl.append(df)
    assert(tbl.approxDistinct("id").isEmpty,
      "a visible file without a sketch must refuse the estimate")
    // doubles are not sketch-eligible even through the DSv2 writer
    val wh2 = scratch("ndv-refuse2")
    val cat2 = new IceCatalog(spark, wh2)
    cat2.createTable("lake", "t", df.schema)
    spark.conf.set("spark.sql.catalog.ice_ndv2", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_ndv2.warehouse", wh2)
    df.writeTo("ice_ndv2.lake.t").append()
    val t2 = cat2.loadTable("lake", "t")
    assert(t2.approxDistinct("id").isDefined, "long column sketches")
    assert(t2.approxDistinct("v").isEmpty, "double column has no sketch")
  }

  test("empty strings count as a distinct value; graft.ndv.columns scopes sketching") {
    import spark.implicits._
    // datasketches update(String) skips "" — the writer's sentinel prefix
    // must keep it countable
    val wh = scratch("ndv-empty")
    val cat = new IceCatalog(spark, wh)
    val df = Seq((1L, ""), (2L, "active"), (3L, ""), (4L, "closed"))
      .toDF("id", "status")
    cat.createTable("lake", "t", df.schema)
    spark.conf.set("spark.sql.catalog.ice_ndve", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_ndve.warehouse", wh)
    df.writeTo("ice_ndve.lake.t").append()
    val est = cat.loadTable("lake", "t").approxDistinct("status").get
    assert(math.abs(est - 3.0) < 0.5,
      s"status has 3 distinct values including '' — estimate was $est")
    // column gate: only the listed column is sketched
    val wh2 = scratch("ndv-gate")
    val cat2 = new IceCatalog(spark, wh2)
    cat2.createTable("lake", "t", df.schema)
    spark.conf.set("spark.sql.catalog.ice_ndvg", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_ndvg.warehouse", wh2)
    spark.conf.set("graft.ndv.columns", "id")
    try df.writeTo("ice_ndvg.lake.t").append()
    finally spark.conf.unset("graft.ndv.columns")
    val t2 = cat2.loadTable("lake", "t")
    assert(t2.approxDistinct("id").exists(e => math.abs(e - 4.0) < 0.5),
      "gated-in column still sketches")
    assert(t2.approxDistinct("status").isEmpty,
      "gated-out column refuses (no sketch recorded)")
  }
}
