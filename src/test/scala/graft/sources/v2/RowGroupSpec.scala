package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetInputFormat}
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{And, GreaterThan, LessThan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.SparkSpec

/** Row-group skipping: pushed filters reach parquet-mr as a
  * FilterPredicate, so the vectorized reader never decodes row groups whose
  * footer stats cannot match.
  */
class RowGroupSpec extends SparkSpec {

  test("selective predicate decodes only matching row groups") {
    val dir = scratch("rowgroups")
    // many small row groups: sorted ids -> disjoint per-row-group ranges
    spark.range(200000).orderBy("id")
      .coalesce(1).write
      .option("parquet.block.size", "65536")
      .option("parquet.page.size", "8192")
      .parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val len = fs.getFileStatus(file).getLen
    val in = ParquetFileReader.open(HadoopInputFile.fromPath(file,
      spark.sparkContext.hadoopConfiguration))
    val groups = try in.getFooter.getBlocks.size finally in.close()
    assert(groups > 3, s"fixture needs many row groups, got $groups")

    val schema = StructType.fromDDL("id BIGINT")
    def readRows(filtered: Boolean): Long = {
      val c = new Configuration(spark.sparkContext.hadoopConfiguration)
      Seq("spark.sql.parquet.binaryAsString" -> "false",
        "spark.sql.parquet.int96AsTimestamp" -> "true",
        "spark.sql.caseSensitive" -> "false",
        "spark.sql.parquet.inferTimestampNTZ.enabled" -> "true",
        "spark.sql.legacy.parquet.nanosAsLong" -> "false",
        "spark.sql.parquet.fieldId.read.enabled" -> "false",
        "spark.sql.session.timeZone" -> "UTC"
      ).foreach { case (k, v) => c.set(k, v) }
      if (filtered)
        RowGroupFilter.build(
          Array(And(GreaterThan("id", 1000L), LessThan("id", 3000L))), schema)
          .foreach(p => ParquetInputFormat.setFilterPredicate(c, p))
      val r = new IceLiteColumnarReader(file.toString, len, Map.empty,
        new SerializableConfiguration(c), schema, StructType(Nil), -1)
      try {
        var rows = 0L
        while (r.next()) rows += r.get().numRows()
        rows
      } finally r.close()
    }

    val all = readRows(filtered = false)
    assert(all == 200000L)
    val pruned = readRows(filtered = true)
    // must still cover every matching row, but skip most row groups
    assert(pruned >= 1999L, s"row-group filter dropped matching rows: $pruned")
    assert(pruned < all / 2, s"no row groups skipped: decoded $pruned of $all")

    // and through the engine: same answer as the unfiltered truth
    val wh = scratch("rowgroups-wh")
    val cat = new graft.icelite.IceCatalog(spark, wh)
    val df = spark.range(50000).select(col("id"), (col("id") % 97).as("m"))
    cat.createTable("lake", "t", df.schema).append(df.orderBy("id"))
    val q = spark.read.format("icelite")
      .option("warehouse", wh).option("table", "lake.t").load()
      .filter(col("id") > 1000 && col("id") < 3000)
    assert(q.count() == 1999)
  }

  test("timestamp filters never become row-group predicates (INT96 files)") {
    // Spark's parquet writer defaults to INT96 timestamps; force it so the
    // fixture stays a repro even if the session default changes. A long-typed
    // parquet predicate on such a column (including the IsNotNull Catalyst
    // infers for ANY timestamp comparison) makes parquet-mr's
    // SchemaCompatibilityValidator fail the whole read.
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val wh = scratch("rowgroups-ts-wh")
      val cat = new graft.icelite.IceCatalog(spark, wh)
      val df = spark.range(1000).select(col("id"),
        timestamp_micros(col("id") * 1000000L + 1600000000000000L).as("ts"))
      cat.createTable("lake", "ts_t", df.schema).append(df)
      val q = spark.read.format("icelite")
        .option("warehouse", wh).option("table", "lake.ts_t").load()
        .filter(col("ts") > lit("2020-09-13 12:30:00").cast("timestamp"))
      // would throw "declared type java.lang.Long does not match" if any
      // timestamp predicate (incl. inferred IsNotNull) reached parquet-mr
      assert(q.count() ==
        df.filter(col("ts") > lit("2020-09-13 12:30:00").cast("timestamp")).count())
      // the translator itself must refuse timestamp IsNotNull
      val tsSchema = StructType.fromDDL("ts TIMESTAMP")
      assert(RowGroupFilter.build(
        Array(org.apache.spark.sql.sources.IsNotNull("ts")), tsSchema).isEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
  }
}
