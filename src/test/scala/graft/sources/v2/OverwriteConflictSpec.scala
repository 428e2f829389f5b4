package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.LogicalWriteInfo
import org.apache.spark.sql.connector.write.PhysicalWriteInfo
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.icelite.IceCatalog

/** Isolation semantics of dynamic partition overwrite under concurrency.
  *
  * Default = snapshot isolation, last-writer-wins on touched partitions
  * (Iceberg's default). `.option("validateNoConflicts","true")` = abort
  * when a file the overwrite never saw would be dropped (Iceberg's
  * validateNoConflictingData shape). The spec drives the DSv2 write
  * MANUALLY (build → task write → inject append → commit) so the
  * "concurrent" writer lands deterministically inside the window, with no
  * race timing.
  */
class OverwriteConflictSpec extends graft.SparkSpec {

  private def info(writeSchema: StructType, opts: Map[String, String]): LogicalWriteInfo =
    new LogicalWriteInfo {
      override def queryId(): String = java.util.UUID.randomUUID().toString
      override def schema(): StructType = writeSchema
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(opts.asJava)
    }

  private def row(k: Long, g: String, v: String): InternalRow =
    InternalRow.fromSeq(Seq(k, UTF8String.fromString(g), UTF8String.fromString(v)))

  /** build() the overwrite, write one row for partition `g=a`, then run
    * `between()` (the deterministic concurrent writer), then commit().
    */
  private def overwriteWithInjectedWrite(
      wh: String, opts: Map[String, String])(between: () => Unit): Unit = {
    import spark.implicits._
    val schema = Seq((1L, "a", "x")).toDF("k", "g", "v").schema
    val b = new IceLiteWriteBuilder(wh, "lake", "t", info(schema, opts))
    b.overwriteDynamicPartitions()
    val batch = b.build().toBatch
    val factory = batch.createBatchWriterFactory(new PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    })
    val w = factory.createWriter(0, 0L)
    w.write(row(100L, "a", "ow"))
    val msg = w.commit()
    between()
    batch.commit(Array(msg))
  }

  private def fixture(tag: String, properties: Map[String, String] = Map.empty)
      : (String, graft.icelite.IceTable) = {
    import spark.implicits._
    val wh = scratch(s"ovc-$tag")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 20L).map(i => (i, if (i % 2 == 0) "a" else "b", s"v$i"))
      .toDF("k", "g", "v")
    val tbl = cat.createTable("lake", "t", df.schema, partitionBy = Seq("g"),
      properties = properties)
    tbl.append(df)
    (wh, tbl)
  }

  test("validateNoConflicts aborts when a concurrent append lands in a touched partition") {
    import spark.implicits._
    val (wh, tbl) = fixture("abort")
    val ex = intercept[IllegalStateException] {
      overwriteWithInjectedWrite(wh, Map("validateNoConflicts" -> "true")) { () =>
        tbl.append(Seq((500L, "a", "late")).toDF("k", "g", "v"))
      }
    }
    assert(ex.getMessage.contains("validateNoConflicts"),
      s"expected the conflict abort, got: ${ex.getMessage}")
    // the aborted overwrite must leave the table on the concurrent
    // append's snapshot — nothing half-committed
    val cat = new IceCatalog(spark, wh)
    val a = cat.loadTable("lake", "t").toDF
      .filter(col("g") === "a").select("k").as[Long].collect().toSet
    assert(a.contains(500L) && !a.contains(100L),
      s"aborted overwrite must not publish its rows: $a")
  }

  test("validateNoConflicts tolerates a concurrent append in a FOREIGN partition") {
    import spark.implicits._
    val (wh, tbl) = fixture("foreign")
    overwriteWithInjectedWrite(wh, Map("validateNoConflicts" -> "true")) { () =>
      tbl.append(Seq((600L, "b", "late")).toDF("k", "g", "v"))
    }
    val cat = new IceCatalog(spark, wh)
    val t2 = cat.loadTable("lake", "t").toDF
    val a = t2.filter(col("g") === "a").select("k").as[Long].collect().toSet
    val b = t2.filter(col("g") === "b").select("k").as[Long].collect().toSet
    assert(a == Set(100L), s"touched partition must hold the overwrite's rows: $a")
    assert(b.contains(600L), s"foreign append must be carried: $b")
  }

  test("table property write.overwrite.validate-conflicts drives the abort (SQL spelling)") {
    import spark.implicits._
    // no .option() anywhere — the property alone must arm the check; this
    // is the only spelling a SQL `INSERT OVERWRITE` user controls
    val (wh, tbl) = fixture("prop",
      Map(IceCatalog.ValidateConflictsProp -> "true"))
    val ex = intercept[IllegalStateException] {
      overwriteWithInjectedWrite(wh, Map.empty) { () =>
        tbl.append(Seq((500L, "a", "late")).toDF("k", "g", "v"))
      }
    }
    assert(ex.getMessage.contains("validateNoConflicts"),
      s"expected the conflict abort, got: ${ex.getMessage}")
  }

  test("session conf graft.write.validateNoConflicts drives the abort") {
    import spark.implicits._
    val (wh, tbl) = fixture("conf")
    spark.conf.set("graft.write.validateNoConflicts", "true")
    try {
      val ex = intercept[IllegalStateException] {
        overwriteWithInjectedWrite(wh, Map.empty) { () =>
          tbl.append(Seq((500L, "a", "late")).toDF("k", "g", "v"))
        }
      }
      assert(ex.getMessage.contains("validateNoConflicts"),
        s"expected the conflict abort, got: ${ex.getMessage}")
    } finally spark.conf.unset("graft.write.validateNoConflicts")
  }

  test("explicit option false overrides a table-property true (precedence)") {
    import spark.implicits._
    val (wh, tbl) = fixture("prec",
      Map(IceCatalog.ValidateConflictsProp -> "true"))
    // a single bulk rewrite opts OUT of the table-level default: last-
    // writer-wins applies, no abort
    overwriteWithInjectedWrite(wh, Map("validateNoConflicts" -> "false")) { () =>
      tbl.append(Seq((500L, "a", "late")).toDF("k", "g", "v"))
    }
    val cat = new IceCatalog(spark, wh)
    val a = cat.loadTable("lake", "t").toDF
      .filter(col("g") === "a").select("k").as[Long].collect().toSet
    assert(a == Set(100L),
      s"option false must disarm the property and last-writer-win: $a")
  }

  test("SQL INSERT OVERWRITE end to end honors the table property (no conflict = clean commit)") {
    val wh = scratch("ovc-sql")
    spark.conf.set("spark.sql.catalog.ovc_sql", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ovc_sql.warehouse", wh)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("CREATE TABLE ovc_sql.lake.t (k BIGINT, g STRING) " +
        "PARTITIONED BY (g) TBLPROPERTIES " +
        s"('${IceCatalog.ValidateConflictsProp}' = 'true')")
      spark.sql("INSERT INTO ovc_sql.lake.t VALUES (1, 'a'), (2, 'b')")
      // armed by the property, conflict-free: must commit normally
      spark.sql("INSERT OVERWRITE ovc_sql.lake.t VALUES (10, 'a')")
      val rows = spark.table("ovc_sql.lake.t").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((10L, "a"), (2L, "b")),
        s"dynamic overwrite must replace only g=a: $rows")
      // a typo'd property value must fail the DDL at the door
      val bad = intercept[Exception] {
        spark.sql("ALTER TABLE ovc_sql.lake.t SET TBLPROPERTIES " +
          s"('${IceCatalog.ValidateConflictsProp}' = 'tru')")
      }
      assert(bad.getMessage.contains(IceCatalog.ValidateConflictsProp),
        s"expected property validation, got: ${bad.getMessage}")
    } finally {
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      spark.conf.unset("spark.sql.catalog.ovc_sql")
      spark.conf.unset("spark.sql.catalog.ovc_sql.warehouse")
    }
  }

  test("default (no option) keeps last-writer-wins on the touched partition") {
    import spark.implicits._
    val (wh, tbl) = fixture("lww")
    overwriteWithInjectedWrite(wh, Map.empty) { () =>
      tbl.append(Seq((500L, "a", "late")).toDF("k", "g", "v"))
    }
    val cat = new IceCatalog(spark, wh)
    val a = cat.loadTable("lake", "t").toDF
      .filter(col("g") === "a").select("k").as[Long].collect().toSet
    assert(a == Set(100L),
      s"snapshot-isolation default must last-writer-win the touched partition: $a")
  }
}
