package graft.sources.v2

import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.icelite._

/** Round-6 hardening: the group-based (copy-on-write) row-level commit must
  * hold the same race contracts as the delta path — a merge-on-read delete
  * or a schema/spec change committed between table load and the COW commit
  * would otherwise be silently dropped for replaced files (the rewrite
  * predates it), resurrecting deleted rows. And the write-path partition
  * transforms must be session-timezone-free, or a non-UTC writer would land
  * rows in directories the (zone-free) pruner never probes.
  */
class RowLevelRaceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(tag: String) = {
    val wh = scratch(tag)
    val cat = new IceCatalog(spark, wh)
    val df = (0 until 100).map(i => (i, s"v$i")).toDF("k", "v")
    val tbl = cat.createTable("ns", "t", df.schema)
    tbl.append(df)
    (wh, tbl, df.schema)
  }

  private def cowWrite(wh: String, tbl: IceTable, schema: StructType) = {
    val files = tbl.visibleFiles(tbl.meta.currentSnapshot.get)
    val op = new IceLiteRowLevelOperation(wh, "ns", "t", schema, Nil, files,
      RowLevelOperation.Command.UPDATE)
    op.recordPlanned(files)
    new IceLiteReplaceGroupsBatchWrite(wh, "ns", "t", Nil, schema, op)
  }

  test("COW row-level commit aborts when a MOR delete raced it") {
    val (wh, tbl, schema) = freshTable("cowrace-del")
    val bw = cowWrite(wh, tbl, schema)
    // the race: a merge-on-read DELETE lands between load and commit — the
    // rewrite was built from PRE-delete content, so carrying the new delete
    // set forward would resurrect the deleted row inside replaced files
    tbl.deleteWhereMor(Seq(org.apache.spark.sql.sources.EqualTo("k", 3)))
    val ex = intercept[IllegalArgumentException](bw.commit(Array.empty))
    assert(ex.getMessage.contains("raced a concurrent row-level delete"))
  }

  test("COW row-level commit aborts when a partition-spec change raced it") {
    val (wh, tbl, schema) = freshTable("cowrace-spec")
    val bw = cowWrite(wh, tbl, schema)
    tbl.setPartitionSpec(Seq("k"))
    val ex = intercept[IllegalArgumentException](bw.commit(Array.empty))
    assert(ex.getMessage.contains("raced a concurrent schema change"))
  }

  test("write-path transform columns are session-timezone-free") {
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    // +05:45 — fractional offset catches day, hour, month AND year drift
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
    try {
      // zoned timestamps straddling UTC year/day/hour boundaries (their
      // Kathmandu wall clock is in a different year/day than their UTC one)
      val instants = Seq(
        java.time.Instant.parse("2023-12-31T19:00:00Z"),
        java.time.Instant.parse("1969-12-31T23:00:00Z"),
        java.time.Instant.parse("2024-06-15T22:30:00Z"))
      val tsDf = instants.toDF("c")
      for (f <- Seq(DaysField("c"), MonthsField("c"), YearsField("c"), HoursField("c"))) {
        val got = tsDf.select(Transforms.columnExpr(f, TimestampType))
          .collect().map(_.getInt(0)).toSeq
        val want = instants.map(i => Transforms.applyCatalyst(f, TimestampType,
          i.getEpochSecond * 1000000L + i.getNano / 1000L).asInstanceOf[Int])
        assert(got == want,
          s"${f.spec} over TIMESTAMP diverges from applyCatalyst in a non-UTC session")
      }
      // NTZ wall clocks near midnight: an NTZ→TIMESTAMP cast would shift
      // them across the day boundary under any non-UTC session zone
      val ntzs = Seq(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 30),
        java.time.LocalDateTime.of(1969, 12, 31, 23, 15))
      val ntzDf = ntzs.toDF("c")
      for (f <- Seq(DaysField("c"), MonthsField("c"), YearsField("c"), HoursField("c"))) {
        val got = ntzDf.select(Transforms.columnExpr(f, TimestampNTZType))
          .collect().map(_.getInt(0)).toSeq
        val want = ntzs.map { l =>
          val i = l.toInstant(java.time.ZoneOffset.UTC)
          Transforms.applyCatalyst(f, TimestampNTZType,
            i.getEpochSecond * 1000000L + i.getNano / 1000L).asInstanceOf[Int]
        }
        assert(got == want,
          s"${f.spec} over TIMESTAMP_NTZ diverges from applyCatalyst in a non-UTC session")
      }
      val dates = Seq(java.time.LocalDate.of(2024, 3, 15),
        java.time.LocalDate.of(1969, 2, 1))
      val dateDf = dates.toDF("c")
      for (f <- Seq(DaysField("c"), MonthsField("c"), YearsField("c"))) {
        val got = dateDf.select(Transforms.columnExpr(f, DateType))
          .collect().map(_.getInt(0)).toSeq
        val want = dates.map(d => Transforms.applyCatalyst(f, DateType,
          d.toEpochDay.toInt).asInstanceOf[Int])
        assert(got == want,
          s"${f.spec} over DATE diverges from applyCatalyst in a non-UTC session")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }
}
