package graft.sources.v2

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.icelite.IceCatalog

/** Streaming CDC changelog source (`option("changelog", "true")`): the
  * stream must emit exactly the batch changelog's rows — inserts from
  * added files, deletes RESOLVED TO ROW VALUES (positions and equality
  * keys) — across micro-batches, with rewriting history refused.
  */
class ChangelogStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drain(df: DataFrame, name: String): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"graft-cdc-$name").toString
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark.table(name)
  }

  test("changelog stream equals the batch changelog over MOR history") {
    val wh = scratch("cdcstream")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("ns", "t", base.schema)
    tbl.append(base.repartitionByRange(2, col("id")))             // snap 1
    tbl.upsertMorEq((50L to 54L).map(i => (i, "NEW")).toDF("id", "v"),
      Seq("id"))                                                   // snap 2
    tbl.deleteWhereMor(Seq(
      org.apache.spark.sql.sources.LessThanOrEqual("id", 10L)))    // snap 3
    val stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true")
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches
      .load()
    val got = drain(stream, s"cdc_${System.nanoTime()}")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._4, x._3, x._1)).toSeq
    val want = tbl.changelog(0L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(x => (x._4, x._3, x._1)).toSeq
    assert(got == want,
      s"stream/batch changelog mismatch:\n got=${got.take(20)}\nwant=${want.take(20)}")
    // shape checks: the eq delete resolved to OLD row values, the position
    // delete to the rows live at its parent
    assert(got.count(_._3 == "insert") == 105)
    val eqDels = got.filter(x => x._3 == "delete" && x._4 == 2L)
    assert(eqDels.map(x => (x._1, x._2)).sorted ==
      (50L to 54L).map(i => (i, s"v$i")),
      s"eq delete must carry the killed rows' values: $eqDels")
    val posDels = got.filter(x => x._3 == "delete" && x._4 == 3L)
    assert(posDels.map(_._1).sorted == (1L to 10L),
      s"position delete must resolve ids 1-10: $posDels")
  }

  test("changelog stream: pruned projection still resolves eq-delete keys") {
    val wh = scratch("cdcprune")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 40L).map(i => (i, s"v$i", i * 2.0)).toDF("id", "v", "x")
    val tbl = cat.createTable("ns", "t", base.schema)
    tbl.append(base)
    tbl.upsertMorEq(Seq((7L, "UP", 0.0)).toDF("id", "v", "x"), Seq("id"))
    val stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true")
      .load()
      .select("v", "_change_type") // prunes the eq key column `id`
    val got = drain(stream, s"cdcp_${System.nanoTime()}")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.count(_._2 == "insert") == 41)
    assert(got.filter(_._2 == "delete") == Seq(("v7", "delete")),
      s"pruned changelog must still resolve the eq-deleted row: $got")
  }

  test("changelog stream: fromSnapshotId bounds a fresh checkpoint; restart resumes") {
    val wh = scratch("cdcfrom")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("ns", "t", base.schema)
    tbl.append(base)                                               // snap 1
    tbl.deleteKeysEq(Seq(3L).toDF("id"), Seq("id"))                // snap 2
    tbl.append((51L to 60L).map(i => (i, "B")).toDF("id", "v"))    // snap 3
    // fresh checkpoint with fromSnapshotId=2: only snapshot 3's inserts
    def stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true").option("fromSnapshotId", "2")
      .load()
    // the memory sink cannot recover a checkpoint, so collect via
    // foreachBatch (same pattern as the append-tail resume test)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-resume").toString
    val seen = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, String, Long)]()
    def drainWith(): Unit = {
      val q = stream.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            seen.add((r.getLong(0), r.getString(2), r.getLong(3))))
          ()
        }
        .start()
      q.awaitTermination()
    }
    drainWith()
    import scala.jdk.CollectionConverters._
    val first = seen.asScala.toSet
    assert(first.size == 10 && first.forall(x => x._2 == "insert" && x._3 == 3L),
      s"bounded fresh checkpoint must start past snapshot 2: $first")
    // table advances while the stream is down; restart reads ONLY the delta
    tbl.deleteKeysEq(Seq(51L, 52L).toDF("id"), Seq("id"))          // snap 4
    drainWith()
    val delta = seen.asScala.toSet -- first
    assert(delta == Set((51L, "delete", 4L), (52L, "delete", 4L)),
      s"restart must deliver exactly snapshot 4's resolved deletes: $delta")
  }

  test("changelog stream over an identity-partitioned table") {
    val wh = scratch("cdcpart")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 30L).map(i => (i, s"g${i % 3}", s"v$i")).toDF("id", "grp", "v")
    val tbl = cat.createTable("ns", "t", base.schema, partitionBy = Seq("grp"))
    tbl.append(base)                                               // snap 1
    tbl.deleteWhereMor(Seq(org.apache.spark.sql.sources.EqualTo("id", 7L))) // snap 2
    val stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true").load()
    val got = drain(stream, s"cdcp2_${System.nanoTime()}")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // identity partition values come from directory constants and must be
    // served on BOTH insert and delete-resolution partitions
    assert(got.count(_._4 == "insert") == 30)
    assert(got.filter(x => x._4 == "insert" && x._1 % 3 == 1).forall(_._2 == "g1"))
    assert(got.filter(_._4 == "delete") == Seq((7L, "g1", "v7", "delete", 2L)),
      s"partitioned delete must resolve with its partition value: " +
        s"${got.filter(_._4 == "delete")}")
  }

  test("partitioned + eq-delete + pruned key: columns bind in declared order") {
    // the transposition regression: an identity partition column PRECEDING
    // a data column in the declared schema, with the eq key pruned from the
    // projection — the per-file permutation must map onto declared order,
    // not physical (data-then-constants) order
    val wh = scratch("cdcperm")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 30L).map(i => (i, s"g${i % 3}", s"v$i")).toDF("id", "grp", "v")
    val tbl = cat.createTable("ns", "t", base.schema, partitionBy = Seq("grp"))
    tbl.append(base)
    tbl.upsertMorEq(Seq((7L, "g1", "UP")).toDF("id", "grp", "v"), Seq("id"))
    val stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true").load()
      .select("grp", "v", "_change_type") // prunes the eq key `id`
    val got = drain(stream, s"cdcpm_${System.nanoTime()}")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got.count(_._3 == "insert") == 31)
    assert(got.filter(_._3 == "delete") == Seq(("g1", "v7", "delete")),
      s"delete row must bind (grp, v) in declared order: " +
        s"${got.filter(_._3 == "delete")}")
  }

  test("changelog stream refuses rewriting history; batch read refused") {
    val wh = scratch("cdcrw")
    val cat = new IceCatalog(spark, wh)
    val base = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("ns", "t", base.schema)
    tbl.append(base)
    tbl.compact(targetFiles = 1) // rewriting snapshot
    val stream = spark.readStream.format("icelite")
      .option("warehouse", wh).option("table", "ns.t")
      .option("changelog", "true").load()
    val ex = intercept[Exception](drain(stream, s"cdcrw_${System.nanoTime()}"))
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => Option(c.getMessage)
      .exists(_.contains("rewriting snapshot"))), s"got: $ex")
    // batch read with the changelog option fails loudly toward the TVF
    val bex = intercept[Exception](
      spark.read.format("icelite")
        .option("warehouse", wh).option("table", "ns.t")
        .option("changelog", "true").load().collect())
    assert(causes(bex).exists(c => Option(c.getMessage)
      .exists(_.contains("streaming-only"))), s"got: $bex")
  }
}
