package graft

import org.apache.spark.sql.functions._

import graft.icelite.IceCatalog

/** Randomized interleaving guard for the delta-manifest machinery: chains
  * only ever change the REPRESENTATION of a snapshot's file list, so under
  * ANY sequence of table operations, at ANY chain cap, the table must
  * serve exactly what an in-memory model says — current content after
  * every op, and retained-snapshot time travel against the recorded
  * history. This is where chain bugs would hide: a rollback chaining onto
  * the wrong base, an expiry deleting a base a later delta still needs, a
  * rebase racing a MOR delete list. Seeded, so failures replay.
  */
class ManifestChainPropSpec extends SparkSpec {

  test("random op sequences at random chain caps always match the model") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    var nextId = 1L

    (0 until 8).foreach { trial =>
      val cap = Seq(0, 2, 3, 32)(rnd.nextInt(4))
      val wh = scratch(s"mchprop-$trial-cap$cap")
      val cat = new IceCatalog(spark, wh)
      val schema = Seq((1L, "x")).toDF("id", "v").schema
      val tbl = cat.createTable("lake", "t", schema,
        properties = Map("manifest.chain-cap" -> cap.toString))

      var model = Map.empty[Long, String]
      // snapshotId -> expected content at that snapshot (for time travel)
      var history = Map.empty[Long, Map[Long, String]]

      def df(m: Map[Long, String]) = m.toSeq.toDF("id", "v")
      def record(): Unit = {
        val id = tbl.meta.currentSnapshotId
        if (id != 0L) history += id -> model
      }
      def checkCurrent(opName: String): Unit = {
        val got = tbl.toDF.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == model,
          s"trial $trial cap $cap after $opName: got ${got.size} rows, " +
            s"expected ${model.size}; diff=${(got.toSet diff model.toSet).take(5)}")
      }

      (0 until 9).foreach { step =>
        val op = rnd.nextInt(8)
        val opName = op match {
          case 0 | 1 => // append fresh rows (the common op, weighted)
            val rows = (0 until (1 + rnd.nextInt(4))).map { _ =>
              val id = nextId; nextId += 1; id -> s"a$id"
            }.toMap
            tbl.append(df(rows).repartition(1 + rnd.nextInt(2)))
            model ++= rows; record()
            "append"
          case 2 => // COW upsert: touch some existing + some new keys
            val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            val fresh = { val id = nextId; nextId += 1; Seq(id) }
            val up = (existing ++ fresh).map(id => id -> s"u$id").toMap
            tbl.upsert(df(up), Seq("id"))
            model ++= up; record()
            "upsert-cow"
          case 3 => // MOR eq upsert
            val existing = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(2))
            val up = existing.map(id => id -> s"m$id").toMap
            if (up.nonEmpty) { tbl.upsertMorEq(df(up), Seq("id")); model ++= up; record() }
            "upsert-mor"
          case 4 =>
            if (model.nonEmpty) { tbl.compact(1 + rnd.nextInt(2)); record() }
            "compact"
          case 5 =>
            val keep = 1 + rnd.nextInt(3)
            val before = tbl.snapshots.map(_.snapshotId).toSet
            tbl.expireSnapshots(keep)
            val kept = tbl.snapshots.map(_.snapshotId).toSet
            history = history.filter { case (id, _) => kept(id) }
            assert(kept.subsetOf(before))
            "expire"
          case 6 =>
            tbl.rewriteManifests(); "rewrite_manifests"
          case 7 =>
            val retained = tbl.snapshots.map(_.snapshotId)
            if (retained.length > 1 && rnd.nextBoolean()) {
              val target = retained(rnd.nextInt(retained.length))
              if (history.contains(target) &&
                  target != tbl.meta.currentSnapshotId) {
                tbl.rollbackTo(target)
                model = history(target)
              }
              "rollback"
            } else { tbl.removeOrphanFiles(graceMs = 0L); "orphan-gc" }
        }
        checkCurrent(s"$opName (step $step)")
        // time travel to a random retained, history-known snapshot
        val candidates = tbl.snapshots.map(_.snapshotId).filter(history.contains)
        if (candidates.nonEmpty) {
          val sid = candidates(rnd.nextInt(candidates.length))
          val got = tbl.scan(snapshotId = Some(sid)).collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          assert(got == history(sid),
            s"trial $trial cap $cap: time travel to $sid diverged after $opName")
        }
      }
    }
  }
}
