package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.icelite.{IceCatalog, MetaIo}

/** Delta manifest chains (round 14): a commit's manifest document stores
  * only the CHANGE in the file list against its predecessor's manifest
  * (write-time-verified replay), so commit metadata IO is O(change) rather
  * than O(total files) — at a million files, appending one no longer
  * rewrites ~1 GB of FileStat JSON per snapshot. Chains cap at
  * `manifest.chain-cap` (auto-rebase), `CALL system.rewrite_manifests`
  * collapses eagerly, expiry keeps reachable bases alive, and orphan GC
  * sweeps dead ones.
  */
class ManifestChainSpec extends SparkSpec {

  private def hfs(wh: String) =
    new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("append commits write delta manifests whose replay is exact") {
    import spark.implicits._
    val wh = scratch("mchain1")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.repartition(2))                                     // snap 1
    tbl.append((101L to 140L).map(i => (i, "b")).toDF("id", "v")
      .repartition(2))                                                // snap 2
    tbl.append((141L to 150L).map(i => (i, "c")).toDF("id", "v")
      .repartition(1))                                                // snap 3
    val snaps = tbl.snapshots.sortBy(_.snapshotId)
    val raw = snaps.map(s => MetaIo.readManifestDocShallow(fs, s.manifestFile))
    // first commit has no base; later appends chain and carry ONLY their
    // own added FileStats — the O(change) commit-IO claim, asserted on the
    // as-written documents
    assert(raw(0).base.isEmpty && raw(0).chainLen == 0)
    assert(raw(1).base == snaps(0).manifestFile && raw(1).chainLen == 1)
    assert(raw(2).base == snaps(1).manifestFile && raw(2).chainLen == 2)
    assert(raw(1).files.length == 2 && raw(1).removedPaths.isEmpty)
    assert(raw(2).files.length == 1 && raw(2).removedPaths.isEmpty)
    // per-snapshot facts stay complete in every delta document (bounded
    // incremental readers never resolve chains for them)
    assert(raw(2).addedPaths.length == 1 && raw(2).dataDirs.length == 3)
    // resolution reproduces the full visible list
    val resolved = MetaIo.readManifestDoc(fs, snaps(2).manifestFile)
    assert(resolved.files.length == 5 && resolved.removedPaths.isEmpty)
    assert(resolved.files.map(_.path) ==
      raw(0).files.map(_.path) ++ raw(1).files.map(_.path) ++
        raw(2).files.map(_.path))
    assert(tbl.toDF.count() == 150)
    // time travel into the chain interior resolves that snapshot's prefix
    assert(tbl.scan(snapshotId = Some(snaps(1).snapshotId)).count() == 140)
    // stats survive the chain: a point filter still plans from manifests
    assert(tbl.toDF.where(col("id") === 142L).count() == 1)
  }

  test("deep-chain resolution caches only the requested head; entry cap bounds memory") {
    import spark.implicits._
    val wh = scratch("mchain-cache")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    (1 to 8).foreach(i =>
      tbl.append(df.filter(col("id") % 8 === i % 8).repartition(1)))
    val snaps = tbl.snapshots.sortBy(_.snapshotId)
    assert(MetaIo.readManifestDocShallow(fs, snaps.last.manifestFile).chainLen == 7)

    // one full resolution of the head must cache ONE resolved document —
    // the head's — not one per hop (a 32-hop chain over a large table
    // would otherwise pin O(chain x files) seq overhead in the LRU)
    MetaIo.manifestCacheClear()
    MetaIo.readManifestDoc(fs, snaps.last.manifestFile)
    assert(MetaIo.manifestCacheKeys == Seq(snaps.last.manifestFile),
      s"resolved-cache should hold only the requested head, got ${MetaIo.manifestCacheKeys}")
    assert(MetaIo.manifestCacheEntryTotal == 8,
      s"entry accounting off: ${MetaIo.manifestCacheEntryTotal}")
    // an interior snapshot resolves (and caches) on ITS OWN request
    MetaIo.readManifestDoc(fs, snaps(3).manifestFile)
    assert(MetaIo.manifestCacheKeys.toSet ==
      Set(snaps.last.manifestFile, snaps(3).manifestFile))

    // the entry-weighted cap evicts eldest resolutions (but never the one
    // being returned): capping at 10 entries fits the 8-file head or the
    // 4-file interior, not both
    val prevCap = MetaIo.manifestCacheEntryCap
    try {
      MetaIo.manifestCacheEntryCap = 10
      MetaIo.manifestCacheClear()
      MetaIo.readManifestDoc(fs, snaps(3).manifestFile) // 4 entries
      MetaIo.readManifestDoc(fs, snaps.last.manifestFile) // +8 > 10: evict eldest
      assert(MetaIo.manifestCacheKeys == Seq(snaps.last.manifestFile),
        s"eldest resolution must evict under the entry cap, got ${MetaIo.manifestCacheKeys}")
      assert(MetaIo.manifestCacheEntryTotal == 8)
      // a single resolution larger than the cap still serves (and stays,
      // as the newest entry — the cache never evicts what it returns)
      MetaIo.manifestCacheEntryCap = 2
      MetaIo.manifestCacheClear()
      val doc = MetaIo.readManifestDoc(fs, snaps.last.manifestFile)
      assert(doc.files.length == 8 &&
        MetaIo.manifestCacheKeys == Seq(snaps.last.manifestFile))
    } finally {
      MetaIo.manifestCacheEntryCap = prevCap
      MetaIo.manifestCacheClear()
    }
    // behavior unchanged: contents and time travel still exact
    assert(tbl.toDF.count() == 40)
    assert(tbl.scan(snapshotId = Some(snaps(3).snapshotId)).count() == 20)
  }

  test("commit IO is O(change): a 1-file append writes a small delta doc") {
    import spark.implicits._
    val wh = scratch("mchain-io")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 6000L).map(i => (i, s"v$i", i % 97)).toDF("id", "v", "k")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.repartition(60)) // 60-file table, full manifest
    tbl.append(df.limit(10).repartition(1)) // +1 file, delta manifest
    val Seq(s0, s1) = tbl.snapshots.sortBy(_.snapshotId).map(_.manifestFile)
    val full = fs.getFileStatus(new Path(s0)).getLen
    val delta = fs.getFileStatus(new Path(s1)).getLen
    assert(delta * 10 < full,
      s"appending 1 file to a 60-file table wrote $delta bytes of manifest " +
        s"against a $full-byte full document — commit IO is not O(change)")
    assert(tbl.toDF.count() == 6010)
  }

  test("rewrites rebase to full documents; chain cap bounds depth") {
    import spark.implicits._
    val wh = scratch("mchain2")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 40L).map(i => (i, i % 5)).toDF("id", "k")
    val tbl = cat.createTable("lake", "t", df.schema,
      properties = Map("manifest.chain-cap" -> "2"))
    (0 until 5).foreach { b =>
      tbl.append(df.withColumn("id", col("id") + lit(b * 100L)).repartition(1))
    }
    val chainLens = tbl.snapshots.sortBy(_.snapshotId)
      .map(s => MetaIo.readManifestDocShallow(fs, s.manifestFile).chainLen)
    // cap 2: depth never reaches 2, rebases alternate with deltas
    assert(chainLens == Seq(0, 1, 0, 1, 0), s"got $chainLens")
    assert(tbl.toDF.count() == 200)
    // compaction replaces every file: the delta is worthless, the document
    // goes full — the organic rebase
    tbl.compact(targetFiles = 1)
    val compactDoc = MetaIo.readManifestDocShallow(
      fs, tbl.meta.currentSnapshot.get.manifestFile)
    assert(compactDoc.base.isEmpty && compactDoc.chainLen == 0)
    assert(tbl.toDF.count() == 200)
  }

  test("chain-cap 0 disables deltas entirely") {
    import spark.implicits._
    val wh = scratch("mchain0")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 10L).map(i => (i, "x")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema,
      properties = Map("manifest.chain-cap" -> "0"))
    tbl.append(df); tbl.append(df); tbl.append(df)
    val raws = tbl.snapshots
      .map(s => MetaIo.readManifestDocShallow(fs, s.manifestFile))
    assert(raws.forall(d => d.base.isEmpty && d.chainLen == 0))
    assert(raws.last.files.length ==
      raws.map(_.addedPaths.length).sum)
    // malformed cap refuses at DDL
    intercept[IllegalArgumentException](cat.createTable("lake", "t2",
      df.schema, properties = Map("manifest.chain-cap" -> "-1")))
  }

  test("CALL system.rewrite_manifests collapses the chain; no-op when full") {
    import spark.implicits._
    val wh = scratch("mchain3")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 30L).map(i => (i, s"r$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.repartition(2)); tbl.append(df.repartition(1))
    tbl.append(df.repartition(1))
    spark.conf.set("spark.sql.catalog.ice_mch", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_mch.warehouse", wh)
    val r = spark.sql("CALL ice_mch.system.rewrite_manifests('lake.t')")
      .collect()(0)
    assert(r.getInt(1) == 2, s"expected chain of 2 collapsed, got $r")
    val cur = cat.loadTable("lake", "t")
    val doc = MetaIo.readManifestDocShallow(
      fs, cur.meta.currentSnapshot.get.manifestFile)
    assert(doc.base.isEmpty && doc.chainLen == 0 && doc.files.length == 4)
    assert(cur.toDF.count() == 90)
    // already full: second call commits nothing
    val vBefore = cur.meta.version
    spark.sql("CALL ice_mch.system.rewrite_manifests('lake.t')")
    assert(cat.loadTable("lake", "t").meta.version == vBefore)
    // the .manifests metadata table surfaces the depth (0 after rebase)
    val mrows = spark.sql(
      "SELECT snapshot_id, chain_len FROM ice_mch.lake.t.manifests")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mrows(cur.meta.currentSnapshotId) == 0)
    assert(mrows.values.exists(_ > 0), "older snapshots still report chains")
    // the next append chains off the rebased document
    val rebased = cat.loadTable("lake", "t").meta.currentSnapshot.get.manifestFile
    cur.append(df.repartition(1))
    val next = MetaIo.readManifestDocShallow(
      fs, cat.loadTable("lake", "t").meta.currentSnapshot.get.manifestFile)
    assert(next.chainLen == 1 && next.base == rebased)
  }

  test("expiry keeps chain bases alive; orphan GC sweeps dead manifests") {
    import spark.implicits._
    val wh = scratch("mchain4")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 20L).map(i => (i, s"e$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    (0 until 4).foreach(_ => tbl.append(df.repartition(1)))
    val allManifests = tbl.snapshots.map(_.manifestFile)
    tbl.expireSnapshots(keepLast = 2)
    val kept = cat.loadTable("lake", "t")
    assert(kept.snapshots.length == 2)
    // the kept snapshots' chains resolve through EXPIRED snapshots'
    // manifests — expiry must have left every reachable one on disk
    val reachable = kept.snapshots
      .flatMap(s => MetaIo.manifestChain(fs, s.manifestFile)).toSet
    assert(reachable.size == 4, "fixture must actually chain through history")
    reachable.foreach(p => assert(fs.exists(new Path(p)),
      s"expiry deleted a reachable chain base: $p"))
    assert(kept.toDF.count() == 80)
    // collapse the chain, then GC: the now-unreachable chain documents are
    // orphan-swept (age gate forced to 0 for the test), the live one stays
    kept.rewriteManifests()
    val live = cat.loadTable("lake", "t")
    val liveManifest = live.meta.currentSnapshot.get.manifestFile
    // reachability spans EVERY live snapshot's chain — the non-current kept
    // snapshot still resolves through expired predecessors' manifests
    val liveReach = live.snapshots.filter(_.manifestFile.nonEmpty)
      .flatMap(s => MetaIo.manifestChain(fs, s.manifestFile)).toSet
    val sweptPaths = live.removeOrphanFiles(graceMs = 0L)
    val sweptManifests = sweptPaths.filter(_.contains("manifest-"))
    // the rebase detached exactly the current snapshot's old delta head
    assert(sweptManifests.nonEmpty, "dead chain documents must be swept")
    assert(fs.exists(new Path(liveManifest)))
    liveReach.foreach(p => assert(fs.exists(new Path(p)),
      s"GC deleted a reachable manifest: $p"))
    allManifests.filterNot(liveReach)
      .foreach(m => assert(!fs.exists(new Path(m)), s"dead manifest kept: $m"))
    assert(live.toDF.count() == 80)
  }

  test(".all_files lists every added file under its committing snapshot") {
    import spark.implicits._
    val wh = scratch("mchain-af")
    val cat = new IceCatalog(spark, wh)
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.repartition(2))
    tbl.append(df.repartition(1)) // delta document
    tbl.compact(1)                // rewrite: snaps 1-2's files leave the table
    spark.conf.set("spark.sql.catalog.ice_af", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_af.warehouse", wh)
    val rows = spark.sql(
      "SELECT snapshot_id, path, rows FROM ice_af.lake.t.all_files").collect()
    // 2 + 1 + 1 files ever added — rewritten-away files still appear under
    // the snapshot that introduced them (the lineage view), with real
    // stats resolved through the delta chain
    assert(rows.length == 4, s"got ${rows.toSeq}")
    val byId = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byId == Map(1L -> 2, 2L -> 1, 3L -> 1), s"got $byId")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("write.metadata.previous-versions-max trims the version log") {
    import spark.implicits._
    val wh = scratch("mchain-vmax")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = Seq((1L, "x")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema,
      properties = Map("write.metadata.previous-versions-max" -> "3"))
    (1 to 10).foreach(_ => tbl.append(df))
    val metaDir = new Path(cat.tablePath("lake", "t"), "metadata")
    def vNums = fs.listStatus(metaDir).map(_.getPath.getName)
      .filter(_.matches("v\\d+\\.json")).map(_.drop(1).dropRight(5).toInt)
    val curV = tbl.meta.version
    assert(vNums.min >= curV - 3 && vNums.max == curV,
      s"expected only the last 3 previous versions, got ${vNums.sorted.toSeq}")
    // reads, time travel, and rollback are untouched — snapshots live in
    // the CURRENT version document, not the trimmed history
    assert(tbl.toDF.count() == 10)
    val oldest = tbl.snapshots.map(_.snapshotId).min
    assert(tbl.scan(snapshotId = Some(oldest)).count() == 1)
    tbl.rollbackTo(oldest + 1)
    assert(cat.loadTable("lake", "t").toDF.count() == 2)
    // the zero-byte claim ledger survives (stale stragglers stay locked out)
    assert(fs.listStatus(metaDir).exists(_.getPath.getName.endsWith(".claim")))
    // .metadata_log_entries serves exactly the RETAINED versions (trimmed
    // history simply isn't listed), newest last, with the rollback's moved
    // pointer visible in latest_snapshot_id
    spark.conf.set("spark.sql.catalog.ice_vmax", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_vmax.warehouse", wh)
    val log = spark.sql(
      "SELECT version, latest_snapshot_id FROM ice_vmax.lake.t.metadata_log_entries ORDER BY version")
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val curV2 = cat.loadTable("lake", "t").meta.version
    assert(log.map(_._1).toSeq == vNums.sorted.toSeq,
      s"log must list exactly the retained version files, got ${log.toSeq}")
    assert(log.last == ((curV2, oldest + 1)),
      s"newest log entry must carry the rolled-back pointer, got ${log.last}")
    // malformed values refuse at DDL — including 0, which would let a
    // commit delete the version a reader racing the hint swap just read
    intercept[IllegalArgumentException](cat.createTable("lake", "t2", df.schema,
      properties = Map("write.metadata.previous-versions-max" -> "x")))
    intercept[IllegalArgumentException](cat.createTable("lake", "t3", df.schema,
      properties = Map("write.metadata.previous-versions-max" -> "0")))
  }

  test("time-based expiry drops by age; refs and the newest floor survive") {
    import spark.implicits._
    val wh = scratch("mchain-exts")
    val cat = new IceCatalog(spark, wh)
    val one = Seq((1L, "x")).toDF("id", "v").coalesce(1)
    val tbl = cat.createTable("lake", "t", one.schema)
    (1 to 4).foreach { _ => tbl.append(one); Thread.sleep(5) }
    val snaps = tbl.snapshots.sortBy(_.snapshotId)
    tbl.tag("pinned", snaps(1).snapshotId)
    // cutoff at snapshot 3's commit time: 1 drops (older, untagged),
    // 2 survives only via its tag, 3-4 are within the window
    tbl.expireSnapshotsOlderThan(snaps(2).timestampMs)
    val kept = cat.loadTable("lake", "t").snapshots.map(_.snapshotId).toSet
    assert(kept == Set(snaps(1).snapshotId, snaps(2).snapshotId,
      snaps(3).snapshotId), s"got $kept")
    assert(tbl.toDF.count() == 4)
    // far-future cutoff: the retain-newest floor + refs hold — a dormant
    // table never expires itself empty
    spark.conf.set("spark.sql.catalog.ice_exts", "graft.sources.v2.IceLiteCatalog")
    spark.conf.set("spark.sql.catalog.ice_exts.warehouse", wh)
    val r = spark.sql("CALL ice_exts.system.expire_snapshots('lake.t', " +
      s"older_than_ms => ${System.currentTimeMillis() + 1000000L})").collect()(0)
    assert(r.getInt(2) == 2, s"got $r")
    val kept2 = cat.loadTable("lake", "t").snapshots.map(_.snapshotId).toSet
    assert(kept2 == Set(snaps(1).snapshotId, snaps(3).snapshotId), s"got $kept2")
    assert(tbl.toDF.count() == 4)
  }

  test("MOR deletes and upserts ride the chain correctly") {
    import spark.implicits._
    val wh = scratch("mchain5")
    val cat = new IceCatalog(spark, wh)
    val fs = hfs(wh)
    val df = (1L to 50L).map(i => (i, s"m$i")).toDF("id", "v")
    val tbl = cat.createTable("lake", "t", df.schema)
    tbl.append(df.repartition(2))
    tbl.append((51L to 60L).map(i => (i, "n")).toDF("id", "v").repartition(1))
    // MOR upsert: adds a data file + delete file, data files unchanged →
    // delta document with a small added list and the FULL delete list
    tbl.upsertMorEq((1L to 3L).map(i => (i, "UP")).toDF("id", "v"), Seq("id"))
    val snap = tbl.meta.currentSnapshot.get
    val raw = MetaIo.readManifestDocShallow(fs, snap.manifestFile)
    assert(raw.base.nonEmpty, "MOR upsert should delta against its parent")
    assert(raw.deletes.nonEmpty, "delete list must be complete in the delta doc")
    assert(raw.deletes == MetaIo.readManifestDoc(fs, snap.manifestFile).deletes)
    val out = tbl.toDF.collect()
    assert(out.length == 60 &&
      out.count(_.getString(1) == "UP") == 3)
    // COW upsert rewrites a touched file: replaced entry = remove + re-add
    tbl.upsert((4L to 5L).map(i => (i, "CW")).toDF("id", "v"), Seq("id"))
    val raw2 = MetaIo.readManifestDocShallow(
      fs, tbl.meta.currentSnapshot.get.manifestFile)
    if (raw2.base.nonEmpty)
      assert(raw2.removedPaths.nonEmpty, "a rewrite that deltas must remove")
    val out2 = tbl.toDF.collect()
    assert(out2.length == 60 && out2.count(_.getString(1) == "CW") == 2)
  }
}
