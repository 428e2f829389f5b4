package graft

/** Smoke-level spec over every registered operator query: each one runs on
  * sf0.001 and yields a sane result. Value-level correctness is enforced by
  * the DuckDB oracle harness (tools/check_oracle.py + graft.Verify), which
  * compares exact values at sf0.01 — this spec guards compilation/runtime
  * health of the whole registry in `sbt test`.
  */
class QueriesSpec extends SparkSpec {

  // queries whose result can legitimately be empty at tiny scale
  private val mayBeEmpty = Set("j2_anti_join", "x4_dedup_ngram_jaccard",
    "x2_dedup_minhash_lsh", "x5_dedup_embedding",
    "x16_dedup_cluster", "x29_dedup_canonical") // empty exactly when x4's pair set is

  SparkEntry.allDefs.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.fn(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Fixture-drift guard: the driver regenerates /root/testdata between
  // rounds and has already flipped events.ts ns->us (round 6 broke six
  // queries at analysis). Assert, in ONE named place, that every base table
  // normalizes to the same schema at every scale factor and that `ts`
  // arrives as a zoned TimestampType (what unix_micros and streaming
  // watermarks require). If QUtil.t's normalization is removed or the
  // fixtures drift a type again, this fails with the table + dir named
  // instead of six scattered analysis errors.
  // sf dirs follow the sfDir convention; a missing scale factor on some
  // checkout skips its tests rather than erroring the whole suite
  private val sfRoot = new java.io.File(sfDir).getParent
  private val allSfDirs = Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"$sfRoot/$s")

  test("base tables normalize to a stable schema across all sf dirs") {
    val dirs = allSfDirs.filter(new java.io.File(_).isDirectory)
    assume(dirs.nonEmpty, s"no testdata sf dirs under $sfRoot")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (tbl <- tables) {
      val schemas = dirs.map(d => d -> graft.queries.QUtil.t(spark, d, tbl).schema)
      val (d0, s0) = schemas.head
      schemas.tail.foreach { case (d, s) =>
        assert(s == s0, s"$tbl schema drifts between $d0 and $d:\n  $s0\n  $s")
      }
      if (tbl == "events")
        assert(s0("ts").dataType == org.apache.spark.sql.types.TimestampType,
          s"events.ts must normalize to TimestampType, got ${s0("ts").dataType} " +
            "(QUtil.t normalization missing a fixture shape?)")
    }
  }

  // The six queries round 6 broke (e1/j6 + the four streaming aggregations)
  // must at least pass analysis on every sf dir — their fns are cheap to
  // *construct* (the stream runs only on action), so this is a fast,
  // per-scale-factor guard that the regenerated fixtures still analyze.
  for (name <- Seq("e1_sessionize", "j6_range_join"); d <- allSfDirs)
    test(s"$name analyzes on $d") {
      assume(new java.io.File(d).isDirectory, s"$d absent on this checkout")
      SparkEntry.queries(name)(spark, d).queryExecution.assertAnalyzed()
    }

  // EVERY query is oracle-gated — a3 carries its HLL error bound as a
  // column so even the sketch op hash-compares against DuckDB; x26b
  // regained an oracle in round 15 via the materialized-counts fixture;
  // x40 in round 16 via a recursive-CTE sequential replay over the
  // materialized merge table; and x38 (BPE training, the last hold-out)
  // in round 16 via a recursive CTE whose working table is the full
  // per-word segmentation state, replaying every merge iteration —
  // pair-count window, argmax broadcast, segmentation rewrite — in SQL.
  // TextBpeSpec additionally gates both BPE paths against an independent
  // reference implementation. This set stays as the documented mechanism
  // should a future operator genuinely lack a SQL-expressible oracle.
  private val rowsOnly = Set.empty[String]

  test("every query name has either an oracle or is documented rows-only") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == rowsOnly, s"undocumented rows-only checks: ${noOracle -- rowsOnly}")
  }

  // The capped candidate peek in x25 must agree with its distributed
  // fallback: candCap=0 forces every nonempty candidate set over the cap,
  // so the corpus verification runs through the left-semi join instead of
  // the driver In-list. Same rows either way.
  test("x25 candidate-cap fallback (semi-join path) matches the In-list path") {
    def run() = SparkEntry.queries("x25_dedup_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val inList = run()
    spark.conf.set("graft.x25.candCap", "0")
    try {
      val semi = run()
      assert(semi == inList,
        s"fallback diverges: only-in-semi=${semi -- inList} only-in-inlist=${inList -- semi}")
      assert(semi.nonEmpty, "fixture produced no incremental near-dup pairs")
    } finally spark.conf.unset("graft.x25.candCap")
  }

  // x42's shard count is a conf (`graft.x42.shards`, default 32, oracle in
  // compile-time lockstep with the default). At a NON-default count the
  // Spark plan must match an independent sequential reference: per-shard
  // doc_id-ordered prefix sums computed in plain driver Scala.
  test("x42 shard conf: non-default count matches a sequential reference") {
    import org.apache.spark.sql.functions._
    val docs = graft.queries.QUtil.t(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val shards = 7 // non-default, and not a divisor-friendly power of two
    val expect = base.groupBy(_._1 % shards).iterator.flatMap { case (shard, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, tk) =>
        cum += tk
        (id, shard, tk, (cum - tk) / 512, (cum - 1) / 512)
      }
    }.toSet
    spark.conf.set("graft.x42.shards", shards.toString)
    try {
      val got = SparkEntry.queries("x42_sequence_pack")(spark, sfDir)
        .collect()
        .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
          r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
          r.getAs[Number](4).longValue))
        .toSet
      assert(got == expect,
        s"shard=$shards packing diverges: only-in-spark=${(got -- expect).take(3)} " +
          s"only-in-reference=${(expect -- got).take(3)}")
      assert(got.exists(t => t._4 != t._5), "no doc straddles a cut — vacuous fixture")
    } finally spark.conf.unset("graft.x42.shards")
  }

  // x30's bigram-frequency broadcast is size-gated: cap=0 forces the
  // shuffled-join fallback. Same rows either way.
  test("x30 broadcast-cap fallback (shuffled join) matches the broadcast path") {
    def run() = SparkEntry.queries("x30_lm_familiarity")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val bcast = run()
    spark.conf.set("graft.x30.broadcastCap", "0")
    try {
      val shuffled = run()
      assert(shuffled == bcast,
        s"fallback diverges: only-in-shuffled=${shuffled -- bcast} " +
          s"only-in-bcast=${bcast -- shuffled}")
      assert(shuffled.nonEmpty, "fixture produced no familiarity rows")
    } finally spark.conf.unset("graft.x30.broadcastCap")
  }

  // x28's hot-set array broadcast is capped: hotCap=-1 selects the
  // join-based ordered rebuild (must match), and an over-cap hot set on
  // the fast path refuses loudly instead of shipping the broadcast.
  test("x28 hot-set cap: join fallback matches; over-cap run refuses") {
    def run() = SparkEntry.queries("x28_boilerplate_strip")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val bcast = run()
    spark.conf.set("graft.x28.hotCap", "-1")
    try {
      val joined = run()
      assert(joined == bcast,
        s"fallback diverges: only-in-join=${joined -- bcast} " +
          s"only-in-bcast=${bcast -- joined}")
      assert(joined.nonEmpty, "fixture produced no documents")
    } finally spark.conf.unset("graft.x28.hotCap")
    // the fixture's hot set is nonempty iff some chunk was removed; only
    // then can cap=0 prove the refusal fires
    val anyRemoved = bcast.exists(r => r(2).asInstanceOf[Int] > 0)
    if (anyRemoved) {
      spark.conf.set("graft.x28.hotCap", "0")
      try {
        val e = intercept[Exception](run())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("exceeds graft.x28.hotCap")),
          s"expected the documented refusal, got: $e")
      } finally spark.conf.unset("graft.x28.hotCap")
    }
  }

  test("x63 degenerate corpora: no query doc is empty; whitespace query doc fuses dense-only") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x63deg").toString
    // 8 one-hot "centroid" vectors (vec_id < 8 ARE the IVF codebook) plus
    // two near-duplicates of vector 0, so the dense probe of query 0 has
    // candidates in its own cell
    val vecs = (0 to 7).map(i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i) 1f else 0f), 0)) ++ Seq(
      (8L, Array(1f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f), 0),
      (9L, Array(1f, 0.2f, 0f, 0f, 0f, 0f, 0f, 0f), 0))
    vecs.toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def writeDocs(ids: Seq[(Long, String)]): Unit =
      ids.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // case 1: NO query doc (no doc_id % 499 == 0) — the oracle's qdoc CTE
    // is NULL, both rankings empty, zero rows (and no NPE)
    writeDocs((1L to 9L).map(i => (i, s"word$i common")))
    assert(SparkEntry.queries("x63_hybrid_rrf")(spark, dir).count() == 0,
      "no-query-doc corpus must fuse to zero rows")
    // case 2: the query doc exists but is WHITESPACE-ONLY — the lexical
    // list is empty and fusion degrades to the dense ranking alone
    writeDocs(Seq((0L, "   ")) ++ (1L to 9L).map(i => (i, s"word$i common")))
    val rows = SparkEntry.queries("x63_hybrid_rrf")(spark, dir)
      .orderBy("qid", "rank").collect()
    assert(rows.nonEmpty, "dense side must still rank")
    // one query doc (qid 0); schema: qid, doc_id, lex_rank, dense_rank,
    // rrf1e6, rank
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == 0L)
      assert(r.isNullAt(2), s"lexical rank must be absent: $r")
      assert(r.getInt(3) == i + 1, s"dense ranks must be 1..n in order: $r")
      assert(r.getLong(4) == 1000000L / (60 + i + 1),
        s"dense-only RRF score must be 1e6/(60+rank): $r")
      assert(r.getInt(5) == i + 1)
    }
    // near-duplicates of the query vector outrank the orthogonal cell-mate
    assert(Set(8L, 9L).contains(rows(0).getLong(1)),
      s"nearest neighbor should lead the dense ranking: ${rows.toSeq}")
    // case 3: the query doc has TERMS but no EMBEDDING — zero probes,
    // fusion degrades to the lexical ranking alone (the inverse of case 2)
    val dir3 = java.nio.file.Files.createTempDirectory("x63deg3").toString
    vecs.filter(_._1 != 0L).toDF("vec_id", "embedding", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir3/embeddings.parquet")
    (Seq((0L, "word1 common")) ++ (1L to 9L).map(i => (i, s"word$i common")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir3/documents.parquet")
    val rows3 = SparkEntry.queries("x63_hybrid_rrf")(spark, dir3)
      .orderBy("qid", "rank").collect()
    assert(rows3.nonEmpty, "lexical side must still rank")
    rows3.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == 0L)
      assert(r.getInt(2) == i + 1, s"lex ranks must be 1..n in order: $r")
      assert(r.isNullAt(3), s"dense rank must be absent: $r")
      assert(r.getLong(4) == 1000000L / (60 + i + 1),
        s"lex-only RRF score must be 1e6/(60+rank): $r")
    }
  }

  test("a3_hll_approx estimates within configured rsd of exact") {
    // the query itself now carries the bound as a column (oracle-gated:
    // DuckDB states exact + literal true); this spec re-asserts it locally
    val rows = SparkEntry.queries("a3_hll_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"HLL estimate out of tolerance for ${r.getAs[String]("event_type")}")
    }
  }

  test("x65 fusion contract: fused recall >= max(lex, dense) on the test corpus") {
    // a MEASURED property of this corpus, deliberately pinned here and
    // not inside the production query: RRF does not guarantee it on every
    // valid corpus (a lone dense-rank-10 hit can be displaced by ten
    // lex-only docs), but on the fixture corpora it holds and a fusion
    // weighting regression must fail the suite loudly
    val m = SparkEntry.queries("x65_hybrid_recall")(spark, sfDir).collect()
      .map(r => r.getString(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(m.keySet == Set("hy1_lex", "hy2_dense", "hy3_fused"),
      s"audit must always emit its three method rows: $m")
    val Seq(lex, dense, fused) =
      Seq("hy1_lex", "hy2_dense", "hy3_fused").map(m(_).getOrElse(0L))
    assert(fused >= math.max(lex, dense),
      s"fusion lost recall against an input system: $m")
    assert(dense > 0L, s"the dense leg must score on the test corpus: $m")
  }

  test("x66 funnel: budgets are exactly m per query, recall monotone") {
    // monotonicity is a theorem (superset + exact-top domination) and the
    // body `require`s it on every run; this pins the BUDGET arithmetic —
    // each refine arm reranks exactly m candidates per query on a corpus
    // with >= m+1 vectors — and the three-row contract
    val m = SparkEntry.queries("x66_sq8_refine")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(m.keySet == Set("m1_raw", "m2_refine5", "m3_refine10"),
      s"audit must always emit its three method rows: $m")
    val nq = m("m1_raw")._1
    assert(nq > 0, s"no query vectors on the test corpus: $m")
    assert(m("m1_raw")._2 == 0L, s"raw arm reranks nothing: $m")
    assert(m("m2_refine5")._2 == 5 * nq, s"refine5 budget != 5/query: $m")
    assert(m("m3_refine10")._2 == 10 * nq, s"refine10 budget != 10/query: $m")
    assert(m("m1_raw")._3 <= m("m2_refine5")._3 &&
      m("m2_refine5")._3 <= m("m3_refine10")._3,
      s"funnel recall not monotone: $m")
  }

  test("IVF rebuild: atomic centroid-drift replace, old index time-travelable") {
    // its OWN warehouse, never x53's shared fixture: the rebuild must not
    // poison the memoized index other queries probe
    val wh = scratch("ivf-rebuild")
    val cat = new graft.icelite.IceCatalog(spark, wh)
    graft.queries.SimilarityOps.createRetrievalIndexTables(cat)
    val idx = cat.loadTable("lake", "ivf_index")
    idx.append(graft.queries.SimilarityOps
      .ivfAssignAll(spark, sfDir, graft.queries.SimilarityOps.IvfDefaultCentroids))
    def state(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldId = idx.meta.currentSnapshotId
    val oldState = state(idx.toDF)
    assert(oldState.values.forall(_ < 8), "default codebook is vec_id 0..7")
    // the drifted codebook: vectors 8..15 — rebuild re-assigns everything
    // and commits ONE replace snapshot (atomicity = the commit count)
    graft.queries.SimilarityOps.rebuildIvfIndex(spark, wh, sfDir, 8L to 15L)
    val after = cat.loadTable("lake", "ivf_index")
    assert(after.snapshots.length == 2 &&
      after.snapshots.last.operation == "replace",
      s"rebuild must be exactly one atomic replace commit: " +
        s"${after.snapshots.map(_.operation)}")
    // zero stale reads: the post-commit table IS the independent recompute
    // against the new codebook — no old cell survives, no row is lost
    val newState = state(after.toDF)
    val expected = state(graft.queries.SimilarityOps
      .ivfAssignAll(spark, sfDir, 8L to 15L))
    assert(newState == expected,
      "post-rebuild index must equal a from-scratch assignment")
    assert(newState.keySet == oldState.keySet, "rebuild must not lose vectors")
    assert(newState.values.forall(c => c >= 8 && c < 16),
      "every cell must come from the new codebook")
    // the OLD index stays served for readers pinned before the commit:
    // its snapshot's immutable files are untouched (time travel reads the
    // exact pre-rebuild assignment)
    assert(state(after.scan(snapshotId = Some(oldId))) == oldState,
      "pre-rebuild snapshot must still serve the old assignment")
  }
}
