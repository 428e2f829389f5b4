package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QUtil._

/** Vector-similarity operators over the `embeddings` table
  * (`Array[Float]` column): brute-force cosine top-k, sign-LSH bucketed ANN,
  * and embedding-cosine near-dup detection.
  *
  * Exactness: elements are quantized to 20-bit fixed point before the
  * reduction — `floor(v * 2^20 + 0.5)` is bit-exact in IEEE doubles (a
  * power-of-two scale of a float is exact), so dot products and norms become
  * int64 sums: order-insensitive, overflow-safe (64 dims x (2^20)^2 << 2^63),
  * identical across engines and across any partitioning/shuffle order, and
  * faster than floating-point accumulation. Quantization error on the cosine
  * is ~1e-6 relative — irrelevant for ranking, and the ranking itself is
  * fully deterministic (tie-break on neighbor id).
  *
  * Scale design (100 TB): brute-force (x6) is O(queries x corpus) — the
  * correct baseline when the query set is small (it broadcasts the quantized
  * query vectors). The sign-LSH variant (x7) buckets vectors by the sign
  * pattern of leading dimensions, turning ANN into an equi-join on the bucket
  * key: cost tracks bucket occupancy and the key is hash-partitionable.
  * Near-dup (x5) blocks by label the same way an IVF coarse quantizer would.
  */
object SimilarityOps {

  // The one live persisted k-means assignment per session (x36): a lazily-
  // returned DataFrame has no unpersist point, so each new build releases
  // the previous one — same discipline as DedupOps.liveArrays.
  private val liveKmeans =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  // the one live persisted BM25 postings table per session (x54)
  private val livePost =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  // the live persisted x62 frames per session (exact ground truth + the
  // tagged candidate union), released together on the next build
  private val liveRecall =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Seq[DataFrame]]()

  // warehouses whose x61 df-delta fold-identity check already ran this JVM
  // (maintenance is exercised once per fixture, not charged to every probe)
  private val x61FoldDone =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // The one live persisted (elements, norms) pair per session (r19 opt
  // round, guide §2.4/§5): the multi-action audits (x62/x65/x66) and the
  // hybrid probe reference the `elements`/`norms` subtrees MANY times
  // across SEVERAL separate actions (fixture asserts, budget counts, the
  // final scoring plan). Within one action Spark's ReuseExchange dedupes
  // identical exchanges; across actions only a persist does — without it
  // every count/collect re-scans the parquet, re-explodes, and re-runs the
  // norm aggregate's shuffle. SINGLE-ACTION callers (x27) must NOT use
  // this: the one plan pays the cache build (materialize the exploded
  // elements + the norm shuffle into storage, read back through
  // InMemoryTableScan) and nothing ever reads it again — r19's driver
  // measured that as pure drag (VERDICT r19 #1/#3). Keyed by sfDir and
  // validated against BOTH handles' live cache state (`storageLevel`),
  // because both harnesses clearCache() between runs — a stale handle (or
  // an n2-only eviction) would silently recompute per reference.
  // Released on the next build (the liveArrays discipline).
  private val liveEls = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, (String, DataFrame, DataFrame)]()

  // Explicit, parameterized storage level for the corpus-sized caches
  // (r20, guide §5): QUtil.cacheLevel — DISK_ONLY at 100 TB, local
  // default MEMORY_AND_DISK keeps the bench comparable.
  private def cacheLevel(s: SparkSession)
      : org.apache.spark.storage.StorageLevel = QUtil.cacheLevel(s)

  private def cachedElements(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val none = org.apache.spark.storage.StorageLevel.NONE
    // compute(): exactly ONE pair is built and persisted per (session, dir)
    // even under concurrent builders — the old get-then-put raced, leaking
    // the losing thread's persisted pair until the next clearCache
    // (ADVICE r19)
    val cur = liveEls.compute(s, (_, prev) =>
      if (prev != null && prev._1 == dir &&
          prev._2.storageLevel != none && prev._3.storageLevel != none) prev
      else {
        if (prev != null) { prev._2.unpersist(false); prev._3.unpersist(false) }
        val el = elements(s, dir).persist(cacheLevel(s))
        (dir, el, norms(el).persist(cacheLevel(s)))
      })
    (cur._2, cur._3)
  }

  /** (vec_id, label, i, q): one row per vector element, 20-bit fixed point.
    *
    * The repartition is shingleArraysOf's fix applied to the vector side
    * (r20, found via ProfileRun): the embeddings fixture is ONE parquet
    * split, so without the exchange the posexplode+quantize — and, worse,
    * EVERY stage later fused onto an elements scan (cache materialization,
    * broadcast builds of the query side, map sides of the dot-product
    * joins) — ran as a SINGLE task; x66's two 0.8 s one-task broadcast
    * builds were exactly this. Shuffling the PACKED vectors (pre-explode,
    * 64x narrower than the element rows) spreads the expansion
    * cluster-wide; keying by vec_id makes the partitioning reusable by the
    * norms aggregate. On a real 100 TB corpus the scan already has
    * thousands of splits and AQE's coalesce right-sizes this exchange the
    * same way it does shingleArraysOf's.
    */
  private def elements(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("label"), posexplode(col("embedding")))
      .toDF("vec_id", "label", "p", "v0")
      .select(col("vec_id"), col("label"), (col("p") + 1).as("i"),
        quantize(col("v0")).as("q"))

  /** 20-bit fixed-point quantization; floor(x+0.5) = deterministic half-up. */
  private def quantize(v: Column): Column =
    floor(v.cast("double") * lit(1048576.0) + lit(0.5)).cast("long")

  /** Squared L2 norm (fixed-point) per vec_id. */
  private def norms(el: DataFrame): DataFrame =
    el.groupBy("vec_id").agg(sum(col("q") * col("q")).as("nn"))

  /** cosine from fixed-point dot product and norms — pure double ops on
    * identical int64 inputs, hence bit-identical across engines.
    */
  private def cosine(dp: Column, nna: Column, nnb: Column): Column =
    dp.cast("double") / sqrt(nna.cast("double") * nnb.cast("double"))

  private val elementsSql: String =
    """el AS (
      |  SELECT vec_id, label, CAST(i AS INT) i,
      |    CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT) q
      |  FROM embeddings, unnest(range(1, len(embedding)+1)) g(i)),
      |n2 AS (
      |  SELECT vec_id, CAST(SUM(q*q) AS BIGINT) nn FROM el GROUP BY vec_id)""".stripMargin

  private val cosineSql: String =
    "CAST(dp AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))"

  /** Row-local argmin assignment against a k x d centroid literal in
    * micro-quantized integer space (zero shuffle; the parallel cids array
    * maps fold position back to a cluster id, which need not be
    * contiguous) — the Lloyd-iteration kernel shared by x36 (k-means) and
    * x41 (SemDeDup's clustering stage).
    */
  private def assignToCentroids(df: DataFrame,
      cents: Seq[(Long, Seq[Long])], dcol: String): DataFrame =
    df.withColumn("cents",
        array(cents.map(c => array(c._2.map(lit): _*)): _*))
      .withColumn("cids", array(cents.map(c => lit(c._1)): _*))
      .withColumn("best", expr(
        """aggregate(
          |  transform(sequence(0, size(cents) - 1),
          |    i -> named_struct(
          |      'd', aggregate(zip_with(q, cents[i],
          |             (a, b) -> (a - b) * (a - b)), 0L, (s2, v) -> s2 + v),
          |      'i', i)),
          |  named_struct('d', 9223372036854775807L, 'i', -1),
          |  (acc, x) -> IF(x.d < acc.d, x, acc))""".stripMargin))
      .withColumn("cid", expr("cids[best.i]"))
      .withColumn(dcol, col("best.d"))
      .drop("cents", "cids", "best")

  /** x53's default probe width — embedded into BOTH the Spark plan and the
    * DuckDB oracle string at compile time so they cannot drift AT THE
    * DEFAULT; the `graft.x53.nprobe` conf overrides the Spark side for
    * deployments and specs (more cells probed = more recall, cost tracks
    * nprobe x occupancy). The oracle string is only valid at the default:
    * a session that overrides the conf and then runs Verify gets an
    * honest row mismatch (the plan probed more/fewer cells than the
    * oracle restates) — unset the conf for oracle comparison, as the
    * PlanSpec non-default case does.
    */
  private[graft] final val X53DefaultNprobe = 2

  /** x61's term-bucket count (64): the index partition key. Spark's
    * Murmur3 `hash` is fixed-seed and stable across runs/versions, so the
    * index writer and every later delta batch bucket identically — the
    * oracle never needs it (bucketing moves rows between partitions, not
    * between scores).
    */
  private final val X61Buckets = 64

  /** The ONE term→bucket function (index build and query probe both use
    * it, so a probe can never look in the wrong partition).
    */
  private def x61Bucket(w: Column): Column =
    pmod(hash(w), lit(X61Buckets)).cast("int")

  /** 10^6 micro-quantization of the embedding column (x36/x41's exact
    * integer clustering space — distinct from the 2^20 cosine space).
    */
  private def microQ: Column =
    expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) " +
      "* 1000000.0D + 0.5D) AS BIGINT))")

  /** Whitespace tokenization of the documents table — (doc_id, w), one row
    * per token occurrence, empty tokens dropped. The ONE tokenizer of the
    * lexical-retrieval operators (x54 recompute, x61 index build AND its
    * query side), so index-time and query-time terms cannot drift.
    */
  private def tokensOf(docs: DataFrame): DataFrame =
    // repartition before the explode (the shingleArraysOf fix, r20): the
    // documents fixture is ONE parquet split, so the tokenize+explode AND
    // the posting aggregate's map side fused onto it ran as a single task
    // (x54's whole partial-aggregation stage was serial). Keyed by doc_id;
    // at scale the scan has real splits and AQE right-sizes the exchange.
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)

  /** The integer-exact BM25 per-term contribution (the x43 discipline —
    * never sum engine-ordered doubles): idf and tf-saturation as 1e6
    * fixed-point rationals with truncating division, k1=1.2 b=0.75 as
    * exact fractions. Input columns: df, tf, len; `dD`/`sS` are the corpus
    * doc count and total token count. ONE definition for x54 (per-run
    * recompute) and x61 (persisted index probe) — the scoring cannot
    * drift between the two serving paths.
    *
    * The int64 headroom argument has THREE factors, and each fails loudly
    * instead of wrapping (Spark Long wraps silently; DuckDB raises — the
    * guard keeps the engines' failure modes aligned):
    *  - corpus doc count: [[bm25Guard]] bounds dD < 4e6 driver-side;
    *  - tf: `tf * 2.2e12` wraps past tf ~ 4.19e6 — guarded ROW-LOCALLY
    *    (a single pathological document can carry such a tf at any
    *    corpus size);
    *  - len*dD: `7.5e5 * len * dD` wraps past len*dD ~ 1.23e13 — guarded
    *    row-locally with the actual dD.
    */
  private def bm25TermScore(dD: Long, sS: Long): Column =
    expr(s"""IF(tf <= 4000000L AND len * ${dD}L <= 12000000000000L,
            |  (((${dD}L - df + 1L) * 1000000L) DIV (df + 1L)
            |   * ((tf * 2200000L * 1000000L)
            |      DIV (tf * 1000000L
            |           + (1200000L * (250000L + (750000L * len * ${dD}L) DIV ${sS}L))
            |             DIV 1000000L))) DIV 1000000L,
            |  raise_error(concat('bm25: tf=', CAST(tf AS STRING),
            |    ' len=', CAST(len AS STRING),
            |    ' overflows the 1e6 fixed-point int64 budget at d=$dD',
            |    ' — rescale idf to 1e3 in BOTH engines for this corpus')))"""
      .stripMargin)

  /** int64 headroom check for [[bm25TermScore]], enforced LOUDLY: the
    * per-term contribution multiplies idf_1e6 (<= d*1e6) by the saturation
    * term (<= 2.2e6) before the final DIV, so past ~4e6 docs Spark's Long
    * would wrap SILENTLY (wrong ranks) while DuckDB's BIGINT raises —
    * refuse with the remedy instead of diverging from the bit-identical
    * guarantee.
    */
  private def bm25Guard(dD: Long, who: String): Unit =
    require(dD < 4000000L,
      s"$who: the 1e6 fixed-point BM25 scoring overflows int64 past " +
        s"~4e6 documents (corpus has $dD) — rescale idf to 1e3 in BOTH " +
        "the Spark expression and the oracle before running at this size")

  /** The shared DuckDB spelling of the BM25 corpus derivation (tokenize →
    * postings → lengths → corpus scalars → document frequencies) — x54 and
    * x61 both open with it, so their oracles restate identical quantities.
    */
  private val bm25BaseSql: String =
    """tok AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents),
      |tok2 AS (SELECT doc_id, w FROM tok WHERE len(w) > 0),
      |post AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) tf
      |  FROM tok2 GROUP BY doc_id, w),
      |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) len FROM tok2 GROUP BY doc_id),
      |corp AS (
      |  SELECT CAST(count(*) AS BIGINT) d, CAST(sum(len) AS BIGINT) s
      |  FROM lens),
      |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) df FROM post GROUP BY w)""".stripMargin

  /** The shared DuckDB spelling of [[bm25TermScore]]. */
  private val bm25TermScoreSql: String =
    """(((corp.d - f.df + 1) * 1000000) // (f.df + 1)
      |  * ((h.tf * 2200000 * 1000000)
      |     // (h.tf * 1000000
      |        + (1200000 * (250000 + (750000 * h.len * corp.d) // corp.s))
      |          // 1000000))) // 1000000""".stripMargin

  // -- shared ANN machinery (x6/x7/x7b/x27 computed, x53 persisted, x62
  // recall audit) — ONE spelling of the centroid rule, the probe rule, and
  // the exact fixed-point top-k, so the serving paths cannot drift --------

  /** Per-qid top-k of a (qid, nid, cos_sim) scored frame via the typed
    * TopKAggregator — NOT a window: a per-qid window is a one-task sort of
    * that query's entire candidate set (for IVF, nprobe × cell occupancy —
    * a hot cell at 100 TB is the dense twin of the stop-word shape x54/x61
    * killed in r18), while the partial/final object-hash aggregate moves k
    * (score, nid) pairs per partition per qid over the shuffle and never
    * sorts a group. Ordering (cos_sim desc, nid asc) is the aggregator's
    * own total order, identical to the oracles' row_number spelling.
    * Output: (qid, nid, cos_sim, rn) — rn in rank order, 1-based Int.
    *
    * Cost honesty at toy scale (the x64 discipline): on the skewless sf0.1
    * corpus the IVF candidate groups are bounded (nprobe x occupancy ~
    * hundreds of rows), so the typed aggregator's fixed object-hash stage
    * reads as overhead vs the codegen'd window it replaced — measured raw
    * +0.2..0.4s per probe query (x27 0.81 -> 1.26s, x53 0.84 -> 1.05s,
    * x63 2.77 -> 3.18s; brute-force paths moved inside noise). That cost
    * is FLAT in corpus size; the window's was a one-task sort of a group
    * that a hot IVF cell makes occupancy-sized — the shape that dies
    * first at 100 TB.
    */
  private[graft] def denseTopK(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val topk = new graft.functions.TopKAggregator(k).toColumn
    scored.select(col("qid"), col("cos_sim"), col("nid"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((cs, nid), i) => (qid, nid, cs, i + 1) }
      }
      .toDF("qid", "nid", "cos_sim", "rn")
  }

  /** Exact fixed-point top-k tail over a (qid, nid, dp) dot-product frame:
    * cosine from the norms, rank per query (DESC cosine, tie-break nid),
    * keep rn <= k — ranking rides [[denseTopK]]'s bounded aggregator.
    * Output: (qid, nid, cos_sim, rn).
    */
  private def rankTopK(dots: DataFrame, n2: DataFrame, k: Int): DataFrame =
    denseTopK(
      dots
        // no explicit broadcast of n2 (r19 opt round, guide §3.1): the
        // norms table is one row per CORPUS vector — known-small is
        // exactly what it is not at 100 TB, and the forced broadcast is
        // the driver-OOM shape. Locally AQE still converts both joins to
        // runtime broadcasts from the actual (tiny) sizes.
        .join(n2.as("na"), col("qid") === col("na.vec_id"))
        .join(n2.as("nb"), col("nid") === col("nb.vec_id"))
        .select(col("qid"), col("nid"),
          cosine(col("dp"), col("na.nn"), col("nb.nn")).as("cos_sim")),
      k)

  /** Exact fixed-point top-k over a (qid, nid) CANDIDATE set: dot products
    * for the candidate pairs only, then [[rankTopK]] — the scoring tail
    * every bucketed/probed ANN variant shares.
    */
  private def exactTopK(el: DataFrame, n2: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val dots = cand
      .join(el.as("a"), col("a.vec_id") === col("qid"))
      .join(el.as("b"),
        col("b.vec_id") === col("nid") && col("b.i") === col("a.i"))
      .groupBy("qid", "nid")
      .agg(sum(col("a.q") * col("b.q")).as("dp"))
    rankTopK(dots, n2, k)
  }

  /** The default IVF codebook: the 8 lowest vec_ids — a fixed,
    * engine-independent stand-in for the k-means centroids an offline job
    * would train at scale (see x27's header). [[rebuildIvfIndex]] swaps
    * in a different id set when the codebook drifts.
    */
  private[graft] final val IvfDefaultCentroids: Seq[Long] = 0L to 7L

  /** The IVF centroid table: the given vectors' elements. */
  private def ivfCentroids(el: DataFrame, cids: Seq[Long]): DataFrame =
    el.filter(col("vec_id").isin(cids.map(Long.box): _*))
      .select(col("vec_id").as("cid"), col("i"), col("q").as("cq"))

  private def wCellWin = org.apache.spark.sql.expressions.Window
    .partitionBy("vid").orderBy(col("cs").desc, col("cid"))

  /** (vid, cid, cs): exact quantized cosine of `sub`'s vectors against
    * every centroid — ONE broadcast pass (N x C partial sums, map-side
    * combinable). Assignment and probing both ride it.
    */
  private def ivfScores(el: DataFrame, n2: DataFrame, sub: DataFrame,
      cids: Seq[Long] = IvfDefaultCentroids): DataFrame =
    sub.join(broadcast(ivfCentroids(el, cids)), "i")
      .groupBy(col("vec_id").as("vid"), col("cid"))
      .agg(sum(col("q") * col("cq")).as("dp"))
      // nv is corpus-sized (one row per vector): no forced broadcast —
      // AQE picks the strategy from runtime sizes (guide §3.1); the nc
      // side below stays hinted (C centroid rows by construction)
      .join(n2.as("nv"), col("vid") === col("nv.vec_id"))
      .join(broadcast(
          n2.filter(col("vec_id").isin(cids.map(Long.box): _*)).as("nc")),
        col("cid") === col("nc.vec_id"))
      .select(col("vid"), col("cid"),
        cosine(col("dp"), col("nv.nn"), col("nc.nn")).as("cs"))

  /** argmin cell assignment: rn = 1 of [[ivfScores]], tie-break cid.
    * Output: (vec_id, cid).
    */
  private def ivfAssign(el: DataFrame, n2: DataFrame, sub: DataFrame,
      cids: Seq[Long] = IvfDefaultCentroids): DataFrame =
    ivfScores(el, n2, sub, cids)
      .withColumn("rn", row_number().over(wCellWin))
      .filter(col("rn") === 1).select(col("vid").as("vec_id"), col("cid"))

  /** top-nprobe probe cells per query vector. Output: (qid, cid). */
  private def ivfProbes(el: DataFrame, n2: DataFrame, sub: DataFrame,
      nprobe: Int): DataFrame =
    ivfScores(el, n2, sub).withColumn("rn", row_number().over(wCellWin))
      .filter(col("rn") <= nprobe).select(col("vid").as("qid"), col("cid"))

  /** Full-corpus cell assignment against an explicit codebook — the
    * rebuild pass [[rebuildIvfIndex]] commits, exposed for the spec that
    * recomputes the expected post-rebuild state independently.
    */
  private[graft] def ivfAssignAll(s: SparkSession, dir: String,
      cids: Seq[Long]): DataFrame = {
    val el = elements(s, dir)
    ivfAssign(el, norms(el), el, cids)
  }

  /** Centroid-drift maintenance for the persisted IVF index (the
    * `CALL system.rebuild_vector_index`-shaped operation a long-lived
    * vector store schedules when its codebook goes stale): re-assign
    * EVERY vector against the new centroid set — one broadcast pass, the
    * same N x C kernel as the original build — and commit the new cell
    * table as ONE atomic replace. Serving during the rebuild: the old
    * index keeps serving until the commit lands (the rebuild writes to
    * fresh directories; nothing the old snapshot references is touched),
    * a reader that planned before the commit keeps its pinned snapshot's
    * immutable files, and a probe planned after sees exactly the new
    * assignment — never a mix, because visibility IS the single metadata
    * commit (torn-commit crash recovery is IceliteSpec's existing story).
    * QueriesSpec proves the switch: one snapshot delta, old state
    * time-travelable, new state equal to an independent recompute.
    */
  private[graft] def rebuildIvfIndex(s: SparkSession, wh: String,
      dir: String, cids: Seq[Long]): Unit = {
    val idx = new graft.icelite.IceCatalog(s, wh)
      .loadTable("lake", "ivf_index")
    idx.replace(ivfAssignAll(s, dir, cids))
    ()
  }

  /** Build (once per JVM/sf) the persisted cell-partitioned IVF index —
    * x53's fixture, SHARED with x62's recall audit so both operators probe
    * the same lake table. The incremental-maintenance assertions live in
    * the build: the delta batch must commit as a pure append of exactly
    * its own rows (zero rewrite).
    */
  private def ivfLakeWarehouse(s: SparkSession, dir: String,
      el: DataFrame, n2: DataFrame): String =
    QUtil.cachedFixture(s, "x53_ivf_index", dir) { w =>
      val cat = new graft.icelite.IceCatalog(s, w)
      // ONE layout spelling (createRetrievalIndexTables) for fixture,
      // stream, and spec warehouses — the BM25 tables it also creates
      // stay empty here and are never probed
      createRetrievalIndexTables(cat)
      val idx = cat.loadTable("lake", "ivf_index")
      // snapshot 1: the base corpus builds the index
      idx.append(ivfAssign(el, n2, el.filter(col("vec_id") % 2 === 0)))
      // snapshot 2: a later delta batch assigns ONLY its own rows —
      // the incremental-maintenance step, cost tracks the delta
      val delta = ivfAssign(el, n2, el.filter(col("vec_id") % 2 =!= 0))
      val deltaRows = delta.count()
      idx.append(delta)
      val snap = idx.meta.currentSnapshot.get
      require(snap.operation == "append" && snap.addedRows == deltaRows,
        s"delta maintenance must append exactly the delta " +
          s"(op=${snap.operation}, added=${snap.addedRows}, delta=$deltaRows)")
      ()
    }

  /** Live values of an identity partition column, derived from the
    * driver-resident manifest (FileStat paths) — ZERO data IO. The probe
    * operators need "which partitions exist" for the coverage half of
    * their pruning assertion, and must not answer it by scanning the very
    * index the probe exists to avoid scanning (at 100 TB that full pass
    * would dominate the probe). Values come STRUCTURALLY from the manifest
    * entry ([[graft.icelite.TableMeta FileStat.partRaw]] — recorded values
    * for imports, properly-unescaped path parse otherwise), never from an
    * ad-hoc path regex: a string partition value containing '/', '=', or
    * %xx escapes would silently drop cells from a lexical match and hollow
    * out the coverage assertion.
    */
  private def livePartValues(idx: graft.icelite.IceTable,
      partCol: String): Set[String] =
    idx.meta.currentSnapshot.toSeq
      .flatMap(sn => idx.visibleFiles(sn))
      .flatMap(_.partRaw(Seq(partCol)).get(partCol).flatten)
      .toSet

  /** Partition-pruned candidate read of the persisted IVF index for a
    * (qid, cid) probe set, with the both-way planned-file assertions
    * (nothing outside the probed cells; every live probed cell planned).
    * Output: (qid, nid).
    */
  private def ivfLakeCandidates(s: SparkSession, wh: String,
      probes: DataFrame, who: String): DataFrame = {
    val idx = new graft.icelite.IceCatalog(s, wh).loadTable("lake", "ivf_index")
    // ONE execution of the probes subtree (r19 opt round, guide §1.2/§2.4):
    // the probe set is query-sized (qids x nprobe) by the operator's own
    // contract, so collect the (qid, cid) PAIRS once and serve both
    // consumers — the pruning predicate below AND the candidate join —
    // from the local relation; previously the ivfScores+window pipeline
    // behind `probes` executed twice (once for the cell collect, again
    // inside the joined plan).
    val probeRows = probes.select(col("qid"), col("cid")).collect()
    val probeCells = probeRows.map(_.getLong(1)).distinct.sorted
    // an intentionally-empty probe set (no query vector exists — e.g. a
    // corpus whose query DOCS have no embeddings) yields zero candidates,
    // never a tripped pruning assertion over a scan that planned nothing
    if (probeCells.isEmpty)
      return probes.select(col("qid"), col("qid").as("nid")).limit(0)
    val probesLocal = s.createDataFrame(
      java.util.Arrays.asList(probeRows.map(r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getLong(1))): _*),
      org.apache.spark.sql.types.StructType.fromDDL("qid BIGINT, cid BIGINT"))
    val idxScan = idx.toDF.where(col("cid").isin(probeCells.toIndexedSeq: _*))
    val planned = graft.sources.v2.HasPlannedFiles.of(idxScan)
    require(planned.nonEmpty && planned.forall(p =>
      probeCells.exists(c => p.contains(s"/cid=$c/"))),
      s"$who: probe must plan ONLY probed-cell partitions, got $planned")
    // coverage half: every probed cell that exists must be planned — live
    // cells come from the manifest paths, never from a scan
    val liveCells = livePartValues(idx, "cid").map(_.toLong)
    require(probeCells.filter(liveCells).forall(c =>
      planned.exists(_.contains(s"/cid=$c/"))),
      s"$who: probe must plan EVERY live probed cell " +
        s"(cells=${probeCells.toSeq}, planned=$planned)")
    broadcast(probesLocal).join(idxScan, "cid")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"))
  }

  /** Build (once per JVM/sf) the persisted term-bucketed BM25 index —
    * x61's fixture, SHARED with x63's hybrid fusion so both operators
    * probe the same lake tables. Incremental-maintenance assertions live
    * in the build (delta batch = pure append of exactly its own rows).
    */
  /** One BM25 index batch: postings + df deltas + corpus scalars, all
    * from the batch's own docs only — O(batch), never O(index). The ONE
    * spelling of index-time derivation: the x61 fixture build and st17's
    * per-epoch streaming maintenance both commit exactly these frames, so
    * batch-built and stream-built indexes are bit-identical by
    * construction.
    */
  private[graft] def bm25IndexBatch(b: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val tok = tokensOf(b)
    val post = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val lens = post.groupBy("doc_id").agg(sum(col("tf")).as("len"))
    val postings = post.join(lens, "doc_id")
      .select(x61Bucket(col("w")).as("bkt"), col("w"), col("doc_id"),
        col("tf"), col("len"))
    // df and corpus scalars DERIVE FROM the postings frame (r19 opt round,
    // guide §1.2 "don't compute things twice"): df per term = the term's
    // posting-row count (bkt is a function of w, so grouping by (bkt, w)
    // keeps cardinality and counts identical to the old per-w aggregate);
    // d = distinct doc count, s = Σ tf = Σ per-doc len. Same committed
    // values, but a caller that persists `postings` (the st17 epoch
    // kernel) now pays the tokenize+postings aggregation ONCE per batch
    // instead of three times — the df/corpus plans re-derived the raw
    // tokenization before.
    val dfd = postings.groupBy(col("bkt"), col("w"))
      .agg(count(lit(1)).as("df"))
    val corp = postings.agg(countDistinct(col("doc_id")).as("d"),
      sum(col("tf")).as("s"))
    (postings, dfd, corp)
  }

  /** Create the four empty retrieval-index tables (BM25 postings / term
    * df / corpus scalars, term-bucket-partitioned like x61's; the IVF
    * cell table, cell-partitioned like x53's) in `cat`'s warehouse —
    * shared by the fixture builds and st17's stream-maintained warehouse,
    * so the layouts cannot drift between serving paths.
    */
  private[graft] def createRetrievalIndexTables(
      cat: graft.icelite.IceCatalog): Unit = {
    cat.createTable("lake", "bm25_postings",
      org.apache.spark.sql.types.StructType.fromDDL(
        "bkt INT, w STRING, doc_id BIGINT, tf BIGINT, len BIGINT"),
      partitionBy = Seq("bkt"))
    cat.createTable("lake", "bm25_termdf",
      org.apache.spark.sql.types.StructType.fromDDL(
        "bkt INT, w STRING, df BIGINT"),
      partitionBy = Seq("bkt"))
    cat.createTable("lake", "bm25_corpus",
      org.apache.spark.sql.types.StructType.fromDDL("d BIGINT, s BIGINT"))
    cat.createTable("lake", "ivf_index",
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, cid BIGINT"),
      partitionBy = Seq("cid"))
    ()
  }

  /** Fold ONE batch of newly-arrived docs into BOTH persisted retrieval
    * indexes — the maintenance kernel st17 runs per streaming epoch:
    * BM25 postings/df/corpus appends ([[bm25IndexBatch]] — x61's
    * append-only algebra, df per term = Σ batch deltas) and IVF cell
    * assignments for exactly the batch's vectors (x53's delta shape,
    * centroids fixed). Every commit is asserted to be a PURE APPEND of
    * exactly its own rows — zero rewrite per epoch, O(batch) cost however
    * large the index already is. `dir` supplies the embedding table (at
    * scale the batch would carry its vectors inline; the centroid set is
    * broadcast either way).
    */
  private[graft] def maintainRetrievalIndexes(
      cat: graft.icelite.IceCatalog, dir: String, batchDocs: DataFrame): Unit = {
    val s = batchDocs.sparkSession
    // Pure-append proof from COMMIT STATS, zero extra actions (r20,
    // VERDICT r19 #4): the old spelling counted the frame independently
    // before each append (one full extra action per index per epoch). The
    // commit already records, per snapshot and O(1)-inline: the operation,
    // the added-file row sum (addedRows — from the write's own per-file
    // stats, R10), and the visible-file/row totals. A snapshot is a pure
    // append iff op == "append" AND it kept every parent file
    // (totalFileCount == parent.totalFileCount + addedFileCount — carried
    // sets are subsets of the parent's, so equal counts mean equal sets:
    // the TableMeta non-rewriting rule) AND the row total grew by exactly
    // the added files' rows. The `>= 0` guards keep the proof LOUD on
    // pre-upgrade metadata (inline counts -1) instead of vacuous.
    def assertPureAppend(tbl: graft.icelite.IceTable, who: String): Unit = {
      val m = tbl.meta
      val snap = m.currentSnapshot.get
      val parent = m.snapshots.find(_.snapshotId == snap.parentId)
      require(snap.totalFileCount >= 0 && snap.addedFileCount >= 0 &&
        parent.forall(_.totalFileCount >= 0),
        s"$who: inline commit stats missing — pre-upgrade metadata cannot " +
          "carry the metadata-only pure-append proof; compact/rewrite first")
      require(snap.operation == "append" &&
        snap.totalFileCount ==
          parent.map(_.totalFileCount).getOrElse(0L) + snap.addedFileCount &&
        snap.totalRows ==
          parent.map(_.totalRows).getOrElse(0L) + snap.addedRows,
        s"$who epoch maintenance must be a pure append of its own rows " +
          s"(op=${snap.operation}, files ${parent.map(_.totalFileCount)}" +
          s"+${snap.addedFileCount} -> ${snap.totalFileCount}, rows " +
          s"${parent.map(_.totalRows)}+${snap.addedRows} -> ${snap.totalRows})")
    }
    // the postings frame feeds THREE commits (postings append, then the
    // df/corpus appends derive from it): persist across them, release
    // before the next epoch — materialization happens inside the first
    // append's write, no separate count action (r20). At production scale
    // a foreachBatch would persist the incoming batch itself for the
    // epoch's lifetime.
    val (p0, d, c) = bm25IndexBatch(batchDocs)
    val p = p0.persist(cacheLevel(s))
    try {
      val postT = cat.loadTable("lake", "bm25_postings")
      postT.append(p)
      assertPureAppend(postT, "bm25_postings")
      // df/corpus appends run while `p` is still cached: bm25IndexBatch
      // derives both FROM the postings frame, so these two commits read
      // the persisted batch postings instead of re-tokenizing the batch
      // (r19 opt round — was three tokenize+aggregate passes per epoch)
      cat.loadTable("lake", "bm25_termdf").append(d)
      cat.loadTable("lake", "bm25_corpus").append(c)
    } finally p.unpersist(false)
    // IVF: assign ONLY the batch's vectors (fixed centroids make the
    // assignment row-independent, so stream-built ≡ assign-everything).
    // Elements ride the SESSION cache (r20, ADVICE r19): the kernel's own
    // persist/unpersist of the identical elements(s, dir) plan evicted the
    // live cachedElements entry through the shared CacheManager at every
    // epoch end, forcing the next x62/x63/x65 to rebuild; now epoch 2
    // additionally reuses epoch 1's cached elements instead of re-exploding
    // the corpus. Release stays with the liveEls discipline.
    val (el, _) = cachedElements(s, dir)
    val ids = batchDocs.select(col("doc_id").as("vec_id")).distinct()
    val sub = el.join(broadcast(ids), "vec_id")
    // norms ONLY for the batch's vectors and the centroid set (r19 opt
    // round): a vector's norm depends on its own elements alone, so the
    // values are identical — but the old full-corpus norm aggregate was
    // exactly the per-epoch O(index) pass this kernel exists to avoid.
    import org.apache.spark.sql.Encoders
    val needed = ids.unionByName(
        s.createDataset(IvfDefaultCentroids)(Encoders.scalaLong)
          .toDF("vec_id")).distinct()
    val n2b = norms(el.join(broadcast(needed), "vec_id"))
    // single consumer now (the append write — the pre-count is gone), so
    // no persist: the assignment plan runs exactly once
    val assign = ivfAssign(el, n2b, sub)
    val ivfT = cat.loadTable("lake", "ivf_index")
    ivfT.append(assign)
    assertPureAppend(ivfT, "ivf_index")
  }

  private def x61Warehouse(s: SparkSession, dir: String,
      docs: DataFrame): String =
    QUtil.cachedFixture(s, "x61_bm25_index", dir) { w =>
      val cat = new graft.icelite.IceCatalog(s, w)
      // ONE layout spelling (createRetrievalIndexTables) for fixture,
      // stream, and spec warehouses — the IVF table it also creates stays
      // empty here and is never probed
      createRetrievalIndexTables(cat)
      val postT = cat.loadTable("lake", "bm25_postings")
      val dfT = cat.loadTable("lake", "bm25_termdf")
      val corpT = cat.loadTable("lake", "bm25_corpus")
      // snapshot 1: the base corpus builds the index
      val (p1, d1, c1) = bm25IndexBatch(docs.filter(col("doc_id") % 2 === 0))
      postT.append(p1); dfT.append(d1); corpT.append(c1)
      // snapshot 2: a later delta batch indexes ONLY its own docs —
      // cost tracks the delta, and the commit must be pure append
      val (p2, d2, c2) = bm25IndexBatch(docs.filter(col("doc_id") % 2 =!= 0))
      val deltaRows = p2.count()
      postT.append(p2); dfT.append(d2); corpT.append(c2)
      val snap = postT.meta.currentSnapshot.get
      require(snap.operation == "append" && snap.addedRows == deltaRows,
        s"delta maintenance must append exactly the delta postings " +
          s"(op=${snap.operation}, added=${snap.addedRows}, delta=$deltaRows)")
      ()
    }

  /** The ONE spelling of the retrieval query workload x61 and x63 share:
    * the query docs (doc_id % 499 == 0) and every query's 5
    * lexicographically-first distinct terms as (qid, term) pairs —
    * query-sized driver reads (Q rows, then Q x 5). Whitespace-only query
    * docs appear in the qid list but contribute no pairs (their lexical
    * ranking is empty by definition). x61 queries the FIRST qid; x63
    * queries them all — both derive the rule from here, so the modulus
    * and the term cut cannot drift apart.
    */
  private def bm25QueryTerms(s: SparkSession,
      docs: DataFrame): (Seq[Long], Seq[(Long, String)]) = {
    val qids = docs.filter(col("doc_id") % 499 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    if (qids.isEmpty) (Nil, Nil)
    else {
      val wQ = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("w")
      val pairs = tokensOf(
          docs.filter(col("doc_id").isin(qids.map(Long.box): _*)))
        .select("doc_id", "w").distinct()
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= 5)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      (qids, pairs)
    }
  }

  /** Partition-pruned read of the persisted BM25 index for a probed term
    * set, with the both-way planned-file assertions (nothing outside the
    * probed buckets; every live probed bucket planned). Tables re-loaded
    * per call so a re-probe sees the current index version (the
    * fold-identity check). Returns (pruned postings scan, per-term df,
    * corpus doc count D, corpus token count S). `qterms` must be
    * non-empty — callers handle the degenerate corpus.
    */
  private def bm25LakeProbe(s: SparkSession, wh: String,
      qterms: Seq[String]): (DataFrame, DataFrame, Long, Long) = {
    val qbkts = s.createDataFrame(
        java.util.Arrays.asList(qterms.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType.fromDDL("w STRING"))
      .select(x61Bucket(col("w")).as("b")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val cat = new graft.icelite.IceCatalog(s, wh)
    val postT = cat.loadTable("lake", "bm25_postings")
    val dfT = cat.loadTable("lake", "bm25_termdf")
    val corpT = cat.loadTable("lake", "bm25_corpus")
    // probe = a partition-pruned scan of the probed term buckets only,
    // asserted BOTH ways (nothing outside them; every live one planned)
    val idxScan = postT.toDF
      .where(col("bkt").isin(qbkts.map(Int.box): _*) &&
        col("w").isin(qterms: _*))
    val planned = graft.sources.v2.HasPlannedFiles.of(idxScan)
    require(planned.nonEmpty && planned.forall(p =>
      qbkts.exists(b => p.contains(s"/bkt=$b/"))),
      s"probe must plan ONLY probed-bucket partitions, got $planned")
    // coverage half from the MANIFEST (zero data IO — the index must
    // never be full-scanned to assert its own pruning)
    val liveBkts = livePartValues(postT, "bkt").map(_.toInt)
    require(qbkts.filter(liveBkts).forall(b =>
      planned.exists(_.contains(s"/bkt=$b/"))),
      s"probe must plan EVERY live probed bucket (buckets=$qbkts, " +
        s"planned=$planned)")
    // df for the probed terms: the SAME pruned-bucket read; per-term df =
    // the sum of its batch deltas (additive by disjoint batches). bkt
    // rides in the group key (term determines bucket, cardinality
    // unchanged) and in the downstream join: the candidate join is
    // bucket-local, and keeping the partition column REFERENCED keeps
    // Spark's dynamic-partition-pruning rule resolvable against the
    // pruned scan output (it throws on a reported-but-pruned key)
    val dfs = dfT.toDF
      .where(col("bkt").isin(qbkts.map(Int.box): _*) &&
        col("w").isin(qterms: _*))
      .groupBy("bkt", "w").agg(sum(col("df")).as("df"))
    // corpus scalars: O(batches) rows
    val corp = corpT.toDF.agg(sum(col("d")), sum(col("s"))).collect()(0)
    val (dD, sS) = (corp.getLong(0), corp.getLong(1))
    bm25Guard(dD, "bm25LakeProbe")
    (idxScan, dfs, dD, sS)
  }

  /** Single-query top-k over [[bm25LakeProbe]]: global top-k as
    * TakeOrderedAndProject (asserted on the executed plan — NEVER a
    * no-partition window: a stop-word-frequency term makes the candidate
    * set corpus-sized, and an unpartitioned row_number would coalesce all
    * of it into one sort task). Returns the k best (nid, score1e6), best
    * first.
    */
  private def bm25LakeTopK(s: SparkSession, wh: String, qid: Long,
      qterms: Seq[String], k: Int): Seq[(Long, Long)] = {
    val (idxScan, dfs, dD, sS) = bm25LakeProbe(s, wh, qterms)
    val scored = idxScan.filter(col("doc_id") =!= qid)
      .join(broadcast(dfs), Seq("bkt", "w"))
      .select(col("doc_id").as("nid"), bm25TermScore(dD, sS).as("c"))
      .groupBy("nid").agg(sum(col("c")).as("score1e6"))
    val top = scored.orderBy(col("score1e6").desc, col("nid")).limit(k)
    require(top.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "BM25 top-k must plan as TakeOrderedAndProject (per-partition " +
        "top-k + k-sized driver merge), not a global sort/window")
    top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  /** MULTI-query lexical ranks over [[bm25LakeProbe]]: the (qid, term)
    * pairs broadcast onto the ONE pruned scan of the union bucket set, so
    * Q queries cost one index read; per-(qid, nid) BM25 sums aggregate
    * map-side and the per-qid top-k is the typed [[graft.functions
    * .TopKLongAggregator]] (x54's shape — k pairs per partition per qid
    * cross the shuffle, no window sort). Output: (qid, nid, lex_rank),
    * fully distributed.
    */
  private def bm25LakeLexRanks(s: SparkSession, wh: String,
      qtermPairs: Seq[(Long, String)], k: Int): DataFrame = {
    import s.implicits._
    // no (qid, term) pairs (every query doc is term-less): the lexical
    // ranking is empty by definition — the helper owns its empty frame so
    // the schema has ONE spelling, derived from the same tuple type the
    // non-empty path produces
    if (qtermPairs.isEmpty)
      return s.emptyDataset[(Long, Long, Int)].toDF("qid", "nid", "lex_rank")
    val (idxScan, dfs, dD, sS) = bm25LakeProbe(s, wh,
      qtermPairs.map(_._2).distinct)
    val pairs = broadcast(s.createDataFrame(
      java.util.Arrays.asList(qtermPairs.map(p =>
        org.apache.spark.sql.Row(Long.box(p._1), p._2)): _*),
      org.apache.spark.sql.types.StructType.fromDDL("qid BIGINT, w STRING")))
    val scored = idxScan.join(pairs, Seq("w"))
      .filter(col("doc_id") =!= col("qid"))
      .join(broadcast(dfs), Seq("bkt", "w"))
      .select(col("qid"), col("doc_id").as("nid"),
        bm25TermScore(dD, sS).as("c"))
      .groupBy("qid", "nid").agg(sum(col("c")).as("score1e6"))
    val topk = new graft.functions.TopKLongAggregator(k).toColumn
    scored.select(col("qid"), col("score1e6"), col("nid"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .flatMap { case (q, t) =>
        t.zipWithIndex.map { case ((_, nid), i) => (q, nid, i + 1) }
      }
      .toDF("qid", "nid", "lex_rank")
  }

  /** The x63 probe machinery over a given PAIR of persisted retrieval
    * indexes: the shared query workload ([[bm25QueryTerms]]), lexical
    * top-k ranks from the BM25 index at `whLex`, dense top-k ranks from
    * the IVF index at `whDense`, and their integer-exact RRF fusion.
    * Returns None when the corpus has no query docs; otherwise
    * Some((qids, lex, dense, fused)) with lex = (qid, nid, lex_rank INT),
    * dense = (qid, nid, dense_rank INT), fused = (qid, doc_id, lex_rank,
    * dense_rank, rrf1e6, rank INT), fused cut at rank <= k. ONE spelling
    * serves x63 (the fixture indexes), x65 (recall audit of all three
    * rankings), and st17 (the STREAM-maintained indexes) — the serving
    * path cannot drift between batch and streaming index builds.
    * `persistLegs` caches lex/dense for callers that consume the legs
    * BESIDE fused (x65's three-system audit — without it each index probe
    * subtree executes twice); fused-only callers leave it off.
    */
  private[graft] def hybridLegs(s: SparkSession, dir: String,
      whLex: String, whDense: String, k: Int, persistLegs: Boolean = false)
      : Option[(Seq[Long], DataFrame, DataFrame, DataFrame)] = {
    val docs = t(s, dir, "documents")
    // persisted: the dense leg references el/n2 across several actions
    // (the probe collect inside ivfLakeCandidates, then the scored plan)
    val (el, n2v) = cachedElements(s, dir)
    // the shared workload rule (bm25QueryTerms — ONE spelling with x61):
    // query docs + each query's 5 first terms, driver-sized
    val (qids, qtermPairs) = bm25QueryTerms(s, docs)
    if (qids.isEmpty) None
    else {
      // lexical ranks from the persisted BM25 index: Q queries, ONE
      // pruned scan (assertions inside bm25LakeProbe); term-less
      // (whitespace) query docs contribute no pairs and fuse dense-only
      val lex0 = bm25LakeLexRanks(s, whLex, qtermPairs, k)
      // dense ranks from the persisted IVF index: all queries' probes in
      // one pruned candidate read (assertions inside ivfLakeCandidates;
      // query docs with NO embedding yield no probes and fuse lex-only),
      // exact fixed-point per-qid top-k
      val probes = ivfProbes(el, n2v,
        el.filter(col("vec_id").isin(qids.map(Long.box): _*)), 2)
      val dense0 = exactTopK(el, n2v,
          ivfLakeCandidates(s, whDense, probes, "hybrid"), k)
        .select(col("qid"), col("nid"), col("rn").cast("int").as("dense_rank"))
      val (lex, dense) =
        if (persistLegs) (lex0.persist(), dense0.persist())
        else (lex0, dense0)
      // RRF fusion, DISTRIBUTED: full-outer join of two top-k-sized rank
      // sets on (qid, nid), integer-exact reciprocal-rank sum. The final
      // ranking is a per-qid window OVER FUSED — fused is <= 2k rows per
      // qid BY CONSTRUCTION (two top-k inputs), so the window sorts
      // bounded groups, keeps both input ranks inline, and reads the
      // lex/dense subtrees exactly ONCE (an aggregator + rank re-attach
      // would re-execute both subtrees for the join-back).
      val fused = lex.join(dense, Seq("qid", "nid"), "full_outer")
        .select(col("qid"), col("nid"), col("lex_rank"), col("dense_rank"),
          expr("coalesce(CAST(1000000 AS BIGINT) DIV (60 + lex_rank), " +
            "CAST(0 AS BIGINT)) + coalesce(CAST(1000000 AS BIGINT) DIV " +
            "(60 + dense_rank), CAST(0 AS BIGINT))").as("rrf1e6"))
      val wF = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("rrf1e6").desc, col("nid"))
      val fusedRanked = fused
        .withColumn("rank", row_number().over(wF).cast("int"))
        .filter(col("rank") <= k)
        .select(col("qid"), col("nid").as("doc_id"), col("lex_rank"),
          col("dense_rank"), col("rrf1e6"), col("rank"))
      Some((qids, lex, dense, fusedRanked))
    }
  }

  /** The empty frame matching x63/st17's fused output schema. */
  private[graft] def emptyHybridFrame(
      s: SparkSession): org.apache.spark.sql.DataFrame =
    s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(
        "qid BIGINT, doc_id BIGINT, lex_rank INT, dense_rank INT, " +
          "rrf1e6 BIGINT, rank INT"))

  /** The shared DuckDB CTE chain restating the hybrid probe from the
    * corpus definition — query workload `qd`/`qt`, lexical BM25 top-`k`
    * (`lex`), IVF dense top-`k` (`dense`), and the RRF fusion (`ranked`).
    * [[hybridRrfOracleSql]] selects the fused ranking (x63 AND st17 — the
    * stream-maintained index must serve exactly this definition); x65's
    * oracle extends the chain with the exact ground truth and the recall
    * arithmetic.
    */
  private def hybridCtesSql(k: Int): String =
    s"""$bm25BaseSql,
       |$elementsSql,
       |qd AS (SELECT doc_id q FROM documents WHERE doc_id % 499 = 0),
       |qt AS (
       |  SELECT q qid, w FROM (
       |    SELECT qd.q, t.w,
       |      row_number() OVER (PARTITION BY qd.q ORDER BY t.w) rn
       |    FROM qd JOIN (SELECT DISTINCT doc_id, w FROM tok2) t
       |      ON t.doc_id = qd.q) WHERE rn <= 5),
       |lhit AS (
       |  SELECT qt.qid, p.doc_id nid, p.w, p.tf, l.len
       |  FROM qt JOIN post p ON p.w = qt.w AND p.doc_id <> qt.qid
       |  JOIN lens l ON l.doc_id = p.doc_id),
       |lterm AS (
       |  SELECT qid, nid, $bm25TermScoreSql AS c
       |  FROM lhit h JOIN dfreq f ON f.w = h.w, corp),
       |lscore AS (
       |  SELECT qid, nid, CAST(sum(c) AS BIGINT) s FROM lterm
       |  GROUP BY qid, nid),
       |lex AS (
       |  SELECT qid, nid, CAST(rn AS INT) lex_rank FROM (
       |    SELECT qid, nid,
       |      row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) rn
       |    FROM lscore) WHERE rn <= $k),
       |cel AS (SELECT vec_id cid, i, q FROM el WHERE vec_id < 8),
       |adots AS (
       |  SELECT a.vec_id vid, c.cid, CAST(SUM(a.q*c.q) AS BIGINT) dp
       |  FROM el a JOIN cel c ON a.i = c.i GROUP BY 1, 2),
       |ascore AS (
       |  SELECT vid, cid,
       |    CAST(dp AS DOUBLE) / sqrt(CAST(nv.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) cs
       |  FROM adots JOIN n2 nv ON nv.vec_id = vid JOIN n2 nc ON nc.vec_id = cid),
       |assign AS (SELECT vid, cid FROM (
       |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
       |    FROM ascore) WHERE rn = 1),
       |probes AS (SELECT vid, cid FROM (
       |    SELECT a.vid, a.cid,
       |      row_number() OVER (PARTITION BY a.vid ORDER BY a.cs DESC, a.cid) rn
       |    FROM ascore a JOIN qd ON a.vid = qd.q) WHERE rn <= 2),
       |dcand AS (
       |  SELECT p.vid qid, a.vid nid FROM probes p
       |  JOIN assign a ON a.cid = p.cid AND a.vid <> p.vid),
       |ddots AS (
       |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
       |  FROM dcand JOIN el a ON a.vec_id = qid
       |  JOIN el b ON b.vec_id = nid AND b.i = a.i
       |  GROUP BY qid, nid),
       |dense AS (
       |  SELECT qid, nid, CAST(rn AS INT) dense_rank FROM (
       |    SELECT qid, nid,
       |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
       |    FROM ddots JOIN n2 na ON na.vec_id = qid
       |    JOIN n2 nb ON nb.vec_id = nid) WHERE rn <= $k),
       |fused AS (
       |  SELECT COALESCE(l.qid, d.qid) qid,
       |    COALESCE(l.nid, d.nid) doc_id, l.lex_rank, d.dense_rank,
       |    CAST(COALESCE(1000000 // (60 + l.lex_rank), 0)
       |      + COALESCE(1000000 // (60 + d.dense_rank), 0) AS BIGINT) rrf1e6
       |  FROM lex l FULL OUTER JOIN dense d
       |    ON l.qid = d.qid AND l.nid = d.nid),
       |ranked AS (
       |  SELECT qid, doc_id, lex_rank, dense_rank, rrf1e6,
       |    row_number() OVER (PARTITION BY qid ORDER BY rrf1e6 DESC, doc_id) rn
       |  FROM fused)""".stripMargin

  private[graft] def hybridRrfOracleSql: String =
    s"""WITH ${hybridCtesSql(10)}
       |SELECT qid, doc_id, lex_rank, dense_rank, rrf1e6,
       |  CAST(rn AS INT) AS rank
       |FROM ranked WHERE rn <= 10 ORDER BY qid, rank""".stripMargin

  /** Sign pattern of the first 8 dimensions, as an 8-char '0'/'1' string. */
  private def signBucket(embedding: Column): Column =
    expr("concat_ws('', transform(slice(embedding, 1, 8), x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END))")

  private val signBucketSql: String =
    "array_to_string(list_transform(embedding[1:8], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"

  val defs: Seq[QDef] = Seq(

    // Brute-force cosine top-k: query set (vec_id < 10) against the corpus.
    QDef(
      "x6_sim_topk_bruteforce",
      Some(s"""WITH $elementsSql,
              |dots AS (
              |  SELECT a.vec_id qid, b.vec_id nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 10 GROUP BY 1, 2),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 5
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        val el = elements(s, dir)
        val n2 = norms(el)
        val dots = broadcast(el.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("i"), col("q").as("qq")))
          .as("a")
          .join(el.as("b"), col("a.i") === col("b.i") && col("b.vec_id") =!= col("a.qid"))
          .groupBy(col("a.qid"), col("b.vec_id").as("nid"))
          .agg(sum(col("a.qq") * col("b.q")).as("dp"))
        rankTopK(dots, n2, 5).orderBy("qid", "rn")
      }),

    // Bucketed ANN: sign-LSH on the leading 8 dimensions -> candidates share
    // a bucket -> exact cosine within bucket -> top-3 per query (vec_id < 50).
    QDef(
      "x7_sim_ann_lsh",
      Some(s"""WITH $elementsSql,
              |bk AS (SELECT vec_id, $signBucketSql AS bucket FROM embeddings),
              |cand AS (
              |  SELECT q.vec_id qid, c.vec_id nid FROM bk q
              |  JOIN bk c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 50),
              |dots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM cand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 3
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val bk = emb.select(col("vec_id"), signBucket(col("embedding")).as("bucket"))
        val cand = bk.filter(col("vec_id") < 50).as("q")
          .join(bk.as("c"), col("q.bucket") === col("c.bucket") && col("c.vec_id") =!= col("q.vec_id"))
          .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"))
        val el = elements(s, dir)
        exactTopK(el, norms(el), cand, 3).orderBy("qid", "rn")
      }),

    // Scale-parameterized ANN: L=4 LSH tables x P=8 seeded +/-1 hyperplanes
    // (plane p, dim i gets sign + iff (p*1103515245 + i*12345) % 97 < 48 —
    // a fixed integer formula both engines evaluate identically). Projections
    // are integer sums of quantized elements, so every sign bit is bit-exact
    // across engines and partitionings. Occupancy math: P planes make 2^P
    // buckets, so expected bucket occupancy is corpus/2^P per table — pick
    // P ~ log2(corpus / target_occupancy) to keep the within-bucket candidate
    // join linear (e.g. 1e9 vectors, occupancy 1k -> P = 20), and add tables
    // (L) to buy back recall, since a true neighbor is a candidate if it
    // agrees on ALL P planes in ANY of the L tables. The L knob is MEASURED,
    // not just claimed: x62's audit scores L=4 vs L=8 on the same frontier
    // (sf0.01: recall@3 14.0% @ 2.9k candidates → 28.7% @ 4.0k — monotone by
    // candidate-superset construction, strictly so in measurement). x7's
    // fixed 8 leading dims (<=256 buckets) cannot scale this way; this
    // operator is the 100 TB path.
    QDef(
      "x7b_sim_ann_multitable",
      Some(s"""WITH $elementsSql,
              |planes AS (SELECT p FROM unnest(range(0, 32)) t(p)),
              |proj AS (
              |  SELECT vec_id, p,
              |    SUM(CASE WHEN (p*1103515245 + i*12345) % 97 < 48 THEN q ELSE -q END) proj
              |  FROM el CROSS JOIN planes GROUP BY vec_id, p),
              |bk AS (
              |  SELECT vec_id, CAST(p // 8 AS INT) tbl,
              |    string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) bucket
              |  FROM proj GROUP BY vec_id, CAST(p // 8 AS INT)),
              |cand AS (
              |  SELECT DISTINCT q.vec_id qid, c.vec_id nid FROM bk q
              |  JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 50),
              |dots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM cand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 3
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        val el = elements(s, dir)
        val planes = broadcast(s.range(0, 32).toDF("p"))
        val proj = el.crossJoin(planes)
          .groupBy(col("vec_id"), col("p"))
          .agg(sum(when((col("p") * 1103515245L + col("i") * 12345L) % 97 < 48,
            col("q")).otherwise(-col("q"))).as("proj"))
        val bk = proj
          .select(col("vec_id"), (col("p") / 8).cast("int").as("tbl"),
            col("p"), when(col("proj") >= 0, "1").otherwise("0").as("bit"))
          .groupBy("vec_id", "tbl")
          .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(p, bit))), x -> x.bit))")
            .as("bucket"))
        val cand = bk.filter(col("vec_id") < 50).as("q")
          .join(bk.as("c"),
            col("q.tbl") === col("c.tbl") && col("q.bucket") === col("c.bucket") &&
              col("c.vec_id") =!= col("q.vec_id"))
          .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"))
          .distinct()
        exactTopK(el, norms(el), cand, 3).orderBy("qid", "rn")
      }),

    // Same query as x6, through the native codegen'd QuantizedCosine
    // expression (graft.functions.VecMath): the whole corpus stays as packed
    // float arrays — no posexplode, no per-element shuffle — and each
    // (query, neighbor) score is one fused-loop expression eval inside
    // whole-stage codegen. The query set broadcasts; cost is one narrow pass
    // over the corpus. Identical oracle to x6 (bit-identical fixed-point
    // semantics), so the two plans cross-check each other.
    QDef(
      "x13_sim_native_topk",
      Some(s"""WITH $elementsSql,
              |dots AS (
              |  SELECT a.vec_id qid, b.vec_id nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 10 GROUP BY 1, 2),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 5
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val emb = t(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
        denseTopK(
          emb.select(col("vec_id").as("nid"), col("embedding").as("nemb"))
            .join(broadcast(qs), col("nid") =!= col("qid"))
            .select(col("qid"), col("nid"),
              call_function("quantized_cosine", col("qemb"), col("nemb"))
                .as("cos_sim")),
          5).orderBy("qid", "rn")
      }),

    // IVF-style ANN (the inverted-file scale path next to x7's LSH): a
    // coarse quantizer of C=8 centroid vectors partitions the corpus into
    // cells (each vector is ASSIGNED to its nearest centroid by exact
    // quantized cosine, tie-break on centroid id); a query probes its
    // nprobe=2 nearest cells and scores exactly only the vectors filed
    // there. Centroids here are the vectors with vec_id < 8 — a fixed,
    // engine-independent stand-in for the k-means codebook an offline job
    // would train at scale. 100 TB shape: assignment is ONE broadcast pass
    // over the corpus (centroid table is tiny), the inverted lists are the
    // corpus re-bucketed by cell id — written as a cell-partitioned icelite
    // table they join storage-partitioned — and probe cost is
    // nprobe x cell occupancy, never corpus size; recall/cost tunes with C
    // (occupancy ~ N/C) and nprobe, orthogonal knobs LSH lacks.
    QDef(
      "x27_sim_ivf",
      Some(s"""WITH $elementsSql,
              |cel AS (SELECT vec_id cid, i, q FROM el WHERE vec_id < 8),
              |adots AS (
              |  SELECT a.vec_id vid, c.cid, CAST(SUM(a.q*c.q) AS BIGINT) dp
              |  FROM el a JOIN cel c ON a.i = c.i GROUP BY 1, 2),
              |ascore AS (
              |  SELECT vid, cid,
              |    CAST(dp AS DOUBLE) / sqrt(CAST(nv.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) cs
              |  FROM adots JOIN n2 nv ON nv.vec_id = vid JOIN n2 nc ON nc.vec_id = cid),
              |assign AS (
              |  SELECT vid, cid FROM (
              |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |    FROM ascore) WHERE rn = 1),
              |probes AS (
              |  SELECT vid qid, cid FROM (
              |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |    FROM ascore WHERE vid < 50) WHERE rn <= 2),
              |cand AS (
              |  SELECT p.qid, a.vid nid FROM probes p
              |  JOIN assign a ON a.cid = p.cid AND a.vid <> p.qid),
              |dots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM cand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 3
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        // x27 is a SINGLE-action query (assignment, probes, candidates and
        // the exact top-k are one plan; ReuseExchange dedupes the repeated
        // el/n2 subtrees within it) — cachedElements would pay the cache
        // materialization for zero cross-action reuse (r20, VERDICT r19 #3:
        // driver measured the persist as pure drag here, 0.81 → 1.52 s)
        val el = elements(s, dir)
        val n2 = norms(el)
        // assignment: one broadcast pass — N x C dot products, map-side
        // combinable into N x C partial sums (ivfScores/ivfAssign)
        val assign = ivfAssign(el, n2, el)
        val probes = ivfProbes(el, n2, el.filter(col("vec_id") < 50), 2)
        val cand = broadcast(probes).join(assign, "cid")
          .filter(col("vec_id") =!= col("qid"))
          .select(col("qid"), col("vec_id").as("nid"))
        exactTopK(el, n2, cand, 3).orderBy("qid", "rn")
      }),

    // LEXICAL retrieval (round 16) — the OTHER half of similarity search:
    // embedding ANN (x6/x7/x27/x53) finds semantic neighbors; a corpus
    // pipeline equally needs TERM-BASED retrieval (more-like-this dedup
    // triage, RAG candidate generation, contamination forensics). The
    // classic inverted-index shape: postings = one map-side-combinable
    // (term, doc, tf) aggregate — the only corpus-sized shuffle; the
    // query side (distinct terms of each query doc) is query-sized and
    // BROADCAST, so candidate scoring is an equi-join on the term whose
    // cost tracks posting-list sizes, never corpus x queries. Scoring is
    // BM25-shaped but INTEGER-EXACT (the x43 discipline — never sum
    // engine-ordered doubles): idf and the tf-saturation term are scaled
    // rationals in 1e6 fixed point with truncating division, so per-term
    // contributions are int64 and the per-doc sum is order-insensitive
    // and bit-identical across engines. (Constants bound: contributions
    // <= ~5e9 x 2.2e6 / 1e6 at this corpus; a 1e11-doc corpus would move
    // idf scaling to 1e3 to stay in int64.) k1=1.2, b=0.75 — the standard
    // Robertson parameters, as exact fractions 2200000/1200000/750000.
    QDef(
      "x54_bm25_retrieval",
      Some(s"""WITH $bm25BaseSql,
             |q AS (SELECT doc_id qid, w FROM post WHERE doc_id % 499 = 0),
             |hit AS (
             |  SELECT q.qid, p.doc_id nid, p.w, p.tf, l.len
             |  FROM q JOIN post p ON p.w = q.w AND p.doc_id <> q.qid
             |  JOIN lens l ON l.doc_id = p.doc_id),
             |scoredterm AS (
             |  SELECT qid, nid,
             |    $bm25TermScoreSql AS c
             |  FROM hit h JOIN dfreq f ON f.w = h.w, corp),
             |score AS (
             |  SELECT qid, nid, CAST(sum(c) AS BIGINT) score1e6 FROM scoredterm
             |  GROUP BY qid, nid),
             |ranked AS (
             |  SELECT qid, nid, score1e6,
             |    row_number() OVER (PARTITION BY qid ORDER BY score1e6 DESC, nid) rn
             |  FROM score)
             |SELECT qid, CAST(rn AS INT) AS rank, nid, score1e6
             |FROM ranked WHERE rn <= 5 ORDER BY qid, rank""".stripMargin),
      (s, dir) => {
        val tok = tokensOf(t(s, dir, "documents"))
        // postings feed four consumers (lens, df, query side, candidate
        // join): persist once, released on the NEXT build via livePost —
        // the liveKmeans discipline. Corpus-sized (one row per distinct
        // (doc, term)), hence the parameterized level (guide §5).
        Option(livePost.remove(s)).foreach(_.unpersist())
        val post = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
          .persist(cacheLevel(s))
        livePost.put(s, post)
        val lens = post.groupBy("doc_id").agg(sum(col("tf")).as("len"))
        // two corpus scalars (doc count, total tokens): one tiny collect
        val corp = lens.agg(count(lit(1)).as("d"), sum(col("len")).as("s"))
          .collect()(0)
        val (dD, sS) = (corp.getLong(0), corp.getLong(1))
        bm25Guard(dD, "x54")
        val dfreq = post.groupBy("w").agg(count(lit(1)).as("df"))
        val q = broadcast(post.filter(col("doc_id") % 499 === 0)
          .select(col("doc_id").as("qid"), col("w").as("qw")))
        val hit = post.as("p").join(q,
            col("p.w") === col("qw") && col("p.doc_id") =!= col("qid"))
          .select(col("qid"), col("p.doc_id").as("nid"), col("p.w"), col("p.tf"))
          .join(lens.withColumnRenamed("doc_id", "nid"), "nid")
          .join(dfreq.withColumnRenamed("w", "w2"), col("w") === col("w2"))
        val scored = hit.select(col("qid"), col("nid"),
          bm25TermScore(dD, sS).as("c"))
          .groupBy("qid", "nid").agg(sum(col("c")).as("score1e6"))
        // per-qid top-5 via the typed TopKLongAggregator (w4's shape), not a
        // window: the partial/final object-hash aggregate moves 5 pairs per
        // (partition, qid) over the shuffle instead of sorting each qid's
        // whole candidate set — a stop-word-frequency query term makes that
        // set corpus-sized, so the window formulation is the scale trap.
        // Ordering (score1e6 desc, nid asc) matches the oracle's row_number.
        import s.implicits._
        val topk = new graft.functions.TopKLongAggregator(5).toColumn
        scored.select(col("qid"), col("score1e6"), col("nid"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3))
          .agg(topk.name("topk"))
          .flatMap { case (qid, top) =>
            top.zipWithIndex.map { case ((sc, nid), i) => (qid, i + 1, nid, sc) }
          }
          .toDF("qid", "rank", "nid", "score1e6")
          .orderBy("qid", "rank")
      }),

    // The PERSISTED IVF index (round 16) — x27 computes its cell
    // assignment per query; a production vector store MAINTAINS the index
    // as a table and serves probes from it. This operator is that shape
    // on the lake: the assignment table lives as an icelite table
    // PARTITIONED BY CELL ID, so a probe IS a partition-pruned scan —
    // nprobe cells touch nprobe partitions' files and the rest of the
    // index is never read (asserted in-query on the scan's own planned
    // file set). Maintenance is INCREMENTAL, x25's economics for vectors:
    // the base corpus builds snapshot 1; a later delta batch assigns ONLY
    // its own rows (one broadcast argmax pass over the delta, centroids
    // fixed) and appends snapshot 2 — asserted to add exactly the delta's
    // rows with zero rewrite. Assignment per row is independent given
    // fixed centroids, so base∪delta equals assign-everything — which is
    // exactly what the oracle restates, plus the probe and the exact
    // fixed-point top-k over candidates from the probed cells only.
    QDef(
      "x53_ivf_index_lake",
      Some(s"""WITH $elementsSql,
              |cel AS (SELECT vec_id cid, i, q FROM el WHERE vec_id < 8),
              |adots AS (
              |  SELECT a.vec_id vid, c.cid, CAST(SUM(a.q*c.q) AS BIGINT) dp
              |  FROM el a JOIN cel c ON a.i = c.i GROUP BY 1, 2),
              |ascore AS (
              |  SELECT vid, cid,
              |    CAST(dp AS DOUBLE) / sqrt(CAST(nv.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) cs
              |  FROM adots JOIN n2 nv ON nv.vec_id = vid JOIN n2 nc ON nc.vec_id = cid),
              |assign AS (
              |  SELECT vid, cid FROM (
              |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |    FROM ascore) WHERE rn = 1),
              |probes AS (
              |  SELECT vid qid, cid FROM (
              |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |    FROM ascore WHERE vid >= 8 AND vid < 11) WHERE rn <= $X53DefaultNprobe),
              |cand AS (
              |  SELECT p.qid, a.vid nid FROM probes p
              |  JOIN assign a ON a.cid = p.cid AND a.vid <> p.qid),
              |dots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM cand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |scored AS (
              |  SELECT qid, nid, $cosineSql AS cos_sim,
              |    row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |  FROM dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |SELECT qid, nid, cos_sim, rn FROM scored WHERE rn <= 3
              |ORDER BY qid, rn""".stripMargin),
      (s, dir) => {
        val (el, n2) = cachedElements(s, dir)
        // the index table is FIXTURE for the probe (x25's economics: build
        // once, probe forever) — memoized per JVM/sf, with the incremental-
        // maintenance assertions inside the build (ivfLakeWarehouse)
        val wh = ivfLakeWarehouse(s, dir, el, n2)
        // query: nprobe probes over the PERSISTED index (the recall/cost
        // knob a real IVF serves — graft.x53.nprobe, default 2); the scan
        // must plan EXACTLY the probed cells' partitions, both directions
        // (ivfLakeCandidates carries the assertions)
        val nprobe = s.conf.get("graft.x53.nprobe",
          X53DefaultNprobe.toString).toInt
        require(nprobe >= 1, s"graft.x53.nprobe must be >= 1, got $nprobe")
        val probes = ivfProbes(el, n2,
          el.filter(col("vec_id") >= 8 && col("vec_id") < 11), nprobe)
        val cand = ivfLakeCandidates(s, wh, probes, s"x53(nprobe=$nprobe)")
        exactTopK(el, n2, cand, 3).orderBy("qid", "rn")
      }),

    // The PERSISTED BM25 index (round 17) — x54 proved integer-exact
    // lexical retrieval but rebuilds its postings every run; this is the
    // x53 treatment applied to terms: the inverted index LIVES ON THE LAKE
    // as three icelite tables — postings (bkt, w, doc_id, tf, len)
    // PARTITIONED BY TERM-HASH BUCKET, per-term df deltas in the same
    // bucketed layout, and one (d, s) corpus-scalar row per batch — so a
    // query probe IS a partition-pruned scan: a k-term query touches <= k
    // term buckets' files and the rest of the index is never read
    // (asserted in-query on the scan's own planned file set, both
    // directions). Maintenance is INCREMENTAL and APPEND-ONLY by algebra:
    // docs partition disjointly into batches, so per-batch postings are
    // simply new rows, per-batch df deltas SUM to the corpus df, and the
    // corpus scalars sum — no rewrite, no merge (asserted zero-rewrite on
    // the commit). Doc length rides denormalized IN the posting row (the
    // Lucene norms idea), so scoring needs no corpus-sized doclen join.
    // The df-delta table grows one row per (batch, term); when that ever
    // binds, the standard maintenance applies as-is — binpack the bucket
    // partitions (k29) or fold deltas with a grouped replace — without
    // touching the probe path, which reads only probed buckets either way.
    // Not just documented: the fold RUNS in-query every invocation (grouped
    // replace of bm25_termdf) and the probe is asserted bit-identical
    // before/after, pruning assertions included (round 18).
    // Scoring is bit-identical to x54 by construction: both call the ONE
    // bm25TermScore. The query here is the classic few-term shape (the 5
    // lexicographically-first distinct terms of the first query doc) —
    // exactly where a term-partitioned index earns its keep.
    QDef(
      "x61_bm25_index_lake",
      Some(s"""WITH $bm25BaseSql,
              |qdoc AS (SELECT min(doc_id) q FROM documents WHERE doc_id % 499 = 0),
              |qterms AS (
              |  SELECT DISTINCT w FROM tok2 JOIN qdoc ON tok2.doc_id = qdoc.q
              |  ORDER BY w LIMIT 5),
              |hit AS (
              |  SELECT p.doc_id nid, p.w, p.tf, l.len
              |  FROM qterms t JOIN post p ON p.w = t.w
              |  JOIN lens l ON l.doc_id = p.doc_id, qdoc
              |  WHERE p.doc_id <> qdoc.q),
              |scoredterm AS (
              |  SELECT nid, $bm25TermScoreSql AS c
              |  FROM hit h JOIN dfreq f ON f.w = h.w, corp),
              |score AS (
              |  SELECT nid, CAST(sum(c) AS BIGINT) score1e6 FROM scoredterm
              |  GROUP BY nid),
              |ranked AS (
              |  SELECT nid, score1e6,
              |    row_number() OVER (ORDER BY score1e6 DESC, nid) rn
              |  FROM score)
              |SELECT (SELECT q FROM qdoc) AS qid, CAST(rn AS INT) AS rank,
              |  nid, score1e6
              |FROM ranked WHERE rn <= 10 ORDER BY rank""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        // the index is FIXTURE for the probe (build once, probe forever —
        // x53's economics), with the incremental-maintenance assertions
        // inside the build; SHARED with x63's hybrid fusion
        val wh = x61Warehouse(s, dir, docs)
        // x61 queries the FIRST query doc (the oracle's min(doc_id) qdoc)
        val (qids, qpairs) = bm25QueryTerms(s, docs)
        val qid = qids.headOption.getOrElse(-1L)
        val qterms = qpairs.filter(_._1 == qid).map(_._2)
        // degenerate-but-valid corpora: no query doc (qid = -1) or a
        // whitespace-only query doc — zero results (matching the oracle's
        // NULL qdoc / empty qterms CTEs), never a tripped pruning
        // assertion over an intentionally-empty scan. (if/else, not
        // `return`: a non-local return from a stored lambda throws.)
        if (qterms.isEmpty)
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType.fromDDL(
              "qid BIGINT, rank INT, nid BIGINT, score1e6 BIGINT"))
        else {
          // the probe (pruning + TakeOrderedAndProject assertions inside)
          val first = bm25LakeTopK(s, wh, qid, qterms, 10)
          // MAINTENANCE EXERCISED, not just documented (scaladoc above):
          // FOLD the per-(batch, term) df-delta rows with a grouped
          // replace — one row per term, same bucketed layout (replace
          // writes under the table's own partitionBy) — then re-probe and
          // require the served top-10 bit-identical, pruning assertions
          // included. ONCE per JVM/warehouse (the fixture discipline):
          // folding is occasional MAINTENANCE, not part of a query —
          // charging it to every probe would misprice the steady state the
          // benchmark tracks, while the once-per-JVM run still proves
          // fold-identity on every Verify and every bench round 1. Later
          // invocations probe the FOLDED table (df sums are additive by
          // disjoint batches, so results are asserted identical here and
          // idempotent thereafter). Cost is O(df table) — term-count-
          // sized, never corpus-sized.
          if (!x61FoldDone.contains(wh)) {
            val dfT = new graft.icelite.IceCatalog(s, wh)
              .loadTable("lake", "bm25_termdf")
            dfT.replace(dfT.toDF.groupBy("bkt", "w")
              .agg(sum(col("df")).as("df")))
            val second = bm25LakeTopK(s, wh, qid, qterms, 10)
            require(first == second,
              s"df-delta fold must not change the served ranking " +
                s"(before=$first, after=$second)")
            // marked done only AFTER the identity check passes: a
            // transient fold failure (or a tripped require) must re-run
            // next invocation, not silently skip the very path this
            // exists to exercise. Benign under concurrency — the fold is
            // idempotent.
            x61FoldDone.add(wh)
          }
          // rank attaches on the k-sized driver result — 10 rows, never
          // a stage
          val rows = first.zipWithIndex.map { case ((nid, sc), i) =>
            org.apache.spark.sql.Row(qid, i + 1, nid, sc)
          }
          s.createDataFrame(
            java.util.Arrays.asList(rows.toIndexedSeq: _*),
            org.apache.spark.sql.types.StructType.fromDDL(
              "qid BIGINT, rank INT, nid BIGINT, score1e6 BIGINT"))
        }
      }),

    // HYBRID RETRIEVAL (round 18) — reciprocal-rank fusion over BOTH
    // persisted lake indexes, MULTI-QUERY and distributed end to end: the
    // lexical candidates come from x61's term-bucketed BM25 index (every
    // query's terms broadcast onto ONE partition-pruned scan of the union
    // bucket set, per-qid top-10 via the typed TopKLongAggregator) and
    // the dense candidates from x53's cell-partitioned IVF index (all
    // queries' probes in one pruned candidate read, per-qid exact
    // fixed-point top-10) — the production RAG/retrieval shape where
    // neither signal alone suffices (BM25 misses paraphrase, embeddings
    // miss rare exact terms). Fusion is RRF (Cormack et al.):
    // score(d) = Σ_systems 1e6 // (60 + rank_s(d)) — rank-based, so no
    // cross-system score calibration, and INTEGER-EXACT (both input
    // rankings are total orders with nid tie-breaks; the fusion
    // arithmetic is integer division). The fusion itself is a full-outer
    // join of two (qid, nid, rank) sets — top-k-sized per query, NEVER
    // corpus-sized — and the final per-qid ranking is a window over that
    // fused set, whose groups are <= 2k rows BY CONSTRUCTION (two top-k
    // inputs), so no stage of the fusion grows with the corpus or funnels
    // into one task at any query count. Degenerate queries degrade
    // per-qid exactly like the oracle: a term-less (whitespace) query doc
    // has no lexical rows and fuses dense-only; a query doc with no
    // EMBEDDING yields no probes and fuses lex-only.
    QDef(
      "x63_hybrid_rrf",
      Some(hybridRrfOracleSql),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val (el, n2v) = cachedElements(s, dir)
        hybridLegs(s, dir, x61Warehouse(s, dir, docs),
            ivfLakeWarehouse(s, dir, el, n2v), 10) match {
          case None => emptyHybridFrame(s)
          case Some((_, _, _, fused)) => fused.orderBy("qid", "rank")
        }
      }),

    // HYBRID RECALL AUDIT (round 19) — "hybrid beats either alone" as a
    // MEASURED fact, not a literature citation: x63's fused ranking scored
    // beside its two input systems on the SAME probe set against the SAME
    // ground truth (exact brute-force cosine top-3 per query doc — the x62
    // discipline, integer-exact recall arithmetic). Measured recall@10 vs
    // exact top-3, 1e6 fixed point: sf0.01 (2 queries) lex 0, dense
    // 833333, fused 833333; sf0.1 (5 queries with embeddings of 11 query
    // docs) lex 0, dense 799999, fused 799999 — the fusion loses NOTHING
    // to the stronger system (every high-ranked dense hit survives the
    // RRF cut) while folding in the lexical ranking that serves the
    // no-embedding/paraphrase cases this SEMANTIC ground truth cannot
    // reward (lex 0 here is the audit being honest about that, not a
    // defect: BM25 ranks term overlap, the truth is cosine). recall(fused)
    // >= max(lex, dense) holds on the measured corpus and is pinned in
    // QueriesSpec (a measured property, not an RRF invariant — see the
    // body comment), so a fusion regression fails the suite loudly while
    // the production query never asserts corpus luck.
    QDef(
      "x65_hybrid_recall",
      Some(s"""WITH ${hybridCtesSql(10)},
              |fsel AS (SELECT qid, doc_id nid FROM ranked WHERE rn <= 10),
              |xdots AS (
              |  SELECT a.vec_id qid, b.vec_id nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN qd ON a.vec_id = qd.q
              |  JOIN el b ON b.i = a.i AND b.vec_id <> a.vec_id
              |  GROUP BY 1, 2),
              |xtop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM xdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |xq AS (SELECT qid, CAST(count(*) AS BIGINT) kq FROM xtop GROUP BY qid),
              |nq AS (SELECT CAST(count(*) AS BIGINT) n FROM xq),
              |lhits AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM lex t
              |          JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |dhits AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM dense t
              |          JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |fhits AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM fsel t
              |          JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid)
              |SELECT * FROM (
              |  SELECT 'hy1_lex' AS method, (SELECT n FROM nq) AS n_queries,
              |    (SELECT CAST(SUM(COALESCE(l.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN lhits l ON l.qid = x.qid) AS mean_recall_1e6
              |  UNION ALL
              |  SELECT 'hy2_dense', (SELECT n FROM nq),
              |    (SELECT CAST(SUM(COALESCE(d.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN dhits d ON d.qid = x.qid)
              |  UNION ALL
              |  SELECT 'hy3_fused', (SELECT n FROM nq),
              |    (SELECT CAST(SUM(COALESCE(f.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN fhits f ON f.qid = x.qid))
              |ORDER BY method""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val (el, n2) = cachedElements(s, dir)
        val outSchema = org.apache.spark.sql.types.StructType.fromDDL(
          "method STRING, n_queries BIGINT, mean_recall_1e6 BIGINT")
        val methodNames = Seq("hy1_lex", "hy2_dense", "hy3_fused")
        // the oracle's UNION-of-scalar-subqueries shape ALWAYS yields one
        // row per method — on a degenerate corpus (no query docs, or no
        // query doc with an embedding) each is (method, 0-or-n, NULL),
        // never an empty relation; both degenerate arms below restate
        // exactly that
        def degenerate(nq: Long): DataFrame =
          s.createDataFrame(
            java.util.Arrays.asList(methodNames.map(m =>
              org.apache.spark.sql.Row(m, nq, null)): _*), outSchema)
        hybridLegs(s, dir, x61Warehouse(s, dir, docs),
            ivfLakeWarehouse(s, dir, el, n2), 10,
            persistLegs = true) match {
          case None => degenerate(0L)
          case Some((qids, lex, dense, fused)) =>
            // ground truth: exact top-3 per query doc over the whole
            // corpus — the x6 broadcast shape restricted to the retrieval
            // workload's qids (query docs with no embedding have no
            // ground-truth rows and drop from the mean on BOTH engines)
            val bruteDots = broadcast(
                el.filter(col("vec_id").isin(qids.map(Long.box): _*))
                  .select(col("vec_id").as("qid"), col("i"), col("q").as("qq")))
              .as("a")
              .join(el.as("b"),
                col("a.i") === col("b.i") && col("b.vec_id") =!= col("a.qid"))
              .groupBy(col("a.qid"), col("b.vec_id").as("nid"))
              .agg(sum(col("a.qq") * col("b.q")).as("dp"))
            // two consumers (per-qid kq + the hit join) — persisted; both
            // harnesses clear the cache after every query. Query-bounded
            // (k rows per query doc, never corpus-sized), so the default
            // memory level is right at any scale (guide §5).
            val exactTop = rankTopK(bruteDots, n2, 3)
              .select("qid", "nid").persist()
            val systems = Seq(
              "hy1_lex" -> lex.select("qid", "nid"),
              "hy2_dense" -> dense.select("qid", "nid"),
              "hy3_fused" -> fused.select(col("qid"), col("doc_id").as("nid")))
            val tagged = systems.map { case (m, c) =>
              c.select(lit(m).as("method"), col("qid"), col("nid")) }
              .reduce(_ unionByName _)
            val xq = exactTop.groupBy("qid").agg(count(lit(1)).as("kq"))
            val hits = exactTop.join(tagged, Seq("qid", "nid"))
              .groupBy("method", "qid").agg(count(lit(1)).as("hits"))
            val mdf = s.createDataset(systems.map(_._1))(
              org.apache.spark.sql.Encoders.STRING).toDF("method")
            val rows = xq.crossJoin(broadcast(mdf))
              .join(hits, Seq("method", "qid"), "left")
              .select(col("method"), col("kq"),
                coalesce(col("hits"), lit(0L)).as("hits"))
              .groupBy("method")
              .agg(count(lit(1)).as("nq"),
                sum(expr("hits * 1000000L DIV kq")).as("rsum"))
              .select(col("method"), col("nq").as("n_queries"),
                expr("rsum DIV nq").as("mean_recall_1e6"))
              .orderBy("method")
            // The 3 audited rows are RETURNED as the collected local
            // relation (the x61 driver-attach shape) — re-executing the
            // whole audit plan for the caller's count/write would double
            // the suite's second-most-expensive query for zero new info.
            // An empty collect means NO query doc had an embedding (xq
            // empty) — the oracle still emits its three constant rows
            // with NULL means. The fusion contract recall(fused) >=
            // max(lex, dense) is a MEASURED property of this corpus, not
            // an RRF invariant (a lone dense-rank-10 hit CAN be displaced
            // by ten lex-only docs on some valid corpus), so it is pinned
            // in QueriesSpec over the test corpus — never asserted inside
            // the production query — and each run prints the live values
            // on stderr for the round ledger.
            val collected = rows.collect()
            if (collected.isEmpty) degenerate(0L)
            else {
              System.err.println("[x65] " + collected.map(r =>
                s"${r.getString(0)}=${r.get(2)}").mkString(" "))
              s.createDataFrame(
                java.util.Arrays.asList(collected.toIndexedSeq: _*), outSchema)
            }
        }
      }),

    // SQ8 SCALAR QUANTIZATION + EXACT REFINE (round 19) — the memory-
    // bandwidth scale path the recall frontier was missing: compress every
    // element to an int8 code with a per-DIMENSION affine scale (mn/mx over
    // the corpus — d tiny rows, broadcast), score queries ASYMMETRICALLY
    // (exact query elements x decoded corpus reconstructions — the FAISS
    // SQ8 shape: the scan reads 1-byte codes instead of the int64
    // fixed-point elements, and the query side loses no precision;
    // MEASURED at rest, not argued: the persisted per-vector code arrays
    // are 0.228x the bytes of the persisted element arrays at sf0.01 —
    // 4.4x, short of the theoretical 8x because parquet's encoding
    // overhead is shared — printed and >= 2x-gated on every run), then
    // REFINE: exact-rerank only the approx top-m per query and keep
    // top-3. The approx scan reads the PERSISTED code table (the x53/x61
    // persisted-index discipline), so the cheap scan is what the plan
    // executes. Everything integer-exact in both engines: the code
    // ((q-mn)*255) DIV (mx-mn) and the reconstruction mn + (c*(mx-mn)) DIV
    // 255 are nonneg truncating divisions, the approx dot is an int64 sum
    // (|q| <= 2^20 so 64 dims * 2^40 fits with 2^13 headroom), cosine is
    // the shared double-from-int64 rule. Three rows measure the funnel:
    // m1_raw trusts the approx ranking outright (rerank_budget 0),
    // m2_refine5 / m3_refine10 exact-rerank the approx top-5 / top-10.
    // recall(m1) <= recall(m2) <= recall(m3) is PROVABLE on every corpus —
    // candidates(m=5) ⊆ candidates(m=10) and a true top-3 member t in any
    // candidate set survives exact reranking (at most 2 vectors in the
    // whole corpus beat t's cosine, so at most 2 candidates do) — so the
    // body `require`s it after the collect, unlike x65's corpus-measured
    // fusion property. Measured at sf0.01 (500 x 64-dim, 50 queries):
    // m1_raw 980.0k, m2_refine5 and m3_refine10 both 1000.0k recall@3 —
    // raw int8 ranking loses 2% of the true top-3 and exact-reranking just
    // FIVE candidates per query buys all of it back.
    // 100 TB shape: dim stats are one d-row aggregate; encoding is one
    // narrow map-side pass; the approx scan is the x6 broadcast shape over
    // 1/8th the bytes with map-side-combinable partial sums; the per-qid
    // top-m rides denseTopK's bounded TopKAggregator (never a one-task
    // sort); the refine pass scores m rows per query. Budgets and recall
    // are the x62 integer arithmetic, returned as a 3-row local relation.
    QDef(
      "x66_sq8_refine",
      Some(s"""WITH $elementsSql,
              |dim AS (
              |  SELECT i, CAST(MIN(q) AS BIGINT) mn, CAST(MAX(q) AS BIGINT) mx
              |  FROM el GROUP BY i),
              |dec AS (
              |  SELECT e.vec_id nid, e.i,
              |    d.mn + (CASE WHEN d.mx > d.mn
              |                 THEN ((e.q - d.mn) * 255) // (d.mx - d.mn)
              |                 ELSE 0 END * (d.mx - d.mn)) // 255 AS qhat
              |  FROM el e JOIN dim d ON d.i = e.i),
              |adots AS (
              |  SELECT a.vec_id qid, d.nid, CAST(SUM(a.q * d.qhat) AS BIGINT) dp
              |  FROM el a JOIN dec d ON d.i = a.i AND d.nid <> a.vec_id
              |  WHERE a.vec_id < 50 GROUP BY 1, 2),
              |atop AS (
              |  SELECT qid, nid, rn FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM adots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 10),
              |rdots AS (
              |  SELECT t.qid, t.nid, t.rn, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM atop t JOIN el a ON a.vec_id = t.qid
              |  JOIN el b ON b.vec_id = t.nid AND b.i = a.i
              |  GROUP BY 1, 2, 3),
              |r10 AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn2
              |    FROM rdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn2 <= 3),
              |r5 AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn2
              |    FROM rdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid
              |    WHERE rdots.rn <= 5)
              |  WHERE rn2 <= 3),
              |raw3 AS (SELECT qid, nid FROM atop WHERE rn <= 3),
              |xdots AS (
              |  SELECT a.vec_id qid, b.vec_id nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 50 GROUP BY 1, 2),
              |xtop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM xdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |xq AS (SELECT qid, CAST(count(*) AS BIGINT) kq FROM xtop GROUP BY qid),
              |nq AS (SELECT CAST(count(*) AS BIGINT) n FROM xq),
              |rhit AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM raw3 t
              |         JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |h5 AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM r5 t
              |       JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |h10 AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM r10 t
              |        JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid)
              |SELECT * FROM (
              |  SELECT 'm1_raw' AS method, (SELECT n FROM nq) AS n_queries,
              |    CAST(0 AS BIGINT) AS rerank_budget,
              |    (SELECT CAST(SUM(COALESCE(r.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN rhit r ON r.qid = x.qid) AS mean_recall_1e6
              |  UNION ALL
              |  SELECT 'm2_refine5', (SELECT n FROM nq),
              |    (SELECT CAST(count(*) AS BIGINT) FROM atop WHERE rn <= 5),
              |    (SELECT CAST(SUM(COALESCE(r.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN h5 r ON r.qid = x.qid)
              |  UNION ALL
              |  SELECT 'm3_refine10', (SELECT n FROM nq),
              |    (SELECT CAST(count(*) AS BIGINT) FROM atop),
              |    (SELECT CAST(SUM(COALESCE(r.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN h10 r ON r.qid = x.qid))
              |ORDER BY method""".stripMargin),
      (s, dir) => {
        val (el, n2) = cachedElements(s, dir)
        val k = 3
        // The codes are PERSISTED and the bandwidth claim is MEASURED, not
        // argued (the x64b discipline): the fixture materializes both
        // at-rest representations once per JVM/sf — per-vector int8 code
        // arrays and the per-vector fixed-point element arrays an exact
        // scan would read — and every run prints their on-disk byte ratio
        // and requires >= 2x compression. The approx scan then reads the
        // PERSISTED code table (the x53/x61 persisted-index discipline),
        // so the cheap scan IS the thing the plan executes, not a design
        // footnote. dims (d tiny rows) ride the same fixture.
        // both at-rest tables ride writeSized (r20): the bare writes landed
        // the aggregate's 32 tiny files each, so the approx scan — the very
        // read whose bandwidth the fixture exists to measure — scheduled 32
        // tasks per probe; the byte-ratio gate compares the SAME layout on
        // both sides either way
        val fixDir = QUtil.cachedFixture(s, "x66_sq8", dir) { w =>
          val dims0 = el.groupBy("i")
            .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
          dims0.repartition(1).write.mode("overwrite").parquet(s"$w/dims")
          QUtil.writeSized(
            el.groupBy("vec_id")
              .agg(expr(
                "transform(array_sort(collect_list(struct(i, q))), x -> x.q)")
                .as("q"))
              .select(col("vec_id").as("nid"), col("q")), s"$w/els")
          QUtil.writeSized(
            el.join(broadcast(dims0), "i")
              .select(col("vec_id"), col("i"),
                expr("IF(mx > mn, ((q - mn) * 255L) DIV (mx - mn), 0L)")
                  .cast("int").as("c"))
              .groupBy("vec_id")
              .agg(expr(
                "transform(array_sort(collect_list(struct(i, c))), x -> x.c)")
                .as("codes"))
              .select(col("vec_id").as("nid"), col("codes")), s"$w/codes")
        }
        def bytesOf(p: String): Long = {
          val path = new org.apache.hadoop.fs.Path(p)
          val hfs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
          val it = hfs.listFiles(path, true)
          var n = 0L
          while (it.hasNext) {
            val f = it.next()
            if (f.getPath.getName.endsWith(".parquet")) n += f.getLen
          }
          n
        }
        val (codeBytes, elBytes) =
          (bytesOf(s"$fixDir/codes"), bytesOf(s"$fixDir/els"))
        System.err.println(f"[x66] codes_bytes=$codeBytes%d " +
          f"element_bytes=$elBytes%d ratio=${codeBytes.toDouble / elBytes}%.3f")
        require(codeBytes * 2 <= elBytes,
          s"x66: persisted SQ8 codes ($codeBytes B) must measure at most " +
            s"half the at-rest fixed-point elements ($elBytes B) — the " +
            "bandwidth claim broke")
        // asymmetric reconstruction FROM THE PERSISTED CODES: posexplode
        // back to (nid, i, c), broadcast-join the d-row dims, decode
        val dims = broadcast(s.read.parquet(s"$fixDir/dims"))
        val decoded = s.read.parquet(s"$fixDir/codes")
          .select(col("nid"), posexplode(col("codes")))
          .toDF("nid", "p", "c")
          .select(col("nid"), (col("p") + 1).as("i"), col("c"))
          .join(dims, "i")
          .select(col("nid"), col("i"),
            expr("mn + (CAST(c AS BIGINT) * (mx - mn)) DIV 255").as("qhat"))
        val qel = el.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("i"), col("q").as("aq"))
        // asymmetric approx scan: ONE narrow queries x corpus pass over the
        // decoded codes, map-side-combinable partial sums
        val adots = broadcast(qel).join(decoded, "i")
          .filter(col("nid") =!= col("qid"))
          .groupBy("qid", "nid")
          .agg(sum(col("aq") * col("qhat")).as("dp"))
        val approxScored = adots
          .join(n2.as("na"), col("qid") === col("na.vec_id"))
          .join(n2.as("nb"), col("nid") === col("nb.vec_id"))
          .select(col("qid"), col("nid"),
            cosine(col("dp"), col("na.nn"), col("nb.nn")).as("cos_sim"))
        // per-qid approx top-10 via the bounded TopKAggregator — persisted:
        // it feeds both refine funnels, the raw arm, and the budget counts
        // query-bounded persist (10 rows per query — default level is
        // right at any scale); BOTH rerank budgets come out of ONE
        // aggregate action over it (r20, VERDICT r19 #7 — the second
        // count() action re-walked the cached frame for one number)
        val top10 = denseTopK(approxScored, 10).persist()
        val collected = try {
          val bRow = top10.agg(count(lit(1)).as("b10"),
            count(when(col("rn") <= 5, 1)).as("b5")).collect()(0)
          val (budget10, budget5) = (bRow.getLong(0), bRow.getLong(1))
          // x61's in-query discipline: the approx ranking must be the
          // bounded typed aggregator, never a per-qid window — the plan a
          // hot query's corpus-sized candidate set would die on first
          val topPlan = top10.queryExecution.executedPlan.toString
          require(topPlan.contains("ObjectHashAggregate") &&
            !topPlan.contains("Window ["),
            s"x66: approx top-m must rank via the typed aggregator:\n$topPlan")
          val raw3 = top10.filter(col("rn") <= k).select("qid", "nid")
          // exact rerank dots computed ONCE over the top-10 candidates
          // (the oracle's rdots CTE), ranked twice: refine5's pairs are a
          // subset of refine10's, so scoring them independently would
          // double the 64-dim dot-product work. The approx rank rides the
          // aggregate (one row per pair, so min(rn) IS the rank) to cut
          // the refine5 subset without a second join.
          val rdots = top10.select("qid", "nid", "rn")
            .join(el.as("a"), col("a.vec_id") === col("qid"))
            .join(el.as("b"),
              col("b.vec_id") === col("nid") && col("b.i") === col("a.i"))
            .groupBy("qid", "nid")
            .agg(sum(col("a.q") * col("b.q")).as("dp"),
              min(col("rn")).as("arn"))
          val refine10 = rankTopK(rdots.select("qid", "nid", "dp"), n2, k)
            .select("qid", "nid")
          val refine5 = rankTopK(
            rdots.filter(col("arn") <= 5).select("qid", "nid", "dp"), n2, k)
            .select("qid", "nid")
          // ground truth: exact top-3 over the whole corpus (the x62 shape)
          val bruteDots = broadcast(qel).as("a")
            .join(el.as("b"),
              col("a.i") === col("b.i") && col("b.vec_id") =!= col("a.qid"))
            .groupBy(col("a.qid"), col("b.vec_id").as("nid"))
            .agg(sum(col("a.aq") * col("b.q")).as("dp"))
          val exactTop = rankTopK(bruteDots, n2, k).select("qid", "nid")
            .persist()
          try {
            val systems = Seq("m1_raw" -> raw3, "m2_refine5" -> refine5,
              "m3_refine10" -> refine10)
            val budgets = Map("m1_raw" -> 0L, "m2_refine5" -> budget5,
              "m3_refine10" -> budget10)
            val tagged = systems.map { case (m, c) =>
              c.select(lit(m).as("method"), col("qid"), col("nid")) }
              .reduce(_ unionByName _)
            val xq = exactTop.groupBy("qid").agg(count(lit(1)).as("kq"))
            val hits = exactTop.join(tagged, Seq("qid", "nid"))
              .groupBy("method", "qid").agg(count(lit(1)).as("hits"))
            val mdf = s.createDataset(systems.map(_._1))(
              org.apache.spark.sql.Encoders.STRING).toDF("method")
            val budgetCol = budgets.foldLeft(lit(0L)) {
              case (acc, (m, n)) =>
                when(col("method") === m, lit(n)).otherwise(acc)
            }
            // 3-row local relation (the x65 return shape); the funnel
            // monotonicity is a THEOREM here, asserted below on every
            // corpus. Persisted frames release on EVERY path (a tripped
            // require must not pin caches for the rest of the session).
            xq.crossJoin(broadcast(mdf))
              .join(hits, Seq("method", "qid"), "left")
              .select(col("method"), col("kq"),
                coalesce(col("hits"), lit(0L)).as("hits"))
              .groupBy("method")
              .agg(count(lit(1)).as("nq"),
                sum(expr("hits * 1000000L DIV kq")).as("rsum"))
              .select(col("method"), col("nq").as("n_queries"),
                budgetCol.as("rerank_budget"),
                expr("rsum DIV nq").as("mean_recall_1e6"))
              .orderBy("method")
              .collect()
          } finally exactTop.unpersist()
        } finally top10.unpersist()
        val recall = collected.map(r => r.getString(0) -> r.getLong(3)).toMap
        require(recall("m1_raw") <= recall("m2_refine5") &&
          recall("m2_refine5") <= recall("m3_refine10"),
          s"x66: refine funnel recall not monotone: $recall — the rerank " +
            "lost a candidate it was handed, which the superset+domination " +
            "argument rules out; the exact scoring tail diverged")
        System.err.println("[x66] " + collected.map(r =>
          s"${r.getString(0)}=${r.getLong(3)}@${r.getLong(2)}").mkString(" "))
        s.createDataFrame(
          java.util.Arrays.asList(collected.toIndexedSeq: _*),
          org.apache.spark.sql.types.StructType.fromDDL(
            "method STRING, n_queries BIGINT, rerank_budget BIGINT, " +
              "mean_recall_1e6 BIGINT"))
      }),

    // ANN RECALL AUDIT (round 17) — the one number a production vector
    // store tunes against, measured for every ANN serving path: exact
    // brute-force top-3 per query (vec_id < 50) is the ground truth; each
    // method's top-3 over ITS candidate set is scored as recall@3, an
    // INTEGER-EXACT fraction (hits x 1e6 // k per query, then // n_queries
    // — the x43 discipline, so the audit itself is bit-identical across
    // engines), beside the method's total candidate budget (the cost side
    // of the recall/cost trade). Methods: m1 the exact baseline (recall
    // 1.0 by identity — the audit audits itself), m2 x7's 8-dim sign-LSH
    // buckets, m3/m7 x7b's multitable LSH at L=4 and L=8 (x P=8 — the L
    // knob MEASURED on the frontier: candidates(L=8) ⊇ candidates(L=4), so
    // recall is provably monotone and the audit shows the buy per budget;
    // measured at sf0.01: L=4 14.0% @ 2.9k candidates → L=8 28.7% @ 4.0k),
    // m4/m5 x27's IVF at nprobe=2/4 (the knob itself, measured), m6 the
    // PERSISTED x53 lake index probed at nprobe=2 with the same
    // partition-pruning assertions — m6 must equal m4 exactly (the
    // persisted index serves computed-index recall; any divergence is an
    // index-maintenance bug), which is why the oracle restates m6 from
    // the same relational definition as m4.
    // 100 TB shape: everything is the operators' own plans (broadcast
    // probes, bucket equi-joins, candidate-tracking score cost) plus one
    // queries x corpus exact pass — the audit runs on a SAMPLE of queries
    // in production, exactly as here.
    QDef(
      "x62_ann_recall",
      Some(s"""WITH $elementsSql,
              |xdots AS (
              |  SELECT a.vec_id qid, b.vec_id nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN el b ON a.i = b.i AND b.vec_id <> a.vec_id
              |  WHERE a.vec_id < 50 GROUP BY 1, 2),
              |xtop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM xdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |xq AS (SELECT qid, CAST(count(*) AS BIGINT) kq FROM xtop GROUP BY qid),
              |nq AS (SELECT CAST(count(*) AS BIGINT) n FROM xq),
              |nv AS (SELECT CAST(count(*) AS BIGINT) n FROM n2),
              |bk AS (SELECT vec_id, $signBucketSql AS bucket FROM embeddings),
              |lcand AS (
              |  SELECT q.vec_id qid, c.vec_id nid FROM bk q
              |  JOIN bk c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 50),
              |ldots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM lcand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |ltop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM ldots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |mplanes AS (SELECT p FROM unnest(range(0, 64)) t(p)),
              |mproj AS (
              |  SELECT vec_id, p,
              |    SUM(CASE WHEN (p*1103515245 + i*12345) % 97 < 48 THEN q ELSE -q END) proj
              |  FROM el CROSS JOIN mplanes GROUP BY vec_id, p),
              |mbk AS (
              |  SELECT vec_id, CAST(p // 8 AS INT) tbl,
              |    string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) bucket
              |  FROM mproj GROUP BY vec_id, CAST(p // 8 AS INT)),
              |mcand AS (
              |  SELECT DISTINCT q.vec_id qid, c.vec_id nid FROM mbk q
              |  JOIN mbk c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 50 AND q.tbl < 4),
              |mdots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM mcand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |mtop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM mdots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |m7cand AS (
              |  SELECT DISTINCT q.vec_id qid, c.vec_id nid FROM mbk q
              |  JOIN mbk c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
              |  WHERE q.vec_id < 50),
              |m7dots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM m7cand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |m7top AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM m7dots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |cel AS (SELECT vec_id cid, i, q FROM el WHERE vec_id < 8),
              |adots AS (
              |  SELECT a.vec_id vid, c.cid, CAST(SUM(a.q*c.q) AS BIGINT) dp
              |  FROM el a JOIN cel c ON a.i = c.i GROUP BY 1, 2),
              |ascore AS (
              |  SELECT vid, cid,
              |    CAST(dp AS DOUBLE) / sqrt(CAST(nv2.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)) cs
              |  FROM adots JOIN n2 nv2 ON nv2.vec_id = vid JOIN n2 nc ON nc.vec_id = cid),
              |assign AS (SELECT vid, cid FROM (
              |    SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |    FROM ascore) WHERE rn = 1),
              |pranked AS (
              |  SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) rn
              |  FROM ascore WHERE vid < 50),
              |probes AS (SELECT vid qid, cid FROM pranked WHERE rn <= 2),
              |probes4 AS (SELECT vid qid, cid FROM pranked WHERE rn <= 4),
              |icand AS (
              |  SELECT p.qid, a.vid nid FROM probes p
              |  JOIN assign a ON a.cid = p.cid AND a.vid <> p.qid),
              |icand4 AS (
              |  SELECT p.qid, a.vid nid FROM probes4 p
              |  JOIN assign a ON a.cid = p.cid AND a.vid <> p.qid),
              |idots AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM icand JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |idots4 AS (
              |  SELECT qid, nid, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM icand4 JOIN el a ON a.vec_id = qid JOIN el b ON b.vec_id = nid AND b.i = a.i
              |  GROUP BY qid, nid),
              |itop AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM idots JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |itop4 AS (
              |  SELECT qid, nid FROM (
              |    SELECT qid, nid,
              |      row_number() OVER (PARTITION BY qid ORDER BY $cosineSql DESC, nid) rn
              |    FROM idots4 JOIN n2 na ON na.vec_id = qid JOIN n2 nb ON nb.vec_id = nid)
              |  WHERE rn <= 3),
              |lhit AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM ltop t
              |         JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |mhit AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM mtop t
              |         JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |m7hit AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM m7top t
              |          JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |ihit AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM itop t
              |         JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |ihit4 AS (SELECT t.qid, CAST(count(*) AS BIGINT) h FROM itop4 t
              |          JOIN xtop e ON e.qid = t.qid AND e.nid = t.nid GROUP BY t.qid),
              |irow AS (
              |  SELECT (SELECT n FROM nq) n_queries,
              |    (SELECT CAST(count(*) AS BIGINT) FROM icand) total_candidates,
              |    CAST(SUM(COALESCE(i.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT) mean_recall_1e6
              |  FROM xq x LEFT JOIN ihit i ON i.qid = x.qid),
              |irow4 AS (
              |  SELECT (SELECT n FROM nq) n_queries,
              |    (SELECT CAST(count(*) AS BIGINT) FROM icand4) total_candidates,
              |    CAST(SUM(COALESCE(i.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT) mean_recall_1e6
              |  FROM xq x LEFT JOIN ihit4 i ON i.qid = x.qid)
              |SELECT * FROM (
              |  SELECT 'm1_exact' AS method, (SELECT n FROM nq) AS n_queries,
              |    (SELECT (SELECT n FROM nq) * (n - 1) FROM nv) AS total_candidates,
              |    CAST(1000000 AS BIGINT) AS mean_recall_1e6
              |  UNION ALL
              |  SELECT 'm2_lsh8', (SELECT n FROM nq),
              |    (SELECT CAST(count(*) AS BIGINT) FROM lcand),
              |    (SELECT CAST(SUM(COALESCE(l.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN lhit l ON l.qid = x.qid)
              |  UNION ALL
              |  SELECT 'm3_lsh_multi', (SELECT n FROM nq),
              |    (SELECT CAST(count(*) AS BIGINT) FROM mcand),
              |    (SELECT CAST(SUM(COALESCE(m.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN mhit m ON m.qid = x.qid)
              |  UNION ALL
              |  SELECT 'm4_ivf2', n_queries, total_candidates, mean_recall_1e6 FROM irow
              |  UNION ALL
              |  SELECT 'm5_ivf4', n_queries, total_candidates, mean_recall_1e6 FROM irow4
              |  UNION ALL
              |  SELECT 'm6_ivf_lake', n_queries, total_candidates, mean_recall_1e6 FROM irow
              |  UNION ALL
              |  SELECT 'm7_lsh_multi8', (SELECT n FROM nq),
              |    (SELECT CAST(count(*) AS BIGINT) FROM m7cand),
              |    (SELECT CAST(SUM(COALESCE(m.h, 0) * 1000000 // x.kq) // (SELECT n FROM nq) AS BIGINT)
              |     FROM xq x LEFT JOIN m7hit m ON m.qid = x.qid))
              |ORDER BY method""".stripMargin),
      (s, dir) => {
        val (el, n2) = cachedElements(s, dir)
        val k = 3
        // ground truth: exact top-3 per query over the whole corpus — the
        // x6 broadcast shape (queries x corpus, one narrow pass). Persisted
        // (released on the next build — the livePost discipline): every
        // method row joins against it twice.
        val bruteDots = broadcast(el.filter(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("i"), col("q").as("qq")))
          .as("a")
          .join(el.as("b"), col("a.i") === col("b.i") && col("b.vec_id") =!= col("a.qid"))
          .groupBy(col("a.qid"), col("b.vec_id").as("nid"))
          .agg(sum(col("a.qq") * col("b.q")).as("dp"))
        Option(liveRecall.remove(s)).foreach(_.foreach(_.unpersist()))
        val exactTop = rankTopK(bruteDots, n2, k).select("qid", "nid").persist()
        // m1's budget: brute force scans everything — bounded scalar reads
        val nVec = n2.count()
        val nQ = exactTop.select("qid").distinct().count()
        // m2: x7's sign-LSH buckets
        val bk = t(s, dir, "embeddings")
          .select(col("vec_id"), signBucket(col("embedding")).as("bucket"))
        val lshCand = bk.filter(col("vec_id") < 50).as("q")
          .join(bk.as("c"), col("q.bucket") === col("c.bucket") &&
            col("c.vec_id") =!= col("q.vec_id"))
          .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"))
        // m3/m7: x7b's multitable LSH at L=4 and L=8 (P=8 seeded
        // hyperplanes per table) — the L KNOB MEASURED, not just claimed:
        // candidates(L=8) ⊇ candidates(L=4) by construction (same buckets,
        // more tables), and a hit can never be displaced by a non-hit
        // (exact-top members dominate any candidate ranking), so recall is
        // provably monotone in L; the audit shows by how much, per budget.
        // ONE 64-plane projection serves both: tables 0..3 ARE m3's L=4
        // (the per-plane sign formula is per-p, unchanged). mbk feeds two
        // candidate plans — persisted, released via liveRecall.
        val proj = el.crossJoin(broadcast(s.range(0, 64).toDF("p")))
          .groupBy(col("vec_id"), col("p"))
          .agg(sum(when((col("p") * 1103515245L + col("i") * 12345L) % 97 < 48,
            col("q")).otherwise(-col("q"))).as("proj"))
        val mbk = proj
          .select(col("vec_id"), (col("p") / 8).cast("int").as("tbl"),
            col("p"), when(col("proj") >= 0, "1").otherwise("0").as("bit"))
          .groupBy("vec_id", "tbl")
          .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(p, bit))), x -> x.bit))")
            .as("bucket"))
          .persist()
        def multiCandAt(tables: Int): DataFrame = {
          val b = mbk.filter(col("tbl") < tables)
          b.filter(col("vec_id") < 50).as("q")
            .join(b.as("c"), col("q.tbl") === col("c.tbl") &&
              col("q.bucket") === col("c.bucket") &&
              col("c.vec_id") =!= col("q.vec_id"))
            .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"))
            .distinct()
        }
        val multiCand = multiCandAt(4)
        val multi8Cand = multiCandAt(8)
        // m4/m5: x27's computed IVF at nprobe=2 and 4 — the recall/cost
        // knob itself, measured (one shared assignment pass)
        val assign = ivfAssign(el, n2, el)
        def ivfCandAt(nprobe: Int): DataFrame =
          broadcast(ivfProbes(el, n2, el.filter(col("vec_id") < 50), nprobe))
            .join(assign, "cid")
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id").as("nid"))
        // m6: the nprobe=2 probe set served from the persisted lake index —
        // partition-pruning assertions included (ivfLakeCandidates); must
        // reproduce m4 exactly or index maintenance broke
        val wh = ivfLakeWarehouse(s, dir, el, n2)
        val lakeCand = ivfLakeCandidates(s, wh,
          ivfProbes(el, n2, el.filter(col("vec_id") < 50), 2), "x62")
        // score ALL seven methods in ONE tagged pass: candidate sets union
        // with a method tag, dot products + per-(method, query) top-3 are
        // a single plan, candidate budgets one aggregate, recall one
        // grid-join aggregate — ~4 actions where one-plan-per-method was
        // ~15 (the audit's wall time is job overhead, not data, at any
        // sf). m1 rides the same pass with exactTop as its candidate set
        // (re-ranking the exact top-k IS the identity — the audit audits
        // itself), and the union is PERSISTED because two actions consume
        // it (the budget count and the scoring pass).
        val methods = Seq("m1_exact" -> exactTop,
          "m2_lsh8" -> lshCand, "m3_lsh_multi" -> multiCand,
          "m4_ivf2" -> ivfCandAt(2), "m5_ivf4" -> ivfCandAt(4),
          "m6_ivf_lake" -> lakeCand, "m7_lsh_multi8" -> multi8Cand)
        val tagged = methods.map { case (m, c) =>
          c.select(lit(m).as("method"), col("qid"), col("nid")) }
          .reduce(_ unionByName _).persist()
        liveRecall.put(s, Seq(exactTop, tagged, mbk))
        // m1's reported budget is the brute-force cost (nVec-1 per query),
        // not the size of its precomputed shortcut input
        val candTotals = tagged.groupBy("method").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap +
          ("m1_exact" -> nQ * (nVec - 1))
        val dots = tagged
          .join(el.as("a"), col("a.vec_id") === col("qid"))
          .join(el.as("b"),
            col("b.vec_id") === col("nid") && col("b.i") === col("a.i"))
          .groupBy("method", "qid", "nid")
          .agg(sum(col("a.q") * col("b.q")).as("dp"))
        // per-(method, qid) top-3 via the typed TopKAggregator, keyed on
        // the composite group — the denseTopK shape: k pairs per partition
        // per group cross the shuffle; no group (a method's per-query
        // candidate set) is ever sorted in one task
        val tops = {
          import s.implicits._
          val topkAgg = new graft.functions.TopKAggregator(k).toColumn
          dots
          .join(n2.as("na"), col("qid") === col("na.vec_id"))
          .join(n2.as("nb"), col("nid") === col("nb.vec_id"))
            .select(col("method"), col("qid"), col("nid"),
              cosine(col("dp"), col("na.nn"), col("nb.nn")).as("cos_sim"))
            .as[(String, Long, Long, Double)]
            .groupByKey(r => (r._1, r._2))
            .mapValues(r => (r._4, r._3))
            .agg(topkAgg.name("topk"))
            .flatMap { case ((m, qid), top) => top.map(p => (m, qid, p._2)) }
            .toDF("method", "qid", "nid")
        }
        // (method x query) grid left-joined with hits: zero-hit queries
        // count toward the mean instead of vanishing
        val mdf = s.createDataset(methods.map(_._1))(
          org.apache.spark.sql.Encoders.STRING).toDF("method")
        val hits = exactTop.join(tops, Seq("qid", "nid"))
          .groupBy("method", "qid").agg(count(lit(1)).as("hits"))
        val xq = exactTop.groupBy("qid").agg(count(lit(1)).as("kq"))
        val candTotalCol = candTotals.foldLeft(lit(0L)) {
          case (acc, (m, n)) => when(col("method") === m, lit(n)).otherwise(acc)
        }
        val methodRows = xq.crossJoin(broadcast(mdf))
          .join(hits, Seq("method", "qid"), "left")
          .select(col("method"), col("kq"),
            coalesce(col("hits"), lit(0L)).as("hits"))
          .groupBy("method")
          .agg(count(lit(1)).as("nq"),
            sum(expr("hits * 1000000L DIV kq")).as("rsum"))
          .select(col("method"), col("nq").as("n_queries"),
            candTotalCol.as("total_candidates"),
            expr("rsum DIV nq").as("mean_recall_1e6"))
        methodRows.orderBy("method")
      }),

    // Embedding-cosine near-dup pairs, blocked by label (block key stands in
    // for the coarse-quantizer cell an IVF index would assign at scale).
    QDef(
      "x5_dedup_embedding",
      Some(s"""WITH $elementsSql,
              |dots AS (
              |  SELECT a.vec_id v1, b.vec_id v2, CAST(SUM(a.q*b.q) AS BIGINT) dp
              |  FROM el a JOIN el b ON a.i = b.i AND a.label = b.label AND a.vec_id < b.vec_id
              |  WHERE a.label = 0
              |  GROUP BY 1, 2)
              |SELECT v1, v2, CAST(dp AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cos_sim
              |FROM dots JOIN n2 na ON na.vec_id = v1 JOIN n2 nb ON nb.vec_id = v2
              |WHERE CAST(dp AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) >= 0.3
              |ORDER BY v1, v2""".stripMargin),
      (s, dir) => {
        val el = elements(s, dir).filter(col("label") === 0)
        val n2 = norms(elements(s, dir))
        val dots = el.as("a")
          .join(el.as("b"),
            col("a.i") === col("b.i") && col("a.label") === col("b.label")
              && col("a.vec_id") < col("b.vec_id"))
          .groupBy(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
          .agg(sum(col("a.q") * col("b.q")).as("dp"))
        dots
          // n2 is corpus-sized — no forced broadcast (guide §3.1); AQE
          // runtime-broadcasts it at test scale, shuffles it at 100 TB
          .join(n2.as("na"), col("v1") === col("na.vec_id"))
          .join(n2.as("nb"), col("v2") === col("nb.vec_id"))
          .select(col("v1"), col("v2"),
            cosine(col("dp"), col("na.nn"), col("nb.nn")).as("cos_sim"))
          .filter(col("cos_sim") >= 0.3)
          .orderBy("v1", "v2")
      }),

    // Symmetric int8 embedding quantization — the storage-compression step
    // of a production ANN pipeline (4x smaller vectors before indexing):
    // per-vector scale = max|x|, code_i = round(x_i/scale*127), emitted
    // with exact integer checksums and the max reconstruction error.
    // Entirely ROW-LOCAL (higher-order array functions, zero shuffle, no
    // explode): the 100 TB shape is a map-only pass. Cross-engine
    // determinism: every arithmetic step is a single IEEE-754 double op in
    // a fixed order (cast, /, *, +0.5, floor) and max/sum folds are exact,
    // so DuckDB reproduces the codes bit-for-bit — no dsum needed.
    QDef(
      "x31_embedding_quantize",
      Some("""WITH s AS (
             |  SELECT vec_id,
             |    list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS scale,
             |    embedding
             |  FROM embeddings WHERE len(embedding) > 0),
             |c AS (
             |  SELECT vec_id, scale,
             |    list_transform(embedding, v -> CASE WHEN scale = 0 THEN 0
             |      ELSE CAST(floor(CAST(v AS DOUBLE) / scale * 127.0 + 0.5) AS BIGINT) END) AS codes,
             |    embedding
             |  FROM s)
             |SELECT vec_id, scale,
             |  CAST(len(codes) AS INT) AS n_dims,
             |  CAST(list_sum(codes) AS BIGINT) AS sum_code,
             |  list_max(list_transform(range(1, len(embedding)+1),
             |    i -> abs(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             |             - codes[CAST(i AS INT)] * scale / 127.0))) AS max_abs_err
             |FROM c ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        // zero-length vectors are excluded on BOTH sides: Spark's aggregate
        // folds them to 0.0 where DuckDB's list_max yields NULL — the one
        // edge where the otherwise bit-identical arithmetic diverges.
        // (Fixture elements are non-null FLOATs by schema; a NULL element
        // would diverge the same way and belongs to a cleaning pass.)
        t(s, dir, "embeddings")
          .filter(size(col("embedding")) > 0)
          .select(col("vec_id"),
            expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
              "(m, v) -> greatest(m, abs(CAST(v AS DOUBLE))))").as("scale"),
            col("embedding"))
          .select(col("vec_id"), col("scale"),
            expr("transform(embedding, v -> CASE WHEN scale = 0D THEN 0L " +
              "ELSE CAST(floor(CAST(v AS DOUBLE) / scale * 127.0D + 0.5D) AS LONG) " +
              "END)").as("codes"),
            col("embedding"))
          .select(col("vec_id"), col("scale"),
            expr("size(codes)").as("n_dims"),
            expr("aggregate(codes, 0L, (a, c) -> a + c)").as("sum_code"),
            expr("aggregate(zip_with(embedding, codes, " +
              "(v, c) -> abs(CAST(v AS DOUBLE) - c * scale / 127.0D)), " +
              "CAST(0.0 AS DOUBLE), (m, e) -> greatest(m, e))").as("max_abs_err"))
          .orderBy("vec_id")),

    // Distributed k-means over the embedding column (round 10) — the
    // semantic-clustering pass curation pipelines run before SemDeDup-style
    // per-cluster dedup or cluster-balanced sampling. Two deterministic
    // Lloyd iterations: seed centroids = the k lowest vec_ids, assignment =
    // exact argmin of squared L2 in MICRO-QUANTIZED integer space (every
    // distance a sum of long products — no float accumulation order to
    // diverge between engines), recompute = per-(cluster, dim) integer
    // mean. Ties break to the lowest centroid id in both engines.
    //
    // Scale design (MLlib's own shape): centroids live on the driver and
    // broadcast as a k x d literal (bounded, never data-sized); assignment
    // is a row-local codegen'd fold — zero shuffle; the centroid update
    // shuffles only k x d partial sums per map task (posexplode feeds a
    // map-side-combined groupBy), not the data. The iter-1 assignment is
    // persisted so iteration 2 starts from memory, not a rescan.
    QDef(
      "x36_kmeans_cluster",
      Some("""WITH e AS (SELECT vec_id,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)) AS q
             |  FROM embeddings),
             |ed AS (SELECT vec_id, CAST(i AS INT) AS dim, q[CAST(i AS INT)] AS xq
             |       FROM e, unnest(generate_series(1, 64)) t(i)),
             |c1 AS (SELECT vec_id AS cid, dim, xq AS cq FROM ed WHERE vec_id < 8),
             |d1 AS (SELECT ed.vec_id, c1.cid, SUM((ed.xq - c1.cq)*(ed.xq - c1.cq)) AS d
             |       FROM ed JOIN c1 USING (dim) GROUP BY 1, 2),
             |a1 AS (SELECT vec_id, cid AS c1 FROM (
             |    SELECT vec_id, cid,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
             |    FROM d1) WHERE rn = 1),
             |c2 AS (SELECT a1.c1 AS cid, ed.dim,
             |         CAST(floor(CAST(SUM(ed.xq) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cq
             |       FROM ed JOIN a1 USING (vec_id) GROUP BY 1, 2),
             |d2 AS (SELECT ed.vec_id, c2.cid, SUM((ed.xq - c2.cq)*(ed.xq - c2.cq)) AS d
             |       FROM ed JOIN c2 USING (dim) GROUP BY 1, 2),
             |a2 AS (SELECT vec_id, cid AS c2, CAST(d AS BIGINT) AS d2 FROM (
             |    SELECT vec_id, cid, d,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
             |    FROM d2) WHERE rn = 1)
             |SELECT a1.vec_id, a1.c1 AS cluster_iter1, a2.c2 AS cluster_iter2,
             |  a2.d2 AS dist_sq_q
             |FROM a1 JOIN a2 USING (vec_id) ORDER BY vec_id""".stripMargin),
      (s, dir) => {
        val k = 8
        val qdf = t(s, dir, "embeddings").select(col("vec_id"), microQ.as("q"))
        // bounded driver reads: k seed vectors, then k x d centroid stats —
        // never O(data); this is how Lloyd's iterates on any Spark cluster
        val seeds = qdf.filter(col("vec_id") < k).orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1)))
        // release the PREVIOUS invocation's persisted assignment before
        // building the replacement (see liveKmeans)
        Option(liveKmeans.remove(s)).foreach(_.unpersist())
        val a1 = assignToCentroids(qdf, seeds.toSeq, "d1")
          .withColumnRenamed("cid", "c1").persist()
        liveKmeans.put(s, a1)
        val cents2 = a1
          .select(col("c1"), posexplode(col("q")).as(Seq("dim", "xq")))
          .groupBy("c1", "dim")
          .agg(expr("CAST(floor(CAST(SUM(xq) AS DOUBLE) / COUNT(*)) AS BIGINT)")
            .as("cq"))
          .collect()
          .groupBy(_.getLong(0)).toSeq
          .map { case (cid, rows) =>
            (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq) }
          .sortBy(_._1)
        assignToCentroids(a1.drop("d1"), cents2, "d2")
          .select(col("vec_id"), col("c1").as("cluster_iter1"),
            col("cid").as("cluster_iter2"), col("d2").as("dist_sq_q"))
          .orderBy("vec_id")
      }),

    // SemDeDup (round 11): per-CLUSTER embedding dedup — the composition
    // curation teams actually run (Abbas et al.): cluster the corpus
    // (x36's k-means stage), then WITHIN each cluster greedily keep the
    // first vector (vec_id order) of every near-duplicate neighborhood and
    // drop later vectors whose cosine to a KEPT representative exceeds
    // tau, with evidence (the lowest kept representative's id).
    //
    // Scale shape: comparisons are CLUSTER-LOCAL by construction — the
    // pairwise join's key IS the cluster id, so cost is sum(|cluster|^2),
    // never corpus^2 (that bound is SemDeDup's entire point; PlanSpec
    // "x41: SemDeDup — every join is cluster-keyed" asserts it on the
    // executed plan: each join node keyed on the cluster id, no
    // BroadcastNestedLoopJoin/CartesianProduct anywhere). The per-cluster
    // near-pair array is capped (graft.x41.predsCap) with a loud refusal:
    // a near-duplicate-saturated mega-cluster would otherwise materialize
    // O(|cluster|^2) pair structs in ONE row — the remedy is finer
    // clustering (more centroids), which is also what SemDeDup's cost
    // bound assumes. The greedy keep-set fold is
    // row-local per cluster over rank order. Deterministic cross-engine:
    // assignment in micro-quantized integer space (x36), cosine in 20-bit
    // fixed point (x5/x6's bit-identical double formulation), greedy
    // replayed by the oracle as a recursive CTE.
    QDef(
      "x41_semdedup",
      Some(s"""WITH RECURSIVE $elementsSql,
              |q6 AS (SELECT vec_id,
              |    list_transform(embedding,
              |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT)) AS q
              |  FROM embeddings),
              |ed AS (SELECT vec_id, CAST(i AS INT) AS dim, q[CAST(i AS INT)] AS xq
              |       FROM q6, unnest(generate_series(1, 64)) t(i)),
              |c1 AS (SELECT vec_id AS cid, dim, xq AS cq FROM ed WHERE vec_id < 8),
              |d1 AS (SELECT ed.vec_id, c1.cid, SUM((ed.xq - c1.cq)*(ed.xq - c1.cq)) AS d
              |       FROM ed JOIN c1 USING (dim) GROUP BY 1, 2),
              |a1 AS (SELECT vec_id, cid AS cluster FROM (
              |    SELECT vec_id, cid,
              |      row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
              |    FROM d1) WHERE rn = 1),
              |ranked AS (SELECT vec_id, cluster,
              |    row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rn
              |  FROM a1),
              |dots AS (
              |  SELECT ra.cluster, ra.rn AS ra, rb.rn AS rb, ra.vec_id AS va,
              |    rb.vec_id AS vb, CAST(SUM(ea.q*eb.q) AS BIGINT) AS dp
              |  FROM ranked ra JOIN ranked rb
              |    ON ra.cluster = rb.cluster AND ra.rn < rb.rn
              |  JOIN el ea ON ea.vec_id = ra.vec_id
              |  JOIN el eb ON eb.vec_id = rb.vec_id AND eb.i = ea.i
              |  GROUP BY 1, 2, 3, 4, 5),
              |pairs AS (
              |  SELECT d.cluster, d.rb, d.ra, d.va
              |  FROM dots d JOIN n2 na ON na.vec_id = d.va
              |  JOIN n2 nb ON nb.vec_id = d.vb
              |  WHERE CAST(dp AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) > 0.3),
              |preds AS (SELECT cluster, rb, list(ra) AS ras FROM pairs GROUP BY 1, 2),
              |sizes AS (SELECT cluster, MAX(rn) AS n FROM ranked GROUP BY 1),
              |g AS (
              |  SELECT cluster, CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS kept
              |  FROM sizes
              |  UNION ALL
              |  SELECT g.cluster, g.rn + 1,
              |    CASE WHEN p.ras IS NOT NULL
              |              AND len(list_intersect(p.ras, g.kept)) > 0
              |         THEN g.kept ELSE list_append(g.kept, g.rn + 1) END
              |  FROM g JOIN sizes s ON s.cluster = g.cluster
              |  LEFT JOIN preds p ON p.cluster = g.cluster AND p.rb = g.rn + 1
              |  WHERE g.rn < s.n),
              |kf AS (SELECT g.cluster, g.kept
              |       FROM g JOIN sizes s ON s.cluster = g.cluster AND g.rn = s.n),
              |ev AS (SELECT p.cluster, p.rb, MIN(p.va) AS dup_of
              |       FROM pairs p JOIN kf ON kf.cluster = p.cluster
              |       WHERE list_contains(kf.kept, p.ra)
              |       GROUP BY 1, 2)
              |SELECT r.vec_id, r.cluster, list_contains(kf.kept, r.rn) AS keep,
              |  ev.dup_of
              |FROM ranked r JOIN kf ON kf.cluster = r.cluster
              |LEFT JOIN ev ON ev.cluster = r.cluster AND ev.rb = r.rn
              |ORDER BY r.vec_id""".stripMargin),
      (s, dir) => {
        val k = 8
        val tau = 0.3
        graft.functions.GraftFunctions.register(s) // idempotent
        val qdf = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), microQ.as("q"))
        val seeds = qdf.filter(col("vec_id") < k).orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](2)))
        Option(liveKmeans.remove(s)).foreach(_.unpersist())
        // clustering stage: one row-local argmin pass (zero shuffle);
        // persisted because three downstream legs reuse it
        val ranked = assignToCentroids(qdf, seeds.toSeq, "d1")
          .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("cluster").orderBy("vec_id")).cast("long"))
          .persist()
        liveKmeans.put(s, ranked)
        val a = ranked.select(col("cluster"), col("rn").as("ra"),
          col("vec_id").as("va"), col("embedding").as("ea"))
        val b = ranked.select(col("cluster"), col("rn").as("rb"),
          col("embedding").as("eb"))
        // CLUSTER-LOCAL pairwise: the equi-join key IS the cluster id, so
        // no comparison ever crosses clusters; quantized_cosine is the
        // codegen'd native expression (x13's), bit-identical to the
        // oracle's fixed-point double formulation
        val pairs = a.join(b, Seq("cluster"))
          .filter(col("ra") < col("rb"))
          .filter(call_function("quantized_cosine", col("ea"), col("eb")) > tau)
          .select(col("cluster"), col("rb"), col("ra"), col("va"))
        val sizes = ranked.groupBy("cluster").agg(max("rn").as("n"))
        // bounded-cluster contract, enforced in-query at zero added cost
        // (the size check rides the same aggregation): one saturated
        // mega-cluster would put O(|cluster|^2) pair structs in a single
        // row — refuse loudly with the remedy instead of OOMing a task
        val predsCap = s.conf.get("graft.x41.predsCap", "1000000").toInt
        val preds = pairs.groupBy("cluster")
          .agg(collect_list(struct(col("rb"), col("ra"))).as("preds0"))
          .select(col("cluster"),
            when(size(col("preds0")) <= predsCap, col("preds0"))
              .otherwise(raise_error(concat(
                lit("x41: cluster "), col("cluster"), lit(" holds "),
                size(col("preds0")),
                lit(s" near-duplicate pairs, over graft.x41.predsCap=" +
                  s"$predsCap — re-cluster with more centroids (smaller " +
                  "clusters) or raise the cap")))).as("preds"))
        // greedy keep-set per cluster, ROW-LOCAL: fold rank order once,
        // keeping r iff no already-kept predecessor is near it. A cluster
        // with no near pairs has NULL preds -> exists() yields NULL ->
        // IF takes the else branch -> every rank kept (no coalesce needed).
        val keptSets = sizes.join(preds, Seq("cluster"), "left")
          .withColumn("kept", expr(
            """aggregate(sequence(1L, n), CAST(array() AS ARRAY<BIGINT>),
              |  (kept, r) -> IF(exists(preds, p -> p.rb = r
              |                    AND array_contains(kept, p.ra)),
              |    kept, concat(kept, array(r))))""".stripMargin))
          .select(col("cluster"), col("kept"))
        val flagged = ranked.join(keptSets, Seq("cluster"))
          .withColumn("keep", array_contains(col("kept"), col("rn")))
        // evidence: the lowest KEPT representative each dropped vector is
        // near (kept rows have none by the greedy invariant)
        val evidence = pairs.join(keptSets, Seq("cluster"))
          .filter(array_contains(col("kept"), col("ra")))
          .groupBy(col("cluster").as("ec"), col("rb"))
          .agg(min(col("va")).as("dup_of"))
        flagged.join(evidence,
            flagged("cluster") === evidence("ec") && flagged("rn") === evidence("rb"),
            "left")
          .select(col("vec_id"), col("cluster"), col("keep"), col("dup_of"))
          .orderBy("vec_id")
      })
  )
}
