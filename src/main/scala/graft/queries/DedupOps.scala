package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QUtil._

/** Deduplication operators over the `documents` table: exact (hash-groupBy),
  * MinHash+LSH banding, SimHash bit-vectors, and n-gram Jaccard verification.
  *
  * Scale design (100 TB): exact dedup and MinHash signatures are one
  * map-side-combinable shuffle each; LSH banding turns all-pairs comparison
  * into an equi-join on (band, bucket), so cost tracks the number of genuine
  * candidate pairs instead of n^2. The direct all-pairs Jaccard (x4) is the
  * verification/oracle path — at scale it runs only on LSH candidates (x2).
  * Hash functions are md5/lexicographic-min so the DuckDB oracle reproduces
  * them exactly.
  */
object DedupOps {

  /** Where x46 materializes its per-image perceptual hashes: written by
    * the Spark query, read back by the same query AND by the DuckDB
    * oracle (which replays banding + Hamming verification over the
    * identical bytes — the x26b fixture pattern). Derived from the one
    * shared QUtil.WarehouseRoot constant, declared ABOVE the query list
    * (Scala textual object-init order; a computed val referenced from
    * the oracle-string interpolation below must exist first).
    */
  private[graft] final val X46HashTag = "x46_image_hashes"
  private[graft] final val X46HashFixture = QUtil.fixturePath(X46HashTag)

  /** x49's own hash fixture (memoized per JVM/sf via cachedFixture — the
    * hash table is FIXTURE for the similarity op, so Bench measures the
    * search, not the render; separate tag from x46 so the two queries
    * stay self-contained whatever order they run in).
    */
  private[graft] final val X49HashTag = "x49_image_hashes"
  private[graft] final val X49HashFixture = QUtil.fixturePath(X49HashTag)

  /** x51's audio-fingerprint fixture — same contract as [[X46HashFixture]]:
    * written fresh by the Spark query, read back by it AND by the DuckDB
    * oracle.
    */
  private[graft] final val X51HashTag = "x51_audio_hashes"
  private[graft] final val X51HashFixture = QUtil.fixturePath(X51HashTag)

  /** x64b's SKEWED corpus fixture: the documents table with one
    * boilerplate sentence appended to every fifth document, so ONE shingle
    * ("bq0 bq1 bq2") carries frequency ~N/5 — the hot-key shape (shared
    * legal footer / site chrome) that makes the brute shingle self-join
    * quadratic and that x64's prefix filter exists to survive. Written by
    * the Spark query, read back by it AND by the DuckDB oracle (the
    * x26b/x46 fixture pattern).
    */
  private[graft] final val X64bTag = "x64b_skew_docs"
  private[graft] final val X64bFixture = QUtil.fixturePath(X64bTag)

  /** Per-probe k-nearest by Hamming distance (ascending, ties n_id asc)
    * via the typed TopKLongAggregator — NOT a window: a per-probe window
    * is a one-task sort of that probe's whole candidate set (corpus-sized
    * for the brute-force top-k operators), while the partial/final
    * object-hash aggregate moves k pairs per partition per probe over the
    * shuffle. The aggregator keeps the k BEST (score desc, id asc) pairs,
    * so the ascending distance rides in NEGATED (score = -hamming) — same
    * rows, same tie-breaks as the oracles' `ORDER BY hamming, n_id`
    * row_number. Input: (q_id, n_id, hamming Int). Output:
    * (q_id, rank Int, n_id, hamming Int), rank 1-based in rank order.
    */
  private def hammingTopK(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val topk = new graft.functions.TopKLongAggregator(k).toColumn
    scored
      .select(col("q_id"), (-col("hamming")).cast("long").as("negd"), col("n_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("topk"))
      .flatMap { case (q, top) =>
        top.zipWithIndex.map { case ((negd, nid), i) =>
          (q, i + 1, nid, (-negd).toInt)
        }
      }
      .toDF("q_id", "rank", "n_id", "hamming")
  }

  /** Deterministic per-document audio fingerprints (the audio analog of
    * [[imageHashes]]: doc_id/3 names the tune, doc_id%3 the encoding
    * variant — 8 kHz original, 11.025 kHz resample, half volume — the
    * re-encode classes an audio corpus dedups across). A real pipeline
    * reads its payload column here instead.
    */
  private def audioHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val payload = (id % 3) match {
            case 0 => Multimodal.renderWav(id / 3, 8000)
            case 1 => Multimodal.renderWav(id / 3, 11025)
            case _ => Multimodal.renderWav(id / 3, 8000, volumePct = 50)
          }
          val h = Multimodal.aHash64(payload).getOrElse(
            throw new IllegalStateException(
              s"undecodable fixture audio for doc $id"))
          (id, h)
        }
      }.toDF("doc_id", "ahash")
  }

  /** x52's video-fingerprint fixture — same contract as [[X46HashFixture]]:
    * written fresh by the Spark query, read back by it AND by the DuckDB
    * oracle. Long format: one row per (doc_id, slot) with that sampled
    * frame's 64-bit hash.
    */
  private[graft] final val X52HashTag = "x52_video_hashes"
  private[graft] final val X52HashFixture = QUtil.fixturePath(X52HashTag)

  /** Deterministic per-document video fingerprints (the video analog of
    * [[imageHashes]]: doc_id/3 names the motion clip, doc_id%3 the encoding
    * variant — 6-frame original, 9-frame re-encode, 48px resize — the
    * re-encode classes a video corpus dedups across). 4 sampled-frame
    * hashes per document, exploded row-locally to long format. A real
    * pipeline reads its payload column here instead.
    */
  private def videoHashRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.flatMap { id =>
          val payload = (id % 3) match {
            case 0 => Multimodal.renderVideo(id / 3, 6, 32)
            case 1 => Multimodal.renderVideo(id / 3, 9, 32)
            case _ => Multimodal.renderVideo(id / 3, 6, 48)
          }
          val hs = Multimodal.videoHashes(payload).getOrElse(
            throw new IllegalStateException(
              s"undecodable fixture video for doc $id"))
          hs.iterator.zipWithIndex.map { case (h, slot) => (id, slot, h) }
        }
      }.toDF("doc_id", "slot", "fhash")
  }

  /** Banded 16-bit buckets of a 64-bit perceptual hash: 4 rows per input
    * row, (band, bucket) drawn from the hash's four 16-bit slices — the
    * ONE banding spelling shared by every Hamming-LSH screen (x46 images,
    * x50 image decontamination, x51 audio, x52 video, st15 streaming
    * ingest), so their candidate spaces cannot drift apart. `keep` lists
    * the columns to carry through (include the hash column itself when
    * the consumer verifies exactly).
    */
  private[graft] def hammingBands(df: DataFrame, hashCol: String,
      keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+
      explode(array((0 to 3).map(i => struct(lit(i).as("band"),
        shiftright(col(hashCol), 16 * i).bitwiseAND(lit(65535L))
          .as("bucket"))): _*)).as("bb"): _*)
      .select(keep.map(col) :+ col("bb.band").as("band") :+
        col("bb.bucket").as("bucket"): _*)

  /** Deterministic per-document image hashes (the x46 corpus convention:
    * doc_id/3 names the scene, doc_id%3 the container/size/brightness
    * variant), shared by the image dedup and image similarity operators.
    * A real pipeline reads its payload column here instead.
    */
  private[graft] def imageHashes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // decode init lives HERE, once per partition (ImageIO readers are
        // cheap; a JNI codec would not be)
        it.map { id =>
          val payload = (id % 3) match {
            case 0 => Multimodal.renderImage(id / 3, 32, "png")
            case 1 => Multimodal.renderImage(id / 3, 48, "png", brightness = 2)
            case _ => Multimodal.renderImage(id / 3, 32, "jpg")
          }
          val h = Multimodal.dHash64(payload).getOrElse(
            // a corpus image that fails to decode is a data bug, not a
            // silent skip — the fixture generator must always decode
            throw new IllegalStateException(
              s"undecodable fixture image for doc $id"))
          (id, h)
        }
      }.toDF("doc_id", "dhash")
  }

  // The one live shingle-array cache per session: each new build unpersists
  // the previous one, so repeated dedup queries cannot accumulate cached
  // DataFrames across a long session (each query's own execution happens
  // before the next query is constructed).
  private val liveArrays =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  /** Cached per-document shingle arrays; see [[shingles]].
    *
    * The fixture is a single parquet file (one input split), so the
    * tokenize+explode map side would otherwise run on one task; repartition
    * by doc_id first so the expansion is cluster-wide. On a real 100 TB
    * corpus the scan already has thousands of splits and Catalyst drops the
    * extra exchange into the shuffle `distinct` needs anyway.
    */
  private def shingleArrays(s: SparkSession, dir: String): DataFrame =
    shingleArraysOf(s, t(s, dir, "documents"))

  private def shingleArraysOf(s: SparkSession, docs: DataFrame): DataFrame = {
    // Release BEFORE persisting the replacement: a rebuild over the same dir
    // has the same canonicalized plan, so persist() would alias the existing
    // cache entry and unpersisting the old handle afterwards would silently
    // drop the new cache with it.
    releaseArrays(s)
    // All shingles of a document live in one row, so per-doc dedup is
    // array_distinct inside the row (no shuffle), and the per-doc count n
    // rides along row-locally so Jaccard needs no per-doc-count join.
    //
    // The persist at the *array* level is load-bearing twice over: (a) the
    // shingle set is referenced by several joins, and (b) it is a
    // materialization boundary — without it, the `size(arr) > 0` filter that
    // Catalyst infers for the explode gets its `arr` argument inlined by
    // CollapseProject and pushed below the repartition exchange, re-running
    // the whole tokenize+shingle expression many times per document inside
    // the single-input-split scan stage. (At 100 TB this cache would be
    // DISK_ONLY or a staged parquet table.)
    val arrays = docs
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), array_distinct(
        expr("transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")).as("arr"))
      .persist()
    liveArrays.put(s, arrays)
    arrays
  }

  /** Release the session's live shingle cache (for queries that finish all
    * their shingle-reading jobs during construction).
    */
  private def releaseArrays(s: SparkSession): Unit =
    Option(liveArrays.remove(s)).foreach(_.unpersist(false))

  /** Distinct word 3-gram shingles per document (docs with >= 3 tokens). */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    shingleArrays(s, dir)
      .select(col("doc_id"), size(col("arr")).as("n"), explode(col("arr")).as("s"))

  /** DuckDB-side spelling of [[shingles]] over any doc relation (x64b's
    * oracle shingles a materialized fixture instead of `documents`).
    */
  private def shinglesSqlFrom(docsRel: String): String =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') tk FROM $docsRel
      |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    tk[CAST(i AS INT)+1] || ' ' || tk[CAST(i AS INT)+2] || ' ' || tk[CAST(i AS INT)+3] AS s
      |  FROM toks, unnest(range(0, len(tk)-2)) g(i))""".stripMargin

  private val shinglesSql: String = shinglesSqlFrom("documents")

  /** The span-dedup window width (tokens). The ONE k: the Spark pipeline
    * ([[dupSpanWindows]] call sites) and the DuckDB spelling
    * ([[spanCtesSql]], interpolated at object init) both derive from it,
    * so the worklist and the oracle cannot disagree about span width.
    */
  private[graft] final val SpanK = 8

  /** The shared duplicate-SPAN pipeline (x67 detection / x67b rewrite),
    * DuckDB spelling: [[SpanK]]-token sliding windows per document
    * (1-based positions), cross-document duplicates (>= 2 distinct docs),
    * the canonical first occurrence (min (doc_id, position)), and the
    * flagged non-canonical occurrence windows. ONE spelling so the
    * worklist and the rewrite can never disagree about what a duplicated
    * span is.
    */
  private val spanCtesSql: String =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') arr
      |  FROM documents WHERE len(trim(text)) > 0),
      |occ AS (
      |  SELECT doc_id, CAST(p AS BIGINT) p,
      |    array_to_string(arr[p : p+${SpanK - 1}], ' ') s
      |  FROM toks, unnest(range(1, len(arr) - ${SpanK - 2})) g(p)
      |  WHERE len(arr) >= $SpanK),
      |dup AS (SELECT s FROM occ GROUP BY s
      |        HAVING COUNT(DISTINCT doc_id) >= 2),
      |canon AS (
      |  SELECT s, doc_id cd, p cp FROM (
      |    SELECT o.s, o.doc_id, o.p,
      |      row_number() OVER (PARTITION BY o.s ORDER BY o.doc_id, o.p) rn
      |    FROM occ o JOIN dup d ON d.s = o.s) WHERE rn = 1),
      |flagged AS (
      |  SELECT o.doc_id, o.p AS st, o.p + ${SpanK - 1} AS en
      |  FROM occ o JOIN canon c ON c.s = o.s
      |  WHERE NOT (o.doc_id = c.cd AND o.p = c.cp))""".stripMargin

  // session-keyed cache of the exploded span-window occurrence frame
  // (x67/x67b): the tokenize+window expansion feeds the dup aggregate AND
  // the occurrence probe, so without the persist its lineage runs once per
  // consumer; released on the next build (the liveArrays discipline)
  private val liveSpanOcc =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  private def releaseSpanOcc(s: SparkSession): Unit =
    Option(liveSpanOcc.remove(s)).foreach(_.unpersist(false))

  /** (doc_id, arr): whitespace token arrays of non-empty documents — the
    * span-dedup operators' ONE tokenization; span positions are 1-based
    * indexes into `arr`. The repartition is shingleArraysOf's fix for the
    * same shape: a small corpus arrives as ONE parquet split, and without
    * the exchange the whole expansion would run in a single task.
    */
  private[graft] def docTokenArrays(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("arr"))

  /** Flagged duplicate k-token windows (doc_id, st, en): every occurrence
    * of a cross-document duplicated window EXCEPT its canonical (globally
    * first) one — the Spark spelling of [[spanCtesSql]]. Window generation
    * is row-local; duplicate detection and canonical election are ONE
    * map-side-combinable aggregate (min(struct) — never a per-shingle
    * ranking window, which a boilerplate shingle at frequency 10^6 would
    * one-task); flag marking is a shingle-keyed equi-join against the
    * (small) duplicate set.
    */
  private def dupSpanWindows(toks: DataFrame, k: Int): DataFrame = {
    val s = toks.sparkSession
    releaseSpanOcc(s)
    // row-local window generation: guard size >= k BEFORE sequence()
    // (Spark's sequence(1, 0) helpfully counts DOWN). Persisted: two
    // consumers below (the dup aggregate and the occurrence probe).
    val occ = toks.filter(size(col("arr")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(arr) - ${k - 1}),
           |  p -> struct(CAST(p AS BIGINT) AS p,
           |              concat_ws(' ', slice(arr, p, $k)) AS s))"""
          .stripMargin)).as("o"))
      .select(col("doc_id"), col("o.p").as("p"), col("o.s").as("s"))
      .persist()
    liveSpanOcc.put(s, occ)
    val dup = occ.groupBy("s")
      .agg(countDistinct(col("doc_id")).as("nd"),
        min(struct(col("doc_id"), col("p"))).as("canon"))
      .filter(col("nd") >= 2)
      .select(col("s"), col("canon.doc_id").as("cd"),
        col("canon.p").as("cp"))
    occ.join(dup, "s")
      .filter(!(col("doc_id") === col("cd") && col("p") === col("cp")))
      .select(col("doc_id"), col("p").as("st"),
        (col("p") + (k - 1)).as("en"))
  }

  /** The prefix-filtered EXACT set-similarity self-join at τ = 3/5 over a
    * per-doc shingle-array frame — x64's pipeline, shared verbatim with
    * the skewed-fixture variant x64b (one spelling, two corpora). Returns
    * (candidates, verified): `candidates` is the (d1, d2) prefix-join
    * output BEFORE verification (the quantity the crossover bound
    * measures), `verified` the exact final answer
    * (d1, d2, o, n1, n2, jaccard). Completeness theorem and cost argument:
    * x64's QDef header.
    */
  private def prefixSimJoin(arrs: DataFrame): (DataFrame, DataFrame) = {
    val sh = arrs.select(col("doc_id"), size(col("arr")).as("n"),
      explode(col("arr")).as("s"))
    // global order: frequency ascending (rarest first), shingle value
    // tie-break — ONE map-side-combinable aggregate + a linear join,
    // vs the full join's quadratic-in-frequency blowup
    val freq = sh.groupBy("s").agg(count(lit(1)).as("f"))
    // per-doc prefix: one shuffle back to doc grain, then the sort and
    // the cut are ROW-LOCAL (sort_array over the doc's own (f, s)
    // pairs + slice) — a window would sort whole partitions to rank
    // what is a per-document order. Prefix length is the
    // integer-exact n - ceil(3n/5) + 1, with ceil(3n/5) = (3n+4) DIV 5
    // — never an FP ceil, whose ulp error could shorten the prefix
    // and break the completeness theorem.
    val prefix = sh.join(freq, "s")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("f"), col("s")))).as("fs"))
      .select(col("doc_id"), size(col("fs")).as("n"), expr(
        "slice(fs, 1, CAST(size(fs) - (3*size(fs) + 4) DIV 5 + 1 AS INT))")
        .as("pfx"))
      .select(col("doc_id"), col("n"), explode(col("pfx")).as("p"))
      .select(col("doc_id"), col("n"), col("p.s").as("s"))
    // candidate pairs: prefix-only self-join (shuffle-keyed on the
    // shingle — statistics predate the explode, so AQE would otherwise
    // "broadcast" an exploded side) + the integer length filter
    val cand = prefix.as("a")
      .join(prefix.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .filter(least(col("a.n"), col("b.n")) * 5 >=
        greatest(col("a.n"), col("b.n")) * 3)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // exact verification, row-local: intersect the two cached shingle
    // arrays per candidate pair — no second corpus-sized join. No
    // join-strategy hint here: the candidate side is usually tiny
    // (near-dup pairs) and AQE's RUNTIME size converts these joins to
    // broadcasts, but a pathological corpus can make it large and the
    // shuffle fallback must stay available.
    val verified = cand
      .join(arrs.select(col("doc_id").as("d1"), col("arr").as("arr1")), "d1")
      .join(arrs.select(col("doc_id").as("d2"), col("arr").as("arr2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("arr1"), col("arr2"))).cast("long").as("o"),
        size(col("arr1")).cast("long").as("n1"),
        size(col("arr2")).cast("long").as("n2"))
      .filter(col("o") * 8 >= (col("n1") + col("n2")) * 3)
      .withColumn("jaccard",
        col("o").cast("double") / (col("n1") + col("n2") - col("o")))
    (cand, verified)
  }

  /** Pairwise Jaccard via one self-equi-join on the shingle value: the join
    * key is hash-partitionable, the groupBy has map-side partial
    * aggregation, and because each shingle row carries its document's total
    * count `n`, the Jaccard denominator falls out of the same aggregate —
    * no per-doc-count join, no broadcast, no extra job. Cost tracks the
    * number of genuinely colliding pairs rather than |docs|^2.
    *
    * The shuffle_hash hint matters: statistics at plan time predate the
    * shingle explosion, so AQE would otherwise "broadcast" the smaller-
    * looking side — a driver-side build of the whole exploded shingle set.
    * Forcing a shuffled hash join keys both sides on `s`, which is exactly
    * the partitioning that scales.
    */
  /** Memoized [[clusterLabels]] per (session, dir) — x29's operator is the
    * SELECTION over clusters, so its benchmark measures that, not a rerun
    * of x16's clustering (the same fixture convention as cachedFixture /
    * the shingle-array cache). x16 itself always computes fresh: the
    * clustering IS its operator.
    */
  private val liveLabels =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def clusterLabelsCached(s: SparkSession, dir: String): DataFrame =
    liveLabels.computeIfAbsent((s, dir), _ => clusterLabels(s, dir).localCheckpoint())

  /** Memoized IMAGE near-dup drop set per (session, dir) — the x57
    * decision (cluster + keep-highest-degree), consumed by the composed
    * x60 pipeline the way x29 consumes [[clusterLabelsCached]]: the
    * composition's benchmark measures the composition, not a rerun of
    * x57's clustering (which always computes fresh — the clustering IS
    * its operator). One column: `dup_doc`, the ids the decision drops.
    */
  private val liveImgDrops =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def imageDupDropsCached(s: SparkSession, dir: String): DataFrame =
    liveImgDrops.computeIfAbsent((s, dir), _ => {
      val wh = cachedFixture(s, X49HashTag, dir) { w =>
        QUtil.writeSized(imageHashes(s, dir), w)
      }
      val b = hammingBands(s.read.parquet(wh), "dhash", Seq("doc_id", "dhash"))
      val edges = b.as("x")
        .join(b.as("y"),
          col("x.band") === col("y.band") &&
            col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))) <= 6)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
        .localCheckpoint()
      val lab = componentLabels(edges)
      val deg = edges.unionByName(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        .groupBy(col("d1").as("doc")).agg(count(lit(1)).as("degree"))
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy(col("degree").desc, col("doc"))
      lab.select(col("doc"), col("label").as("cluster_id"))
        .join(deg, "doc")
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") =!= 1)
        .select(col("doc").as("dup_doc"))
        .localCheckpoint()
    })

  /** Connected-component labels over the >=0.8-Jaccard near-dup graph:
    * (doc, label) with label = the component's minimum doc_id. Shared by
    * x16 (the labels themselves) and x29 (representative selection).
    */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    // Materialize the edge list ONCE and cut its lineage: every loop
    // round (and the final result) re-references the edges, and without
    // the checkpoint each reference re-plans the whole shingle/Jaccard
    // pipeline — the per-round plans grow with the loop and re-walking
    // them is what a long, cache-churned session amplifies. The edge
    // list itself is tiny at any scale (near-dup pairs), so this
    // truncation is cheap and the loop afterwards touches only it.
    val edges = pairJaccard(sh, sh)
      .filter(col("jaccard") >= 0.8)
      .select(col("d1"), col("d2"))
      .localCheckpoint() // eager: runs the Jaccard pipeline here
    // ... which also means the shingle cache is no longer needed
    releaseArrays(s)
    componentLabels(edges)
  }

  /** Min-label propagation over an already-materialized (d1, d2) edge
    * list: (doc, label) with label = the component's minimum member id.
    * The iterative core shared by the text (x16/x29) and image (x57)
    * clustering operators — the edge list must have its lineage cut
    * (localCheckpoint) BEFORE entry, since every round re-references it.
    * Cost O(rounds x edges), rounds ≈ component diameter — the GraphX
    * shape, over edge lists that are tiny (near-dup pairs) at any scale.
    */
  /** One low-shuffle-partition session CLONE per SparkContext, for
    * [[componentLabels]]'s O(diameter) tiny-job loop — cached because a
    * clone's session state/listeners live on the shared context for its
    * lifetime (a clone per call would accumulate unboundedly).
    */
  private val lowPartSessions =
    new java.util.concurrent.ConcurrentHashMap[
      org.apache.spark.SparkContext, SparkSession]()

  private def componentLabels(edges: DataFrame): DataFrame = {
    // The loop runs O(diameter) tiny jobs over a near-dup-pair edge list;
    // at the session's shuffle-partition count most tasks are empty and
    // per-round scheduling overhead dominates (measured 10+ s for ~8
    // rounds on a 5k-edge graph at 32 partitions vs ~2 s at 4). Pin the
    // loop's partitioning to the data size — in a CLONED session (shared
    // SparkContext, independent SQL conf), so a query running concurrently
    // on the caller's session never silently plans with 4 shuffle
    // partitions. The edge list is already localCheckpointed, so re-homing
    // it into the clone via its materialized RDD is free; the returned
    // labels re-home into the caller's session the same way. A 100 TB run
    // sizes this to its real edge volume; the result's partitioning is
    // irrelevant to callers (both consumers re-shuffle by cluster/doc).
    val caller = edges.sparkSession
    // newSession(): shared SparkContext, ISOLATED SQL conf — the loop only
    // computes conf-insensitive long joins/aggregates, so inheriting the
    // builder defaults (rather than the caller's live conf) is safe.
    // ONE cached clone per SparkContext (the livePost/liveKmeans map
    // discipline): every newSession() registers session state/listeners on
    // the shared context and never releases them, so a per-call clone
    // leaks across the hundreds of x1/x2/x16/x29/x57 invocations of a
    // long Verify/Bench session.
    // evict clones of STOPPED contexts first: a JVM that restarts Spark
    // between suites would otherwise pin one dead context graph per
    // restart — the same unbounded-retention class this cache fixes
    lowPartSessions.keySet.removeIf(_.isStopped)
    val spark = lowPartSessions.computeIfAbsent(caller.sparkContext, _ => {
      val clone = caller.newSession()
      clone.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE stays ON in the clone: the loop's leaves are re-wrapped
      // RDD-backed frames with default (unknown) size stats, so static
      // planning would sort-merge every tiny per-round join — AQE's
      // runtime sizes convert them to broadcasts (measured: AQE off was
      // ~10% slower on x57 despite fewer stage-jobs).
      clone
    })
    val bidir = {
      val e = spark.createDataFrame(edges.rdd, edges.schema)
      e.unionByName(e.select(col("d2").as("d1"), col("d1").as("d2")))
    }
    var labels = bidir.select(col("d1").as("doc")).distinct()
      .withColumn("label", col("doc"))
      .localCheckpoint()
    var changed = 1L
    // The SECOND pointer-jump hop engages only from this round on (r20,
    // VERDICT r19 #5): near-dup clusters are overwhelmingly short-diameter
    // — rounds 1-2 resolve that mass with neighbor-min + one jump alone,
    // and hop 2's extra per-round join (whose cost here is plan/schedule,
    // not data) only repays on the long-chain tail that is still
    // unresolved by round 3. A/B at sf0.1 (x16 + x57, same box window):
    // hop2 every round x16 3.43 / x57 5.47; hop2 from round 3 (see the
    // committed numbers in OPTIMIZATION_r20.md). Conf-exposed so a corpus
    // with known deep components can engage it earlier.
    val hop2From = caller.conf.get("graft.cluster.hop2from", "3").toInt
    var round = 0
    while (changed > 0) {
      round += 1
      // adopt the min label among self and neighbors; carrying the old
      // label through lets the convergence check run on the checkpointed
      // result instead of re-joining the previous round
      // POINTER JUMP (path compression) rides the same round: beside the
      // neighbor min, adopt the label OF the current label — a node's
      // label is always the id of a node in the same component, so its
      // label is too, and it can only be smaller. Neighbor-min alone
      // needs O(diameter) rounds (a chance-collision chain at sf0.1
      // measured diameter ~30 -> 30 rounds x 0.3 s); with the jump the
      // label distance halves each round -> O(log diameter). The jump
      // joins the PREVIOUS round's checkpointed labels (never an
      // uncheckpointed intermediate — that would re-run the propagation
      // subplan twice per round). Fixpoint identical (component-min
      // labels), which the recursive-CTE oracles confirm.
      val parents = labels
        .select(col("doc").as("pdoc"), col("label").as("plabel"))
      // r19 opt round: a SECOND jump hop rides the same round — after the
      // neighbor-min/first-hop least, join parents once more on the new
      // label and take its parent's label too. Each hop composes (the
      // label's label's label), so per-round label distance shrinks ~4x
      // instead of ~2x and the round count — whose per-round cost here is
      // plan/codegen/scheduling, not data — drops near half. Fixpoint
      // unchanged: every adopted label is the id of a same-component node
      // and can only be smaller (the recursive-CTE oracles confirm).
      val hop1 = bidir
        .join(labels.withColumnRenamed("doc", "d1"), Seq("d1"))
        .groupBy(col("d2").as("doc"))
        .agg(min(col("label")).as("nlabel"))
        .join(labels, Seq("doc"))
        .join(parents, col("label") === col("pdoc"), "left")
        .select(col("doc"),
          least(col("label"), col("nlabel"),
            coalesce(col("plabel"), col("label"))).as("l1"),
          col("label").as("old"))
      val next0 = (if (round >= hop2From)
        hop1
          .join(parents.withColumnRenamed("pdoc", "p2doc")
            .withColumnRenamed("plabel", "p2label"),
            col("l1") === col("p2doc"), "left")
          .select(col("doc"),
            least(col("l1"), coalesce(col("p2label"), col("l1"))).as("label"),
            col("old"))
      else
        hop1.select(col("doc"), col("l1").as("label"), col("old")))
        .localCheckpoint() // eager: one job per round, lineage stays flat
      // RE-WRAP the checkpoint as a plain RDD-backed frame (r19 opt
      // round, the round's one REAL driver scale bug): Spark 4's
      // Dataset.localCheckpoint PROPAGATES the checkpointed plan's stats
      // onto the new LogicalRDD leaf (rewriteStatsAndConstraints), and
      // the size-only stats visitor MULTIPLIES child sizes at every
      // join — so with each round's plan referencing the previous
      // round's labels ~4x, the carried sizeInBytes BigInt's BIT LENGTH
      // grew ~4x per round and the driver spent its time in
      // million-bit BigInteger.multiply inside stats estimation (jstack:
      // SizeInBytesOnlyStatsPlanVisitor -> BigInteger.multiplyToomCook3;
      // measured minutes per checkpoint by round ~12, and a slice of
      // x16/x57's unexplained driver gap before that). createDataFrame
      // over the materialized RDD resets the leaf to defaultSizeInBytes,
      // so every round's stats stay constant-size. The extra Row
      // conversion is over the tiny label frame.
      val next = spark.createDataFrame(next0.rdd, next0.schema)
      changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select("doc", "label")
    }
    // re-home the (checkpointed, tiny) result into the caller's session so
    // downstream plans run under the caller's conf, not the clone's
    caller.createDataFrame(labels.rdd, labels.schema)
  }

  private def pairJaccard(shA: DataFrame, shB: DataFrame): DataFrame =
    shA.as("a")
      .join(shB.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("o"), first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .select(col("d1"), col("d2"),
        (col("o").cast("double") / (col("na") + col("nb") - col("o"))).as("jaccard"))

  val defs: Seq[QDef] = Seq(

    // Exact dedup: content-hash groupBy, keep lowest doc_id per group.
    // One shuffle with map-side partial aggregation; linear at any scale.
    QDef(
      "x1_dedup_exact",
      Some("""SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_dupes
             |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dupes"))
          .orderBy("keep_id")),

    // MinHash (8 hashes = lexicographic-min of salted md5) + LSH (4 bands x 2
    // rows) -> candidate pairs via equi-join on (band, bucket) -> exact
    // Jaccard verification at >= 0.5.
    QDef(
      "x2_dedup_minhash_lsh",
      Some(s"""WITH $shinglesSql,
              |mh AS (
              |  SELECT doc_id, CAST(h AS INT) h,
              |    min(md5(CAST(CAST(h AS INT) AS VARCHAR) || '|' || s)) sig
              |  FROM sh, unnest(range(0, 8)) g(h) GROUP BY doc_id, CAST(h AS INT)),
              |bk AS (
              |  SELECT doc_id, h // 2 AS band, md5(string_agg(sig, '|' ORDER BY h)) bucket
              |  FROM mh GROUP BY doc_id, h // 2),
              |cand AS (
              |  SELECT DISTINCT x.doc_id d1, y.doc_id d2 FROM bk x
              |  JOIN bk y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT d1, d2, count(*) o FROM cand
              |  JOIN sh sa ON sa.doc_id = d1
              |  JOIN sh sb ON sb.doc_id = d2 AND sb.s = sa.s GROUP BY d1, d2)
              |SELECT d1, d2, CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS jaccard
              |FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.5
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val sh = shingles(s, dir) // explodes from the cached shingle arrays
        // All 8 signatures in ONE pass via the typed MinStringsAggregator
        // (r20, guide §1.2/§4.1): `min(STRING) x 8` planned as SortAggregate
        // — min over an immutable buffer type can't use the hash aggregate,
        // so Spark sorted the full shingle stream by doc_id on both sides
        // of the exchange (x2's two heaviest stages; at corpus scale two
        // full sorts the hash shape never needs). The typed elementwise-min
        // plans as ObjectHashAggregate: partial/final hash maps, zero
        // sorts, identical values (md5 hex is ASCII — Java, UTF8String and
        // DuckDB VARCHAR orders coincide; the oracle hash-pins it). A band
        // bucket is then md5 of its two signatures in order — row-local,
        // no second shuffle, same value as md5(string_agg(sig,'|' ORDER BY h)).
        val sigAgg = new graft.functions.MinStringsAggregator(8).toColumn
        val mh = sh
          .select(col("doc_id"), array((0 to 7).map(h =>
            md5(concat(lit(s"$h|"), col("s")))): _*).as("sigs"))
          .as[(Long, Seq[String])]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(sigAgg.name("sigs"))
          .toDF("doc_id", "sigs")
        val bk = mh.select(col("doc_id"), explode(array((0 to 3).map(b =>
          struct(lit(b).as("band"),
            md5(concat(col("sigs").getItem(2 * b), lit("|"),
              col("sigs").getItem(2 * b + 1))).as("bucket"))): _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
        val cand = bk.as("x")
          .join(bk.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        // Verify candidates only. The candidate-pair set is tiny at any scale
        // (that is the point of LSH) — broadcast it once; both probe joins
        // against the shingle set are then narrow on the candidate side, and
        // the one shuffle keys on (doc_id, shingle). The minhash pipeline is
        // referenced exactly once so it is evaluated exactly once, and the
        // row-local per-doc counts make Jaccard one aggregate, zero extra
        // joins.
        broadcast(cand)
          .join(sh.as("sa"), col("d1") === col("sa.doc_id"))
          .join(sh.as("sb").hint("shuffle_hash"),
            col("d2") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
          .groupBy("d1", "d2")
          .agg(count(lit(1)).as("o"),
            first(col("sa.n")).as("na"), first(col("sb.n")).as("nb"))
          .select(col("d1"), col("d2"),
            (col("o").cast("double") / (col("na") + col("nb") - col("o"))).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("d1", "d2")
      }),

    // SimHash: 16-bit signature from per-token md5 nibbles; near-dup docs get
    // hamming-close signatures. One explode + two map-side-combinable aggs.
    QDef(
      "x3_dedup_simhash",
      Some("""WITH tok AS (
             |  SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) tk FROM documents),
             |bits AS (
             |  SELECT doc_id, CAST(b AS INT) b,
             |    SUM(CASE WHEN ((strpos('0123456789abcdef', substring(md5(tk), CAST(b AS INT)//4 + 1, 1)) - 1)
             |                   >> (CAST(b AS INT) % 4)) & 1 = 1 THEN 1 ELSE -1 END) s
             |  FROM tok, unnest(range(0, 16)) g(b) GROUP BY doc_id, CAST(b AS INT))
             |SELECT doc_id,
             |  CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), explode(array_distinct(split(trim(col("text")), "\\s+"))).as("tk"))
          .select(col("doc_id"), col("tk"), explode(sequence(lit(0), lit(15))).as("b"))
          .withColumn("v", expr("CAST(conv(substring(md5(tk), b div 4 + 1, 1), 16, 10) AS INT)"))
          .withColumn("c", expr("CASE WHEN (shiftright(v, b % 4) & 1) = 1 THEN 1 ELSE -1 END"))
          .groupBy("doc_id", "b").agg(sum("c").as("s"))
          .groupBy("doc_id")
          .agg(expr("CAST(SUM(CASE WHEN s >= 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END) AS BIGINT)").as("simhash"))
          .orderBy("doc_id")),

    // Direct n-gram Jaccard near-dup pairs at >= 0.8 (the exact all-pairs
    // variant; at 100 TB this runs only on x2's LSH candidates — kept as its
    // own operator because it is the ground truth the LSH path approximates).
    QDef(
      "x4_dedup_ngram_jaccard",
      Some(s"""WITH $shinglesSql,
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id d1, b.doc_id d2, count(*) o FROM sh a
              |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
              |SELECT d1, d2, CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS jaccard
              |FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.8
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        val sh = shingles(s, dir) // explodes from the cached shingle arrays
        pairJaccard(sh, sh)
          .filter(col("jaccard") >= 0.8)
          .orderBy("d1", "d2")
      }),

    // EXACT set-similarity self-join via PREFIX FILTERING (round 18 —
    // the AllPairs/PPJoin idea): x4's full shingle equi-join is exact but
    // its cost is Σ freq(s)² over EVERY shingle — one hot shingle (a
    // boilerplate phrase shared by a million documents) makes the join
    // quadratic in that frequency, which is precisely what dies at 100 TB.
    // Prefix filtering keeps the join EXACT while bounding it: order the
    // universe of shingles globally (rarest first, value tie-break), and
    // for Jaccard >= τ=3/5 index only each document's first
    // n - ceil(τ·n) + 1 shingles in that order. THEOREM (completeness): if
    // J(a,b) >= τ, the two documents must share at least one shingle
    // inside both prefixes — if all shared shingles sat past both
    // prefixes, each set would hold more than ceil(τ·n) unshared-ranked
    // shingles below them, capping the overlap under τ·min(n). So the
    // candidate join touches only prefixes — hot shingles rank LAST in
    // frequency order and fall out of short prefixes entirely — and the
    // exact verification (row-local array_intersect over the cached
    // per-doc shingle arrays) touches only candidates. The length filter
    // (5·min(n1,n2) >= 3·max — J can never reach 3/5 across a bigger size
    // skew) prunes integer-exactly before verification; the τ threshold
    // itself is the integer spelling 8o >= 3(n1+n2) on BOTH engines, so no
    // FP boundary can disagree. THE ORACLE IS THE DEFINITION — the brute
    // full-join J >= 3/5 — so a hash match PROVES the prefix filter lost
    // no pair on this corpus, not merely that two copies of the same
    // algorithm agree.
    //
    // Cost honesty at toy scale: the synthetic corpus is SKEWLESS (hottest
    // shingle frequency ~25 at sf0.1), so x4's brute join is cheap there
    // and this operator's extra passes (frequency ranking, per-doc prefix
    // cut, candidate distinct, exact verify) read as pure overhead in the
    // local bench. The crossover is skew: brute-join work is Σ freq(s)²,
    // prefix work is ~(1-τ)·corpus + candidates — at web scale, where one
    // boilerplate shingle appears 10^6 times (10^12 brute pairs from one
    // key), the prefix path is the only one that finishes. That claim is
    // MEASURED, not argued, since round 19: x64b materializes a skewed
    // corpus variant and asserts the candidate/brute-pair ratio in-query
    // (0.6% at sf0.01, 10.9% at sf0.1 — numbers in its header).
    QDef(
      "x64_exact_simjoin",
      Some(s"""WITH $shinglesSql,
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id d1, b.doc_id d2, count(*) o FROM sh a
              |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
              |SELECT d1, d2, CAST(o AS BIGINT) AS o,
              |  CAST(ca.n AS BIGINT) AS n1, CAST(cb.n AS BIGINT) AS n2,
              |  CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS jaccard
              |FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |WHERE 8*o >= 3*(ca.n + cb.n)
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) =>
        prefixSimJoin(shingleArrays(s, dir))._2.orderBy("d1", "d2")),

    // x64 ON THE SKEW IT EXISTS FOR (round 19): the same exact
    // prefix-filtered join over a corpus fixture where ONE boilerplate
    // shingle carries frequency ~N/5 (every fifth document ends with the
    // same appended sentence — the shared-footer shape of web corpora).
    // This turns x64's scaladoc crossover ARGUMENT into a measured fact,
    // asserted in-query: the prefix path's candidate-pair count must stay
    // under a FIFTH of the brute shingle join's Σ f(f-1)/2 pair count
    // (computed ANALYTICALLY from the frequency aggregate — the brute
    // join itself is never run on the Spark side; each run prints the
    // live numbers on stderr as `[x64b] candidates=...`). Measured:
    // sf0.01 — hot frequency 100, 19,129 brute pairs vs 119 prefix
    // candidates = 0.6%; sf0.1 — hot frequency 1,000, 1,782,149 brute
    // pairs vs 194,956 candidates = 10.9%. The hot shingle itself
    // contributes f(f-1)/2 ≈ 500k of the sf0.1 brute count and ZERO
    // prefix candidates (it ranks last in frequency order and falls out
    // of every prefix long enough to cut); the surviving 10.9% is the
    // corpus's ordinary near-dup collision mass, which both paths pay.
    // THE ORACLE IS STILL THE DEFINITION — DuckDB runs the brute join
    // over the identical fixture bytes — so the hash match proves the
    // filter lost no pair ON THE SKEWED corpus, where the docs whose
    // ONLY shingle is the boilerplate (empty originals) genuinely match
    // each other and must survive.
    QDef(
      "x64b_exact_simjoin_skew",
      Some(s"""WITH docs AS (
              |  SELECT doc_id, text FROM read_parquet('$X64bFixture/*.parquet')),
              |${shinglesSqlFrom("docs")},
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id d1, b.doc_id d2, count(*) o FROM sh a
              |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
              |SELECT d1, d2, CAST(o AS BIGINT) AS o,
              |  CAST(ca.n AS BIGINT) AS n1, CAST(cb.n AS BIGINT) AS n2,
              |  CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS jaccard
              |FROM inter JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |WHERE 8*o >= 3*(ca.n + cb.n)
              |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, X64bTag, dir) { w =>
          t(s, dir, "documents")
            .select(col("doc_id"),
              when(col("doc_id") % 5 === 0,
                concat(col("text"), lit(" bq0 bq1 bq2")))
                .otherwise(col("text")).as("text"))
            .hint("rebalance").write.mode("overwrite").parquet(w)
        }
        val arrs = shingleArraysOf(s, s.read.parquet(wh))
        val (cand0, verified) = prefixSimJoin(arrs)
        // two consumers (the crossover count below + the verification join
        // inside `verified`): persist, or the prefix self-join — the
        // operator's real work — executes twice
        val cand = cand0.persist()
        // the crossover, measured: brute pair count = Σ f(f-1)/2 over the
        // shingle frequency table (one aggregate — never the join), vs
        // the prefix path's actual candidate count; the fixture must
        // actually be skewed or the bound proves nothing
        val sh = arrs.select(explode(col("arr")).as("s"))
        val stat = sh.groupBy("s").agg(count(lit(1)).as("f"))
          .agg(sum(expr("f * (f - 1) DIV 2")).as("brute"), max("f").as("hot"))
          .collect()(0)
        val (brute, hot) = (stat.getLong(0), stat.getLong(1))
        val nCand = cand.count()
        // the measured crossover, one stderr line per run — the numbers
        // the scaladoc cites come from here, re-measurable every round
        System.err.println(
          s"[x64b] candidates=$nCand brute_pairs=$brute hot_freq=$hot")
        require(hot >= 50,
          s"fixture lost its skew (hottest shingle frequency $hot)")
        require(nCand * 5 <= brute,
          s"prefix filtering must beat the brute pair bound by 5x on the " +
            s"skewed corpus: $nCand candidates vs $brute brute pairs " +
            s"(hot=$hot)")
        verified.orderBy("d1", "d2")
      }),

    // CROSS-DOCUMENT DUPLICATE-SPAN REMOVAL (round 19) — the suffix-array
    // dedup of Lee et al. ("Deduplicating Training Data Makes Language
    // Models Better"), re-expressed relationally: every document-level
    // dedup above keeps or drops WHOLE documents, but the worst training
    // contamination is a boilerplate PASSAGE pasted into thousands of
    // otherwise-distinct pages. Pipeline: (1) k=8-token sliding windows
    // per document, generated ROW-LOCALLY (one transform+slice over the
    // token array — no self-join, no window function, stays in codegen);
    // (2) a window is duplicated iff its exact token sequence occurs in
    // >= 2 DISTINCT documents — the shingle IS the join key (tokens are
    // whitespace-split, so space-joining is injective; at 100 TB you would
    // key the shuffle on a 128-bit hash of it and carry exactness by
    // verify, documented trade); (3) keep-one semantics: the globally
    // first occurrence (min (doc_id, position)) is canonical and survives,
    // every other occurrence is flagged — dup detection AND canonical
    // election are ONE map-side-combinable aggregate (min(struct), not a
    // per-shingle ranking window); (4) flagged windows merge into maximal
    // removal spans per document via gaps-and-islands (two windows
    // PARTITIONED BY doc_id — group size bounded by document length, never
    // corpus size; overlap-only merging is exact: a duplicated region
    // longer than k always yields overlapping flagged windows, so abutting
    // non-overlapping spans are genuinely distinct duplicates).
    // Output: (doc_id, span_start, span_end, tokens_removed), 1-based
    // token positions, the removal worklist a rewrite pass would apply.
    // 100 TB shape: one shuffle on the shingle (partial aggs), one
    // hash-keyed equi-join of occurrences against the (small) duplicate
    // set — broadcastable, AQE decides — and doc-bounded merge windows.
    QDef(
      "x67_span_dedup",
      Some(s"""WITH $spanCtesSql,
             |brks AS (
             |  SELECT doc_id, st, en,
             |    CASE WHEN max(en) OVER (PARTITION BY doc_id ORDER BY st, en
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= st
             |         THEN 0 ELSE 1 END brk
             |  FROM flagged),
             |isl AS (
             |  SELECT doc_id, st, en,
             |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY st, en
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) grp_id
             |  FROM brks)
             |SELECT doc_id, CAST(MIN(st) AS BIGINT) span_start,
             |  CAST(MAX(en) AS BIGINT) span_end,
             |  CAST(MAX(en) - MIN(st) + 1 AS BIGINT) tokens_removed
             |FROM isl GROUP BY doc_id, grp_id
             |ORDER BY doc_id, span_start""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val flagged = dupSpanWindows(docTokenArrays(s, dir), SpanK)
        // gaps-and-islands: both windows doc_id-partitioned (doc-bounded)
        val w = Window.partitionBy("doc_id").orderBy(col("st"), col("en"))
        flagged
          .withColumn("brk",
            when(max(col("en")).over(
              w.rowsBetween(Window.unboundedPreceding, -1)) >= col("st"),
              0).otherwise(1))
          .withColumn("grp_id", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("grp_id"))
          .agg(min(col("st")).as("span_start"), max(col("en")).as("span_end"),
            (max(col("en")) - min(col("st")) + 1).as("tokens_removed"))
          .select("doc_id", "span_start", "span_end", "tokens_removed")
          .orderBy("doc_id", "span_start")
      }),

    // x67b: APPLY the x67 worklist — rewrite each affected document with
    // its duplicated spans excised, emitting the cleaned text plus the
    // before/kept/removed token accounting (docs a rewrite pass would
    // republish; untouched docs pass through a real pipeline unchanged and
    // are omitted here so the result IS the write set). The rewrite is
    // row-local: the per-doc flagged windows aggregate to one array
    // (doc-bounded), join back to the token arrays doc-keyed, and the
    // surviving tokens are selected by ONE transform+filter expression —
    // no explode-back-and-regroup, no window, stays in codegen. A doc
    // whose every token is covered (a page that WAS the boilerplate)
    // rewrites to the empty string rather than vanishing — the accounting
    // row is the evidence the dedup ate it.
    QDef(
      "x67b_span_rewrite",
      Some(s"""WITH $spanCtesSql,
             |kept AS (
             |  SELECT t.doc_id, g.p, t.arr[CAST(g.p AS INT)] w
             |  FROM toks t, unnest(range(1, len(t.arr) + 1)) g(p)
             |  WHERE NOT EXISTS (SELECT 1 FROM flagged f
             |    WHERE f.doc_id = t.doc_id AND g.p BETWEEN f.st AND f.en)),
             |rewritten AS (
             |  SELECT doc_id, string_agg(w, ' ' ORDER BY p) clean_text,
             |    CAST(count(*) AS BIGINT) tokens_kept
             |  FROM kept GROUP BY doc_id)
             |SELECT t.doc_id, CAST(len(t.arr) AS BIGINT) tokens_before,
             |  COALESCE(r.tokens_kept, 0) tokens_kept,
             |  CAST(len(t.arr) AS BIGINT) - COALESCE(r.tokens_kept, 0) tokens_removed,
             |  COALESCE(r.clean_text, '') clean_text
             |FROM toks t LEFT JOIN rewritten r ON r.doc_id = t.doc_id
             |WHERE CAST(len(t.arr) AS BIGINT) - COALESCE(r.tokens_kept, 0) > 0
             |ORDER BY t.doc_id""".stripMargin),
      (s, dir) => {
        val toks = docTokenArrays(s, dir)
        // per-doc span arrays: doc-bounded aggregation of the worklist
        val spans = dupSpanWindows(toks, SpanK)
          .groupBy("doc_id")
          .agg(collect_list(struct(col("st"), col("en"))).as("spans"))
        // inner join = exactly the affected docs; the rewrite is one
        // row-local expression over (arr, spans)
        toks.join(spans, "doc_id")
          .withColumn("clean", expr(
            """filter(
              |  transform(sequence(1, size(arr)),
              |    i -> IF(exists(spans, sp -> i >= sp.st AND i <= sp.en),
              |            NULL, element_at(arr, i))),
              |  x -> x IS NOT NULL)""".stripMargin))
          .select(col("doc_id"),
            size(col("arr")).cast("long").as("tokens_before"),
            size(col("clean")).cast("long").as("tokens_kept"),
            (size(col("arr")) - size(col("clean"))).cast("long")
              .as("tokens_removed"),
            concat_ws(" ", col("clean")).as("clean_text"))
          .orderBy("doc_id")
      }),

    // Near-dup clustering: connected components over the >=0.8 Jaccard pair
    // graph — the step that turns pairwise dups into keep/drop decisions.
    // Implemented as iterative min-label propagation: each round every node
    // adopts the smallest label among itself and its neighbors; rounds
    // double the propagation radius, so convergence is O(log diameter)
    // shuffles (dup clusters are tiny, so 2-3 rounds in practice). The
    // DuckDB oracle states the same fixpoint with a recursive CTE.
    QDef(
      "x16_dedup_cluster",
      Some(s"""WITH RECURSIVE $shinglesSql,
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id d1, b.doc_id d2, count(*) o FROM sh a
              |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
              |edges AS (
              |  SELECT d1, d2 FROM inter
              |  JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |  WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.8),
              |bidir AS (SELECT d1, d2 FROM edges UNION SELECT d2, d1 FROM edges),
              |nodes AS (SELECT DISTINCT d1 AS doc FROM bidir),
              |reach AS (
              |  SELECT doc, doc AS label FROM nodes
              |  UNION
              |  SELECT b.d2 AS doc, r.label FROM reach r JOIN bidir b ON b.d1 = r.doc)
              |SELECT doc AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
              |FROM reach GROUP BY doc ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        clusterLabels(s, dir)
          .select(col("doc").as("doc_id"), col("label").as("cluster_id"))
          .orderBy("doc_id")),

    // Canonical-representative selection — the decision step after
    // clustering: per near-dup cluster keep exactly one document (the
    // longest; ties break to the smallest doc_id) and mark the rest drop.
    // Output covers only clustered docs: unclustered documents are their
    // own representative by definition, so the keep-list a pipeline
    // applies is "NOT IN (drop set)" — the drop set is what ships. The
    // window partitions by cluster over the (tiny) clustered subset; the
    // corpus contributes token counts through a broadcast join and never
    // shuffles.
    QDef(
      "x29_dedup_canonical",
      Some(s"""WITH RECURSIVE $shinglesSql,
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT a.doc_id d1, b.doc_id d2, count(*) o FROM sh a
              |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
              |edges AS (
              |  SELECT d1, d2 FROM inter
              |  JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
              |  WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.8),
              |bidir AS (SELECT d1, d2 FROM edges UNION SELECT d2, d1 FROM edges),
              |nodes AS (SELECT DISTINCT d1 AS doc FROM bidir),
              |reach AS (
              |  SELECT doc, doc AS label FROM nodes
              |  UNION
              |  SELECT b.d2 AS doc, r.label FROM reach r JOIN bidir b ON b.d1 = r.doc),
              |lab AS (SELECT doc AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
              |        FROM reach GROUP BY doc),
              |tok AS (SELECT doc_id,
              |          CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
              |        FROM documents)
              |SELECT l.doc_id, l.cluster_id, t.n_tokens,
              |  row_number() OVER (PARTITION BY l.cluster_id
              |                     ORDER BY t.n_tokens DESC, l.doc_id) = 1 AS keep
              |FROM lab l JOIN tok t USING (doc_id)
              |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val lab = clusterLabelsCached(s, dir)
          .select(col("doc").as("doc_id"), col("label").as("cluster_id"))
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n_tokens"))
        val w = Window.partitionBy("cluster_id")
          .orderBy(col("n_tokens").desc, col("doc_id"))
        tok.join(broadcast(lab), "doc_id")
          .withColumn("keep", row_number().over(w) === 1)
          .select("doc_id", "cluster_id", "n_tokens", "keep")
          .orderBy("doc_id")
      }),

    // Incremental corpus dedup — the daily-ingest shape a large training
    // pipeline actually runs: the committed corpus (an icelite table) is
    // NEVER rescanned. New documents arrive as an append; `changesSince`
    // plans only the added files; their LSH band buckets probe a
    // PRE-BUILT bucket index table whose layout is hidden-partitioned by
    // bucket hash, so the index scan prunes to the buckets the delta
    // actually hits (asserted in-query from the plan); and exact-Jaccard
    // verification reads corpus text only for candidate doc ids, pruned by
    // the corpus table's ranged manifest stats. Cost tracks the DELTA and
    // its candidates, not corpus size. The oracle recomputes the same
    // delta-vs-corpus near-dup pairs relationally over the raw table.
    QDef(
      "x25_dedup_incremental",
      Some(s"""WITH $shinglesSql,
              |mh AS (
              |  SELECT doc_id, CAST(h AS INT) h,
              |    min(md5(CAST(CAST(h AS INT) AS VARCHAR) || '|' || s)) sig
              |  FROM sh, unnest(range(0, 8)) g(h) GROUP BY doc_id, CAST(h AS INT)),
              |bk AS (
              |  SELECT doc_id, h // 2 AS band, md5(string_agg(sig, '|' ORDER BY h)) bucket
              |  FROM mh GROUP BY doc_id, h // 2),
              |cand AS (
              |  SELECT DISTINCT x.doc_id d_new, y.doc_id d_old FROM bk x
              |  JOIN bk y ON x.band = y.band AND x.bucket = y.bucket
              |    AND x.doc_id % 4 = 0 AND y.doc_id % 4 <> 0),
              |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
              |inter AS (
              |  SELECT d_new, d_old, count(*) o FROM cand
              |  JOIN sh sa ON sa.doc_id = d_new
              |  JOIN sh sb ON sb.doc_id = d_old AND sb.s = sa.s GROUP BY d_new, d_old)
              |SELECT d_new, d_old, CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS jaccard
              |FROM inter JOIN cnt ca ON ca.doc_id = d_new JOIN cnt cb ON cb.doc_id = d_old
              |WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.5
              |ORDER BY d_new, d_old""".stripMargin),
      (s, dir) => {
        import graft.icelite.IceCatalog

        // repartition by doc_id BEFORE the shingle expansion: delta and
        // candidate reads plan only a few input splits, and the tokenize+
        // transform explosion is the expensive map side — spread it across
        // the cluster instead of the scan's task count (same reasoning as
        // the full-corpus shingle builder above)
        def arrOf(df: DataFrame): DataFrame = df
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
          .filter(size(col("tk")) >= 3)
          .select(col("doc_id"), array_distinct(expr(
            "transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")).as("arr"))
        def explodeSh(arr: DataFrame): DataFrame = arr
          .select(col("doc_id"), size(col("arr")).as("n"), explode(col("arr")).as("s"))
        def shOf(df: DataFrame): DataFrame = explodeSh(arrOf(df))
        def bkOf(sh: DataFrame): DataFrame = {
          val sigCols = (0 to 7).map(h =>
            min(md5(concat(lit(s"$h|"), col("s")))).as(s"sig$h"))
          sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
            .select(col("doc_id"), explode(array((0 to 3).map(b =>
              struct(lit(b).as("band"),
                md5(concat(col(s"sig${2 * b}"), lit("|"),
                  col(s"sig${2 * b + 1}"))).as("bucket"))): _*)).as("bb"))
            .select(col("doc_id"), col("bb.band").as("band"),
              col("bb.bucket").as("bucket"))
        }

        // Fixture (corpus table + its LSH bucket index + the delta append)
        // is memoized per sfDir: the corpus and index are built ONCE per
        // corpus version in a real pipeline — the measured operator is the
        // incremental probe itself. Snapshot 1 = corpus, snapshot 2 = delta.
        val wh = QUtil.cachedFixture(s, "x25", dir) { wh =>
          val cat = new IceCatalog(s, wh)
          val docs = t(s, dir, "documents")
          val isNew = col("doc_id") % 4 === 0
          val tbl = cat.createTable("lake", "docs_t", docs.schema)
          tbl.append(docs.filter(!isNew).repartitionByRange(4, col("doc_id")))
          // index of the COMMITTED corpus, hidden-partitioned by bucket hash
          val corpusBk = bkOf(shOf(tbl.toDF))
          cat.createTable("lake", "docs_lsh", corpusBk.schema,
            partitionBy = Seq("bucket(8,bucket)")).append(corpusBk)
          // daily ingest: the delta arrives as snapshot 2
          tbl.append(docs.filter(isNew))
        }
        val cat = new IceCatalog(s, wh)
        val tbl = cat.loadTable("lake", "docs_t")
        val idxT = cat.loadTable("lake", "docs_lsh")
        val corpusSnap = 1L

        // changesSince plans ONLY the delta's files. Checkpoint the shingle
        // ARRAYS (one row per doc) rather than the exploded rows: the
        // tokenize+shingle transform is the expensive part and runs once,
        // while the explode is recomputed from the in-memory checkpoint by
        // each consumer — materializing |shingles| exploded rows would cost
        // more than recomputing the explode ever does.
        val deltaArr = arrOf(tbl.changesSince(corpusSnap)).localCheckpoint()
        val deltaSh = explodeSh(deltaArr)
        val deltaBk = bkOf(deltaSh).localCheckpoint() // small: 4 rows per new doc
        // bounded peek at the delta's bucket set (one job, <= 257 rows)
        val hotCap = 256
        val hot = deltaBk.select("bucket").distinct().limit(hotCap + 1)
          .collect().map(_.getString(0)).toSeq
        require(hot.nonEmpty, "delta produced no LSH buckets")
        // the hidden bucket(8,·) layout prunes a single-bucket probe to its
        // one partition — the plan-level proof the pruned path rides
        val probe = idxT.toDF.filter(col("bucket") === hot.head)
        val d = probe.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString
        val pm = """files=(\d+) planned=(\d+)""".r.findFirstMatchIn(d)
          .getOrElse(sys.error(s"no planning counters in index scan: $d"))
        require(pm.group(2).toInt < pm.group(1).toInt,
          s"bucket pruning inert on the index scan: $d")

        // small deltas (the nightly-patch shape): push the bucket set as an
        // In filter so the index scan PLANS only the matching bucket
        // partitions. Large deltas: a plain broadcast equi-join on
        // (band, bucket) — the index side stays bucket-partitioned, so at
        // cluster scale this is a storage-partitioned join, and collecting
        // millions of bucket values driver-side would be the anti-pattern.
        val idxScan =
          if (hot.length <= hotCap) idxT.toDF.filter(col("bucket").isin(hot: _*))
          else idxT.toDF
        val cand = broadcast(deltaBk).as("x")
          .join(idxScan.as("y"),
            col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
          .select(col("x.doc_id").as("d_new"), col("y.doc_id").as("d_old"))
          .distinct()
          .localCheckpoint() // tiny; referenced for ids + the verify join
        // verification reads corpus text ONLY for candidate ids (manifest
        // range stats prune the corpus files the candidates don't touch).
        // The id peek is CAPPED like the bucket peek above: a large delta
        // against a hot corpus could otherwise collect millions of ids onto
        // the driver and build a giant In-list. Past the cap, stay
        // distributed — a left-semi join against the checkpointed candidate
        // set; AQE broadcasts the build side when it fits (and the scan's
        // SupportsRuntimeFiltering then recovers the same file-level pruning
        // the In-list buys on the small path) and shuffles otherwise, so no
        // size class ever lands on the driver.
        val candCap = s.conf.get("graft.x25.candCap", "4096").toInt
        val candOld = cand.select("d_old").distinct().limit(candCap + 1)
          .collect().map(_.getLong(0))
        // verification is ROW-LOCAL over the shingle arrays: each candidate
        // pair carries both docs' arrays and computes the intersection with
        // array_intersect in one pass — no shingle explosion, no equi-join
        // on shingle values, no per-pair aggregation shuffle. The only
        // shuffled payload is |pairs| + |candidate old docs| array rows.
        val corpusScan = tbl.scan(snapshotId = Some(corpusSnap))
        val oldArr = arrOf(
          if (candOld.isEmpty) corpusScan.limit(0)
          else if (candOld.length <= candCap)
            corpusScan.filter(col("doc_id").isin(candOld.toIndexedSeq: _*))
          else corpusScan.join(
            cand.select(col("d_old").as("doc_id")).distinct(),
            Seq("doc_id"), "left_semi"))
        broadcast(cand)
          .join(deltaArr.as("sa"), col("d_new") === col("sa.doc_id"))
          .join(oldArr.as("sb").hint("shuffle_hash"),
            col("d_old") === col("sb.doc_id"))
          .select(col("d_new"), col("d_old"),
            size(array_intersect(col("sa.arr"), col("sb.arr"))).cast("double").as("o"),
            size(col("sa.arr")).as("na"), size(col("sb.arr")).as("nb"))
          .select(col("d_new"), col("d_old"),
            (col("o") / (col("na") + col("nb") - col("o"))).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy("d_new", "d_old")
      }),

    // Cross-document repeated-PASSAGE detection (round 10) — the exact-
    // substring dedup of Lee et al. 2021 ("Deduplicating Training Data
    // Makes Language Models Better"), reshaped from their suffix-array
    // construction into the shuffle-friendly rolling-window form: every
    // W-token window is a key; a window whose text occurs in >= 2 DISTINCT
    // documents marks a duplicated passage; per document, overlapping or
    // adjacent duplicate windows merge into maximal spans
    // (gaps-and-islands). Output is the span table a removal pass consumes:
    // (doc, token range, window evidence count). Distinct from x4 (doc-
    // level n-gram Jaccard): this finds WHERE inside each doc the shared
    // text lives, at sub-document granularity.
    //
    // Scale design: the corpus never self-joins. One linear explode, one
    // map-side-combinable aggregate keyed by window, one equi-join of
    // windows against the duplicated keys, one doc-partitioned window pass
    // (the final groupBy reuses that partitioning — doc_id is a subset of
    // its keys, so no fourth shuffle). The join/aggregate key is
    // xxhash64(window text) — 8 bytes instead of ~50 on the wire at
    // 100 TB. The oracle states the same pipeline over the literal window
    // STRINGS; span output is identical absent a 64-bit collision
    // (~1e-10 here; a production pass re-verifies candidate spans by
    // bytes before cutting).
    QDef(
      "x35_passage_dedup",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
             |  FROM documents),
             |wins AS (
             |  SELECT doc_id, CAST(i AS INT) AS pos,
             |    array_to_string(
             |      list_slice(tk, CAST(i AS INT) + 1, CAST(i AS INT) + 8),
             |      ' ') AS g
             |  FROM tk, unnest(range(0, greatest(len(tk) - 7, 0))) t(i)),
             |dup AS (SELECT g FROM (
             |    SELECT g, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY g)
             |  WHERE nd >= 2),
             |dw AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (g)),
             |sp AS (SELECT doc_id, pos,
             |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
             |         OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8
             |    THEN 1 ELSE 0 END AS ns
             |  FROM dw),
             |isl AS (SELECT doc_id, pos,
             |    CAST(SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
             |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span
             |  FROM sp)
             |SELECT doc_id, span, MIN(pos) AS span_start,
             |  MAX(pos) + 7 AS span_end, COUNT(*) AS n_windows
             |FROM isl GROUP BY doc_id, span ORDER BY doc_id, span""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val W = 8
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
          .filter(size(col("tk")) >= W)
          // single-file fixture: spread the explode across the cluster (a
          // real corpus scan already has thousands of splits)
          .repartition(col("doc_id"))
        val wins = toks.select(col("doc_id"), expr(
          s"""explode(transform(sequence(0, size(tk) - $W),
             |  i -> named_struct(
             |    'pos', CAST(i AS INT),
             |    'h', xxhash64(array_join(slice(tk, i + 1, $W), ' ')))))"""
            .stripMargin).as("w"))
          .select(col("doc_id"), col("w.pos").as("pos"), col("w.h").as("h"))
        val dup = wins.select("h", "doc_id").distinct()
          .groupBy("h").agg(count(lit(1)).as("nd"))
          .filter(col("nd") >= 2).select("h")
        val dw = wins.join(dup, Seq("h")).select("doc_id", "pos")
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        dw
          .withColumn("prev", lag("pos", 1).over(byDoc))
          .withColumn("ns",
            when(col("prev").isNull || col("pos") > col("prev") + W, 1)
              .otherwise(0))
          .withColumn("span", sum("ns").over(
            byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("doc_id", "span")
          .agg(min("pos").as("span_start"),
            (max(col("pos")) + lit(W - 1)).as("span_end"),
            count(lit(1)).as("n_windows"))
          .orderBy("doc_id", "span")
      }),

    // Cross-SOURCE contamination matrix (round 10): for every pair of
    // corpus sources (dumps), how many distinct W-token passages they
    // share verbatim — the report a curation team reads to decide which
    // dumps need cross-dedup before mixing (x35 tells you WHERE inside
    // docs; this tells you WHICH SOURCE PAIRS leak into each other).
    //
    // Scale shape: no self-join. Distinct (window, source) pairs are one
    // map-side-combined shuffle; each window's source SET is collected
    // (bounded by the source count — dumps number in the thousands, not
    // the billions) and its pairs explode ROW-LOCALLY; the pair counts
    // aggregate map-side. The oracle restates it as the classic self-join.
    // Window key is xxhash64 on the wire, string in the oracle (same
    // collision argument as x35).
    QDef(
      "x39_source_overlap",
      Some("""WITH tk AS (
             |  SELECT source, string_split_regex(trim(text), '\s+') AS tk
             |  FROM documents),
             |wins AS (
             |  SELECT source,
             |    array_to_string(
             |      list_slice(tk, CAST(i AS INT) + 1, CAST(i AS INT) + 8),
             |      ' ') AS g
             |  FROM tk, unnest(range(0, greatest(len(tk) - 7, 0))) t(i)),
             |d AS (SELECT DISTINCT g, source FROM wins),
             |p AS (
             |  SELECT a.source AS source_a, b.source AS source_b,
             |    COUNT(*) AS shared_windows
             |  FROM d a JOIN d b ON a.g = b.g AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, shared_windows FROM p
             |WHERE shared_windows >= 10
             |ORDER BY source_a, source_b""".stripMargin),
      (s, dir) => {
        val W = 8
        val wins = t(s, dir, "documents")
          .select(col("source"), split(trim(col("text")), "\\s+").as("tk"))
          .filter(size(col("tk")) >= W)
          .repartition(col("source"))
          .select(col("source"), explode(expr(
            s"""transform(sequence(0, size(tk) - $W),
               |  i -> xxhash64(array_join(slice(tk, i + 1, $W), ' ')))"""
              .stripMargin)).as("h"))
        wins.select("h", "source").distinct()
          .groupBy("h").agg(collect_set(col("source")).as("ss"))
          .filter(size(col("ss")) >= 2)
          // array_sort = UTF-8 binary order, the same order the oracle's
          // a.source < b.source comparison uses
          .withColumn("ss", array_sort(col("ss")))
          .select(explode(expr(
            """flatten(transform(sequence(0, size(ss) - 2),
              |  i -> transform(sequence(i + 1, size(ss) - 1),
              |    j -> struct(ss[i] AS a, ss[j] AS b))))""".stripMargin)).as("p"))
          .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
          .agg(count(lit(1)).as("shared_windows"))
          .filter(col("shared_windows") >= 10)
          .orderBy("source_a", "source_b")
      }),

    // Perceptual IMAGE dedup (round 16) — the multimodal pillar's analog
    // of x2: a VLM corpus dedups images by perceptual hash BEFORE any
    // embedding model runs, because re-encodes/resizes/brightness tweaks
    // are the dominant duplicate class and byte hashes miss all of them.
    // Pipeline: REAL pixel decode (JDK ImageIO) -> 64-bit difference hash
    // (Multimodal.dHash64: box-averaged 9x8 grid, neighbor comparisons —
    // scale/brightness invariant, integer-only) -> banded Hamming LSH:
    // 4 bands x 16 bits, a pair is a candidate iff SOME band matches
    // exactly (Hamming <= 6 overall makes a clean band likely), candidates
    // via the (band, bucket) equi-join exactly like x2 — cost tracks
    // collisions, never all-pairs — then exact Hamming verification via
    // bit_count(xor). The image corpus is deterministic (one JDK-encoded
    // image per document; doc_ids sharing doc_id/3 depict the same scene
    // as PNG / 48px PNG +brightness / JPEG re-encode — the near-dup shape);
    // a real pipeline reads its payload column at exactly that point. The
    // per-image hashes are MATERIALIZED to a parquet fixture both engines
    // read, so the oracle independently replays banding + verification
    // over identical bytes. LSH recall is probabilistic by design: a pair
    // whose flips straddle all 4 bands is missed — the documented
    // tradeoff every banded LSH makes (x2 included).
    QDef(
      "x46_image_dedup_phash",
      Some(s"""WITH h AS (
             |  SELECT doc_id, dhash
             |  FROM read_parquet('$X46HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, dhash,
             |    CAST(band AS INT) AS band,
             |    (dhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
             |    CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
             |  FROM b x JOIN b y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.doc_id < y.doc_id)
             |SELECT d1, d2, hamming FROM cand WHERE hamming <= 6
             |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        // writeSized (r20): the bare write landed the decode stage's 32
        // ~8 KB files, so every banding scan — re-planned each run —
        // scheduled 32 tasks for ~250 KB; PlanDump's planned-file evidence
        // caught this site missing from r19's sweep
        QUtil.writeSized(imageHashes(s, dir),
          QUtil.freshWarehouse(s, X46HashTag))
        val hx = s.read.parquet(X46HashFixture)
        val b = hammingBands(hx, "dhash", Seq("doc_id", "dhash"))
        b.as("x")
          .join(b.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            bit_count(col("x.dhash").bitwiseXOR(col("y.dhash")))
              .cast("int").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 6)
          .orderBy("d1", "d2")
      }),

    // Perceptual AUDIO dedup (round 16) — completes the dedup story across
    // modalities (x2 text, x46 images, this for audio): a speech/audio
    // corpus dedups clips by acoustic fingerprint because resamples and
    // gain changes are the dominant duplicate class and byte hashes miss
    // all of them. Pipeline: REAL 16-bit PCM decode (Multimodal.decodePcm,
    // RIFF chunk walk + integer stereo mixdown) -> 64-bit fingerprint
    // (Multimodal.aHash64: 33 equal-DURATION frames, 32 adjacent-frame
    // loudness comparisons + 32 frame-vs-clip zero-crossing-rate bits —
    // resample- and volume-invariant, integer-only) -> the exact x46
    // candidate machinery: banded Hamming LSH (4 bands x 16 bits,
    // candidates via the (band, bucket) equi-join, cost tracks collisions
    // never all-pairs), exact bit_count(xor) verification at <= 6. The
    // audio corpus is deterministic (doc_ids sharing doc_id/3 record the
    // same tune as 8 kHz / 11.025 kHz resample / half volume); a real
    // pipeline reads its payload column at exactly that point. Hashes
    // materialize to a parquet fixture both engines read, so the oracle
    // independently replays banding + verification over identical bytes.
    QDef(
      "x51_audio_dedup_fp",
      Some(s"""WITH h AS (
             |  SELECT doc_id, ahash
             |  FROM read_parquet('$X51HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, ahash,
             |    CAST(band AS INT) AS band,
             |    (ahash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2,
             |    CAST(bit_count(xor(x.ahash, y.ahash)) AS INT) AS hamming
             |  FROM b x JOIN b y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.doc_id < y.doc_id)
             |SELECT d1, d2, hamming FROM cand WHERE hamming <= 6
             |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        // writeSized (r20): same missing-sweep site as x46
        QUtil.writeSized(audioHashes(s, dir),
          QUtil.freshWarehouse(s, X51HashTag))
        val hx = s.read.parquet(X51HashFixture)
        val b = hammingBands(hx, "ahash", Seq("doc_id", "ahash"))
        b.as("x")
          .join(b.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
            bit_count(col("x.ahash").bitwiseXOR(col("y.ahash")))
              .cast("int").as("hamming"))
          .distinct()
          .filter(col("hamming") <= 6)
          .orderBy("d1", "d2")
      }),

    // Perceptual VIDEO dedup (round 16) — the last modality pillar: a
    // video corpus dedups clips across frame-rate changes, resizes, and
    // re-encodes, none of which byte hashes catch. Pipeline: REAL
    // multi-frame container decode (Multimodal.decodeFrames — ImageIO's
    // animated-GIF reader, the JVM's codec-free video stand-in, same
    // signature a production mp4 decoder plugs into) -> per-clip
    // fingerprint (videoHashes: 4 frames sampled at NORMALIZED clip
    // positions so different frame rates sample the same instants, each
    // dHash64'd through the shared grid core) -> banded Hamming LSH per
    // (slot, band): a pair is a candidate iff SOME sampled frame shares
    // some 16-bit band — the (slot, band, bucket) equi-join, cost tracks
    // collisions never all-pairs — then exact verification joins the 4
    // hash rows back per candidate pair (candidates-bounded) and keeps
    // pairs within 24 total bits (dHash's per-frame 6 x 4 slots). The
    // video corpus is deterministic (doc_ids sharing doc_id/3 record the
    // same motion as 6-frame / 9-frame / 48px encodes); hashes materialize
    // to a parquet fixture both engines read, so the oracle independently
    // replays banding + verification over identical bytes.
    QDef(
      "x52_video_dedup_phash",
      Some(s"""WITH h AS (
             |  SELECT doc_id, slot, fhash
             |  FROM read_parquet('$X52HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, slot, fhash,
             |    CAST(band AS INT) AS band,
             |    (fhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
             |  FROM b x JOIN b y
             |    ON x.slot = y.slot AND x.band = y.band AND x.bucket = y.bucket
             |      AND x.doc_id < y.doc_id),
             |ver AS (
             |  SELECT c.d1, c.d2,
             |    CAST(sum(bit_count(xor(a.fhash, z.fhash))) AS INT) AS hamming
             |  FROM cand c
             |  JOIN h a ON a.doc_id = c.d1
             |  JOIN h z ON z.doc_id = c.d2 AND z.slot = a.slot
             |  GROUP BY c.d1, c.d2)
             |SELECT d1, d2, hamming FROM ver WHERE hamming <= 24
             |ORDER BY d1, d2""".stripMargin),
      (s, dir) => {
        // writeSized (r20): same missing-sweep site as x46
        QUtil.writeSized(videoHashRows(s, dir),
          QUtil.freshWarehouse(s, X52HashTag))
        val hx = s.read.parquet(X52HashFixture)
        val b = hammingBands(hx, "fhash", Seq("doc_id", "slot"))
        val cand = b.as("x")
          .join(b.as("y"),
            col("x.slot") === col("y.slot") &&
              col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
        // verification reads exactly 4 hash rows per candidate side —
        // cost tracks candidate pairs, never the corpus
        cand
          .join(hx.as("a"), col("d1") === col("a.doc_id"))
          .join(hx.as("z"),
            col("d2") === col("z.doc_id") && col("a.slot") === col("z.slot"))
          .groupBy("d1", "d2")
          .agg(sum(bit_count(col("a.fhash").bitwiseXOR(col("z.fhash"))))
            .cast("int").as("hamming"))
          .filter(col("hamming") <= 24)
          .orderBy("d1", "d2")
      }),

    // FUZZY decontamination (round 16) — x24 catches only VERBATIM eval
    // leakage (exact n-gram overlap); real eval-leak screens also catch
    // paraphrased / whitespace-drifted leaks. Composition of existing
    // machinery: x2's MinHash signatures over BOTH the eval split
    // (doc_id % 97 = 0, x24's convention) and the corpus, LSH banding,
    // candidates via the (band, bucket) equi-join — the eval side is
    // evaluation-suite-sized, so it broadcasts and the corpus is touched
    // once; NO corpus self-join anywhere (PlanSpec asserts it) — then
    // exact shingle-Jaccard verification at >= 0.5 on candidates only.
    // Output is x34's auditable-verdict shape: one row per CONTAMINATED
    // corpus doc with how many eval docs it leaks and its worst overlap.
    QDef(
      "x47_decontaminate_fuzzy",
      Some(s"""WITH $shinglesSql,
             |mh AS (
             |  SELECT doc_id, CAST(h AS INT) h,
             |    min(md5(CAST(CAST(h AS INT) AS VARCHAR) || '|' || s)) sig
             |  FROM sh, unnest(range(0, 8)) g(h) GROUP BY doc_id, CAST(h AS INT)),
             |bk AS (
             |  SELECT doc_id, h // 2 AS band, md5(string_agg(sig, '|' ORDER BY h)) bucket
             |  FROM mh GROUP BY doc_id, h // 2),
             |cand AS (
             |  SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id
             |  FROM bk c JOIN bk e ON c.band = e.band AND c.bucket = e.bucket
             |  WHERE c.doc_id % 97 <> 0 AND e.doc_id % 97 = 0),
             |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
             |inter AS (
             |  SELECT cand.doc_id, cand.eval_id, count(*) o FROM cand
             |  JOIN sh sa ON sa.doc_id = cand.doc_id
             |  JOIN sh sb ON sb.doc_id = cand.eval_id AND sb.s = sa.s
             |  GROUP BY cand.doc_id, cand.eval_id),
             |ver AS (
             |  SELECT i.doc_id, CAST(o AS DOUBLE) / (ca.n + cb.n - o) AS j
             |  FROM inter i
             |  JOIN cnt ca ON ca.doc_id = i.doc_id
             |  JOIN cnt cb ON cb.doc_id = i.eval_id
             |  WHERE CAST(o AS DOUBLE) / (ca.n + cb.n - o) >= 0.5)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_eval_matches,
             |  max(j) AS max_jaccard
             |FROM ver GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val sh = shingles(s, dir)
        val sigCols = (0 to 7).map(h =>
          min(md5(concat(lit(s"$h|"), col("s")))).as(s"sig$h"))
        val mh = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
        val bk = mh.select(col("doc_id"), explode(array((0 to 3).map(b =>
          struct(lit(b).as("band"),
            md5(concat(col(s"sig${2 * b}"), lit("|"), col(s"sig${2 * b + 1}")))
              .as("bucket"))): _*)).as("bb"))
          .select(col("doc_id"), col("bb.band").as("band"),
            col("bb.bucket").as("bucket"))
        val evalBk = bk.filter(col("doc_id") % 97 === 0)
          .withColumnRenamed("doc_id", "eval_id")
        val cand = bk.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(evalBk), Seq("band", "bucket"))
          .select(col("doc_id").as("cd"), col("eval_id")).distinct()
        // verification probes touch only candidates: broadcast the (tiny)
        // candidate list, key the one real shuffle on (doc_id, shingle) —
        // x2's exact shape, so the same scale argument carries over
        val ver = broadcast(cand)
          .join(sh.as("sa"), col("cd") === col("sa.doc_id"))
          .join(sh.as("sb").hint("shuffle_hash"),
            col("eval_id") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
          .groupBy("cd", "eval_id")
          .agg(count(lit(1)).as("o"),
            first(col("sa.n")).as("na"), first(col("sb.n")).as("nb"))
          .select(col("cd"),
            (col("o").cast("double") / (col("na") + col("nb") - col("o"))).as("j"))
          .filter(col("j") >= 0.5)
        ver.groupBy("cd")
          .agg(count(lit(1)).cast("int").as("n_eval_matches"),
            max(col("j")).as("max_jaccard"))
          .select(col("cd").as("doc_id"), col("n_eval_matches"), col("max_jaccard"))
          .orderBy("doc_id")
      }),

    // IMAGE similarity search (round 16) — x6's brute-force top-k shape
    // over perceptual hashes: for each probe image (doc_id % 50 = 0), the
    // 5 nearest corpus images by Hamming distance over dHash64, ties
    // broken by doc_id so the ranking is total and engine-independent.
    // The probe set is query-sized and BROADCAST, so the corpus is
    // touched once with no shuffle before the per-probe top-k — the
    // honest exact baseline; at retrieval scale the same hashes route
    // through x46's banded (band, bucket) equi-join to screen candidates
    // first (LSH recall tradeoff documented there). The hash table builds
    // once per JVM/sf (cachedFixture — it is FIXTURE for the search, so
    // the benchmark measures the search); the oracle replays ranking over
    // the identical fixture bytes.
    QDef(
      "x49_image_sim_topk",
      Some(s"""WITH h AS (
             |  SELECT doc_id, dhash
             |  FROM read_parquet('$X49HashFixture/*.parquet')),
             |d AS (
             |  SELECT q.doc_id AS q_id, c.doc_id AS n_id,
             |    CAST(bit_count(xor(q.dhash, c.dhash)) AS INT) AS hamming
             |  FROM h q JOIN h c ON q.doc_id % 50 = 0 AND q.doc_id <> c.doc_id),
             |r AS (
             |  SELECT q_id, n_id, hamming,
             |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS rank
             |  FROM d)
             |SELECT q_id, rank, n_id, hamming FROM r WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, X49HashTag, dir) { w =>
          QUtil.writeSized(imageHashes(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        val probes = broadcast(hx.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"), col("dhash").as("q_hash")))
        hammingTopK(
          hx.join(probes, col("q_id") =!= col("doc_id"))
            .select(col("q_id"),
              col("doc_id").as("n_id"),
              bit_count(col("q_hash").bitwiseXOR(col("dhash")))
                .cast("int").as("hamming")),
          5).orderBy("q_id", "rank")
      }),

    // IMAGE decontamination (round 16) — the eval-leak screen for the
    // visual modality, completing the story across modalities (x24
    // verbatim text, x47 fuzzy text, this for images): a VLM eval suite's
    // images must not appear — re-encoded, resized, brightness-tweaked —
    // in the training corpus. Same split convention as x24/x47 (eval =
    // doc_id % 97 = 0), same candidate shape as x46: banded Hamming LSH
    // with the evaluation-suite-sized side BROADCAST, exact
    // bit_count(xor) verification at <= 6 bits, one auditable verdict row
    // per contaminated corpus image (eval-match count, closest distance).
    // Shares x49's once-per-JVM hash fixture; the oracle replays the
    // whole screen over the identical bytes.
    QDef(
      "x50_image_decontaminate",
      Some(s"""WITH h AS (
             |  SELECT doc_id, dhash
             |  FROM read_parquet('$X49HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, dhash,
             |    CAST(band AS INT) AS band,
             |    (dhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id,
             |    CAST(bit_count(xor(c.dhash, e.dhash)) AS INT) AS hamming
             |  FROM b c JOIN b e ON c.band = e.band AND c.bucket = e.bucket
             |  WHERE c.doc_id % 97 <> 0 AND e.doc_id % 97 = 0),
             |ver AS (SELECT doc_id, eval_id, hamming FROM cand WHERE hamming <= 6)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_eval_matches,
             |  min(hamming) AS min_hamming
             |FROM ver GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, X49HashTag, dir) { w =>
          QUtil.writeSized(imageHashes(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        def bands(h: DataFrame): DataFrame =
          hammingBands(h, "dhash", Seq("doc_id", "dhash"))
        val evalB = bands(hx.filter(col("doc_id") % 97 === 0))
          .select(col("doc_id").as("eval_id"), col("dhash").as("eval_hash"),
            col("band"), col("bucket"))
        val cand = bands(hx.filter(col("doc_id") % 97 =!= 0))
          .join(broadcast(evalB), Seq("band", "bucket"))
          .select(col("doc_id"), col("eval_id"),
            bit_count(col("dhash").bitwiseXOR(col("eval_hash")))
              .cast("int").as("hamming"))
          .distinct()
        cand.filter(col("hamming") <= 6)
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_eval_matches"),
            min(col("hamming")).as("min_hamming"))
          .orderBy("doc_id")
      }),

    // The composed MULTIMODAL curation pipeline (round 16) — x44's
    // end-to-end shape for a corpus whose documents carry images: text
    // quality gate (x37's exact shared function), image near-dup drop
    // (x57's cluster + canonical decision), and image eval-leak screen
    // (x50's exact shape) fold into ONE declarative plan emitting every
    // doc with a per-stage fail bitmask (1 = text gate, 2 = image dup
    // dropped, 4 = image contaminated) and the final kept verdict — so
    // removal rates audit per stage across modalities. Shape at 100 TB:
    // the gate is row-local; both image screens ride the shared banded
    // candidate machinery over the one hash fixture; everything meets in
    // two query-sized LEFT joins. Oracle: the shared gate CTE fragment
    // (GateSqlCtes — the same spelling x37 states) composed with the x57
    // closure and the x50 screen over identical fixture bytes.
    QDef(
      "x60_multimodal_curate",
      Some(s"""WITH RECURSIVE ${graft.queries.TextOps.GateSqlCtes},
             |h AS (
             |  SELECT doc_id, dhash
             |  FROM read_parquet('$X49HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, dhash,
             |    CAST(band AS INT) AS band,
             |    (dhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
             |  FROM b x JOIN b y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.doc_id < y.doc_id
             |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 6),
             |bidir AS (SELECT d1, d2 FROM cand UNION SELECT d2, d1 FROM cand),
             |nodes AS (SELECT DISTINCT d1 AS doc FROM bidir),
             |reach AS (
             |  SELECT doc, doc AS label FROM nodes
             |  UNION
             |  SELECT b2.d2 AS doc, r.label FROM reach r JOIN bidir b2 ON b2.d1 = r.doc),
             |lab AS (SELECT doc, CAST(MIN(label) AS BIGINT) AS cluster_id
             |        FROM reach GROUP BY doc),
             |deg AS (SELECT d1 AS doc, CAST(count(*) AS BIGINT) AS degree
             |        FROM bidir GROUP BY d1),
             |drops AS (
             |  SELECT doc FROM (
             |    SELECT l.doc,
             |      row_number() OVER (PARTITION BY l.cluster_id
             |                         ORDER BY d.degree DESC, l.doc) AS rn
             |    FROM lab l JOIN deg d ON d.doc = l.doc)
             |  WHERE rn <> 1),
             |contam AS (
             |  SELECT DISTINCT c.doc_id
             |  FROM b c JOIN b e ON c.band = e.band AND c.bucket = e.bucket
             |  WHERE c.doc_id % 97 <> 0 AND e.doc_id % 97 = 0
             |    AND bit_count(xor(c.dhash, e.dhash)) <= 6),
             |verdict AS (
             |  SELECT m.doc_id,
             |    (CASE WHEN m.fail_mask = 0 THEN 0 ELSE 1 END)
             |    + (CASE WHEN dr.doc IS NOT NULL THEN 2 ELSE 0 END)
             |    + (CASE WHEN ct.doc_id IS NOT NULL THEN 4 ELSE 0 END) AS fail_mask
             |  FROM m
             |  LEFT JOIN drops dr ON dr.doc = m.doc_id
             |  LEFT JOIN contam ct ON ct.doc_id = m.doc_id)
             |SELECT doc_id, CAST(fail_mask AS INT) AS fail_mask,
             |  fail_mask = 0 AS kept
             |FROM verdict ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, X49HashTag, dir) { w =>
          QUtil.writeSized(imageHashes(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        val b = hammingBands(hx, "dhash", Seq("doc_id", "dhash"))
        // image near-dup drops: x57's decision, memoized per session/sf
        // (the x29/clusterLabelsCached convention — the composition is the
        // operator here, not a rerun of the clustering)
        val drops = imageDupDropsCached(s, dir)
        // image contamination: x50's screen (eval side broadcast)
        val evalB = b.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("eval_id"), col("dhash").as("eval_hash"),
            col("band"), col("bucket"))
        val contam = b.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(evalB), Seq("band", "bucket"))
          .filter(bit_count(col("dhash").bitwiseXOR(col("eval_hash"))) <= 6)
          .select(col("doc_id").as("ct_doc")).distinct()
        // compose: row-local gate + two query-sized LEFT joins
        graft.queries.TextOps.qualityGate(t(s, dir, "documents"))
          .select(col("doc_id"),
            when(col("fail_mask") === 0, 0).otherwise(1).as("tfail"))
          .join(drops, col("doc_id") === col("dup_doc"), "left")
          .join(contam, col("doc_id") === col("ct_doc"), "left")
          .select(col("doc_id"),
            (col("tfail")
              + when(col("dup_doc").isNotNull, 2).otherwise(0)
              + when(col("ct_doc").isNotNull, 4).otherwise(0))
              .cast("int").as("fail_mask"))
          .withColumn("kept", col("fail_mask") === 0)
          .orderBy("doc_id")
      }),

    // AUDIO similarity search (round 16) — x49's brute-force top-k shape
    // over acoustic fingerprints, completing similarity across the
    // modalities the way x55/x56 complete decontamination: per probe clip
    // (doc_id % 50 = 0) the 5 Hamming-nearest corpus clips over aHash64,
    // ties broken by doc_id so the ranking is total. Probe set broadcast,
    // corpus touched once, no shuffle before the per-probe top-k; at
    // retrieval scale candidates screen through x51's banded equi-join
    // first. Shares x55's once-per-JVM hash fixture; the oracle replays
    // ranking over the identical fixture bytes.
    QDef(
      "x58_audio_sim_topk",
      Some(s"""WITH h AS (
             |  SELECT doc_id, ahash
             |  FROM read_parquet('${QUtil.fixturePath("x55_audio_hashes")}/*.parquet')),
             |d AS (
             |  SELECT q.doc_id AS q_id, c.doc_id AS n_id,
             |    CAST(bit_count(xor(q.ahash, c.ahash)) AS INT) AS hamming
             |  FROM h q JOIN h c ON q.doc_id % 50 = 0 AND q.doc_id <> c.doc_id),
             |r AS (
             |  SELECT q_id, n_id, hamming,
             |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS rank
             |  FROM d)
             |SELECT q_id, rank, n_id, hamming FROM r WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, "x55_audio_hashes", dir) { w =>
          QUtil.writeSized(audioHashes(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        val probes = broadcast(hx.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"), col("ahash").as("q_hash")))
        hammingTopK(
          hx.join(probes, col("q_id") =!= col("doc_id"))
            .select(col("q_id"), col("doc_id").as("n_id"),
              bit_count(col("q_hash").bitwiseXOR(col("ahash")))
                .cast("int").as("hamming")),
          5).orderBy("q_id", "rank")
      }),

    // VIDEO similarity search (round 16) — the per-clip distance is the
    // 4-slot Hamming sum of x52's fingerprints (frame-aligned by the
    // normalized sampling): per probe clip the 5 nearest corpus clips,
    // ties by doc_id. The probe side is 4 rows per query and broadcasts;
    // the slot equi-join touches the corpus hash table once and the
    // per-pair sum is map-side combinable. Shares x56's fixture; the
    // oracle replays the distance and ranking over identical bytes.
    QDef(
      "x59_video_sim_topk",
      Some(s"""WITH h AS (
             |  SELECT doc_id, slot, fhash
             |  FROM read_parquet('${QUtil.fixturePath("x56_video_hashes")}/*.parquet')),
             |d AS (
             |  SELECT q.doc_id AS q_id, c.doc_id AS n_id,
             |    CAST(sum(bit_count(xor(q.fhash, c.fhash))) AS INT) AS hamming
             |  FROM h q JOIN h c ON q.slot = c.slot
             |    AND q.doc_id % 50 = 0 AND q.doc_id <> c.doc_id
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT q_id, n_id, hamming,
             |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, n_id) AS rank
             |  FROM d)
             |SELECT q_id, rank, n_id, hamming FROM r WHERE rank <= 5
             |ORDER BY q_id, rank""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, "x56_video_hashes", dir) { w =>
          QUtil.writeSized(videoHashRows(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        val probes = broadcast(hx.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("q_id"), col("slot"),
            col("fhash").as("q_hash")))
        hammingTopK(
          hx.join(probes, Seq("slot"))
            .filter(col("q_id") =!= col("doc_id"))
            .groupBy(col("q_id"), col("doc_id").as("n_id"))
            .agg(sum(bit_count(col("q_hash").bitwiseXOR(col("fhash"))))
              .cast("int").as("hamming")),
          5).orderBy("q_id", "rank")
      }),

    // IMAGE near-dup clustering + canonical selection (round 16) — the
    // DECISION step after x46, completing the image pipeline the way
    // x16+x29 complete the text one: verified near-dup pairs become an
    // edge list, min-label propagation names each connected component
    // by its smallest member (the shared componentLabels core), and per
    // cluster exactly ONE image survives — the highest-DEGREE member
    // (most verified neighbors: the medoid-ish pick for images, where
    // x29's keep-the-longest has no analog), ties to the smallest id.
    // The drop set is what ships. Oracle: DuckDB replays the banding,
    // verification, transitive closure (recursive CTE), degree count,
    // and the keep window over the identical fixture bytes.
    QDef(
      "x57_image_dedup_canonical",
      Some(s"""WITH RECURSIVE h AS (
             |  SELECT doc_id, dhash
             |  FROM read_parquet('$X49HashFixture/*.parquet')),
             |b AS (
             |  SELECT doc_id, dhash,
             |    CAST(band AS INT) AS band,
             |    (dhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
             |  FROM b x JOIN b y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.doc_id < y.doc_id
             |  WHERE bit_count(xor(x.dhash, y.dhash)) <= 6),
             |bidir AS (SELECT d1, d2 FROM cand UNION SELECT d2, d1 FROM cand),
             |nodes AS (SELECT DISTINCT d1 AS doc FROM bidir),
             |reach AS (
             |  SELECT doc, doc AS label FROM nodes
             |  UNION
             |  SELECT b2.d2 AS doc, r.label FROM reach r JOIN bidir b2 ON b2.d1 = r.doc),
             |lab AS (SELECT doc, CAST(MIN(label) AS BIGINT) AS cluster_id
             |        FROM reach GROUP BY doc),
             |deg AS (SELECT d1 AS doc, CAST(count(*) AS BIGINT) AS degree
             |        FROM bidir GROUP BY d1)
             |SELECT l.doc AS doc_id, l.cluster_id, d.degree,
             |  row_number() OVER (PARTITION BY l.cluster_id
             |                     ORDER BY d.degree DESC, l.doc) = 1 AS keep
             |FROM lab l JOIN deg d ON d.doc = l.doc
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, X49HashTag, dir) { w =>
          QUtil.writeSized(imageHashes(s, dir), w)
        }
        val b = hammingBands(s.read.parquet(wh), "dhash", Seq("doc_id", "dhash"))
        val edges = b.as("x")
          .join(b.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.doc_id") < col("y.doc_id"))
          .filter(bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))) <= 6)
          .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .distinct()
          .localCheckpoint() // cut lineage: the loop re-references edges
        val lab = componentLabels(edges)
        val bidir = edges.unionByName(
          edges.select(col("d2").as("d1"), col("d1").as("d2")))
        val deg = bidir.groupBy(col("d1").as("doc"))
          .agg(count(lit(1)).as("degree"))
        val w2 = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")
          .orderBy(col("degree").desc, col("doc_id"))
        lab.select(col("doc").as("doc_id"), col("label").as("cluster_id"))
          .join(deg.withColumnRenamed("doc", "doc_id"), "doc_id")
          .withColumn("keep", row_number().over(w2) === 1)
          .orderBy("doc_id")
      }),

    // AUDIO decontamination (round 16) — with this and x56 the eval-leak
    // screen covers EVERY modality (x24 verbatim text, x47 fuzzy text,
    // x50 images, x55 audio, x56 video): an eval suite's audio clips must
    // not appear — resampled, gain-shifted — in the training corpus. The
    // exact x50 shape over x51's acoustic fingerprints: the evaluation-
    // suite-sized side broadcasts into the shared hammingBands candidate
    // join, exact bit_count(xor) verification at <= 6, one auditable
    // verdict row per contaminated corpus clip.
    QDef(
      "x55_audio_decontaminate",
      Some(s"""WITH h AS (
             |  SELECT doc_id, ahash
             |  FROM read_parquet('${QUtil.fixturePath("x55_audio_hashes")}/*.parquet')),
             |b AS (
             |  SELECT doc_id, ahash,
             |    CAST(band AS INT) AS band,
             |    (ahash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id,
             |    CAST(bit_count(xor(c.ahash, e.ahash)) AS INT) AS hamming
             |  FROM b c JOIN b e ON c.band = e.band AND c.bucket = e.bucket
             |  WHERE c.doc_id % 97 <> 0 AND e.doc_id % 97 = 0),
             |ver AS (SELECT doc_id, eval_id, hamming FROM cand WHERE hamming <= 6)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_eval_matches,
             |  min(hamming) AS min_hamming
             |FROM ver GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, "x55_audio_hashes", dir) { w =>
          QUtil.writeSized(audioHashes(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        def bands(h: DataFrame): DataFrame =
          hammingBands(h, "ahash", Seq("doc_id", "ahash"))
        val evalB = bands(hx.filter(col("doc_id") % 97 === 0))
          .select(col("doc_id").as("eval_id"), col("ahash").as("eval_hash"),
            col("band"), col("bucket"))
        val cand = bands(hx.filter(col("doc_id") % 97 =!= 0))
          .join(broadcast(evalB), Seq("band", "bucket"))
          .select(col("doc_id"), col("eval_id"),
            bit_count(col("ahash").bitwiseXOR(col("eval_hash")))
              .cast("int").as("hamming"))
          .distinct()
        cand.filter(col("hamming") <= 6)
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_eval_matches"),
            min(col("hamming")).as("min_hamming"))
          .orderBy("doc_id")
      }),

    // VIDEO decontamination (round 16) — the last modality's eval-leak
    // screen: x52's per-slot fingerprints, candidates via the
    // (slot, band, bucket) equi-join with the eval side broadcast, then
    // exact verification joins the 4 hash rows back per candidate pair
    // (candidates-bounded) and keeps pairs within 24 total bits — the
    // x52 verification threshold. One verdict row per contaminated
    // corpus clip with its eval-match count and closest distance.
    QDef(
      "x56_video_decontaminate",
      Some(s"""WITH h AS (
             |  SELECT doc_id, slot, fhash
             |  FROM read_parquet('${QUtil.fixturePath("x56_video_hashes")}/*.parquet')),
             |b AS (
             |  SELECT doc_id, slot, fhash,
             |    CAST(band AS INT) AS band,
             |    (fhash >> (16 * CAST(band AS INT))) & 65535 AS bucket
             |  FROM h, unnest(range(0, 4)) t(band)),
             |cand AS (
             |  SELECT DISTINCT c.doc_id AS doc_id, e.doc_id AS eval_id
             |  FROM b c JOIN b e
             |    ON c.slot = e.slot AND c.band = e.band AND c.bucket = e.bucket
             |  WHERE c.doc_id % 97 <> 0 AND e.doc_id % 97 = 0),
             |ver AS (
             |  SELECT cand.doc_id, cand.eval_id,
             |    CAST(sum(bit_count(xor(a.fhash, z.fhash))) AS INT) AS hamming
             |  FROM cand
             |  JOIN h a ON a.doc_id = cand.doc_id
             |  JOIN h z ON z.doc_id = cand.eval_id AND z.slot = a.slot
             |  GROUP BY cand.doc_id, cand.eval_id)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_eval_matches,
             |  min(hamming) AS min_hamming
             |FROM ver WHERE hamming <= 24
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val wh = cachedFixture(s, "x56_video_hashes", dir) { w =>
          QUtil.writeSized(videoHashRows(s, dir), w)
        }
        val hx = s.read.parquet(wh)
        def bands(h: DataFrame): DataFrame =
          hammingBands(h, "fhash", Seq("doc_id", "slot"))
        val evalB = bands(hx.filter(col("doc_id") % 97 === 0))
          .select(col("doc_id").as("eval_id"), col("slot"),
            col("band"), col("bucket"))
        val cand = bands(hx.filter(col("doc_id") % 97 =!= 0))
          .join(broadcast(evalB), Seq("slot", "band", "bucket"))
          .select(col("doc_id").as("cd"), col("eval_id")).distinct()
        val ver = cand
          .join(hx.as("a"), col("cd") === col("a.doc_id"))
          .join(hx.as("z"),
            col("eval_id") === col("z.doc_id") && col("a.slot") === col("z.slot"))
          .groupBy(col("cd"), col("eval_id"))
          .agg(sum(bit_count(col("a.fhash").bitwiseXOR(col("z.fhash"))))
            .cast("int").as("hamming"))
          .withColumnRenamed("cd", "doc_id")
        ver.filter(col("hamming") <= 24)
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_eval_matches"),
            min(col("hamming")).as("min_hamming"))
          .orderBy("doc_id")
      })
  )
}
