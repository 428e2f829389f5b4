package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QUtil._

/** Text-analysis operators for large-scale training-data pipelines, run over
  * the `documents` table: token counting, quality scoring, n-gram-heuristic
  * language ID, and document fingerprinting. All are per-row (narrow, no
  * shuffle beyond the final presentation sort) and whole-stage-codegen
  * friendly: built from `org.apache.spark.sql.functions` only — no UDFs —
  * so they scale linearly with document count.
  */
object TextOps {

  /** Where x26b materializes its per-doc BPE token counts: written by the
    * Spark query (via `QUtil.freshWarehouse(s, X26bCountsTag)`), read back
    * by the SAME query (so the compared result derives from the file
    * bytes) and by the DuckDB oracle (which replays the whole mixing
    * decision over the counts). Path derived from the ONE shared
    * QUtil.WarehouseRoot constant — never spelled independently — and
    * declared ABOVE the query list: a COMPUTED val referenced from the
    * oracle-string interpolation below would read null under Scala's
    * textual object-initialization order if it lived after it (exactly
    * the r16 gate failure that moved it here).
    */
  private[graft] final val X26bCountsTag = "x26b_bpe_counts"
  private[graft] final val X26bCountsFixture = QUtil.fixturePath(X26bCountsTag)

  /** Where x40 materializes its learned merge table (rank, left, right):
    * written by the Spark query, read back by the same query (so the
    * encoder applies exactly the fixture's bytes) and by the DuckDB
    * oracle, which REPLAYS the sequential-rank BPE encode per word over
    * it (see the x40 QDef). Same init-order rule as the x26b fixture.
    */
  private[graft] final val X40MergesTag = "x40_bpe_merges"
  private[graft] final val X40MergesFixture = QUtil.fixturePath(X40MergesTag)

  /** Where x48 materializes its per-image patch-token counts (from REAL
    * decoded dimensions — DuckDB cannot decode images, so the oracle
    * consumes the fixture and replays everything downstream of the
    * decode). Same init-order rule as the other fixtures above.
    */
  private[graft] final val X48ImageTokTag = "x48_image_tokens"
  private[graft] final val X48ImageTokFixture = QUtil.fixturePath(X48ImageTokTag)

  // Token-boundary markers for the x40 oracle's string-rewriting replay:
  // a segmentation [t1, t2, ...] is encoded as STX t1 ETX STX t2 ETX ...,
  // so a merge (l, r) is a plain (non-regex) replace of STX l ETX STX r ETX
  // with STX l r ETX — matches only COMPLETE adjacent tokens, and
  // DuckDB's replace() scans left-to-right without rescanning its own
  // replacement text, which is exactly BPE's fold-occurrences-left-to-
  // right-non-overlapping pass. Control characters never appear in the
  // corpus text (a stray one would surface as a loud oracle mismatch,
  // never a silent agreement).
  private val Stx = "\u0002"
  private val Etx = "\u0003"

  /** Whitespace tokenization shared by the text operators. */
  private def tokens: Column = split(trim(col("text")), "\\s+")

  /** The ONE bigram derivation (x15 exact counts, x68 sketch, st19's
    * streaming sketch): adjacent token pairs built row-locally from any
    * frame with a `text` column — batch or streaming. A second inline copy
    * would let a tokenization fix drift the "matches x15's oracle by
    * proof" claims silently.
    */
  private[graft] def bigramsOf(docs: DataFrame): DataFrame =
    docs.select(tokens.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(tk)-2), i -> concat_ws(' ', tk[i], tk[i+1]))"))
        .as("bigram"))

  /** Shared DuckDB spelling of [[bigramsOf]] + exact counting (the `bg`
    * CTE). x15 limits it to 100, x68/st19 rank its top 20.
    */
  private[graft] val bigramCtesSql: String =
    """toks AS (
      |  SELECT string_split_regex(trim(text), '\s+') tk FROM documents
      |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
      |bg AS (
      |  SELECT tk[CAST(i AS INT)+1] || ' ' || tk[CAST(i AS INT)+2] AS bigram,
      |    CAST(COUNT(*) AS BIGINT) freq
      |  FROM toks, unnest(range(0, len(tk)-1)) g(i) GROUP BY 1)""".stripMargin

  /** The ranked exact top-20 heavy hitters — x68's AND st19's oracle (one
    * string, so the batch sketch, the streaming sketch, and the exact
    * definition cannot drift).
    */
  private[graft] val bigramTop20OracleSql: String =
    s"""WITH $bigramCtesSql
       |SELECT CAST(row_number() OVER (ORDER BY freq DESC, bigram) AS INT) rank,
       |  bigram, freq
       |FROM bg ORDER BY freq DESC, bigram LIMIT 20""".stripMargin

  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is")
  // stand-in banned-term set for the blocklist screening op (x34)
  private val blocklist = Seq("slow", "stream", "window")
  private val enMarkers = Seq("the", "and", "of", "to", "in", "is")
  private val deMarkers = Seq("der", "die", "und", "das", "ist", "nicht")
  private val esMarkers = Seq("el", "la", "los", "que", "por", "con")

  private def countIn(set: Seq[String]): Column =
    size(filter(tokens, tk => tk.isin(set: _*)))

  private def sqlList(set: Seq[String]): String =
    set.map(s => s"'$s'").mkString(", ")

  val defs: Seq[QDef] = Seq(

    // Token counting (whitespace tokenizer).
    QDef(
      "x8_text_tokens",
      Some("""SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), size(tokens).as("n_tokens"))
          .orderBy("doc_id")),

    // Quality scoring: length / punctuation / digit / stopword / word-shape
    // signals. All ratios are double divisions of exact integer counts, so
    // they are bit-identical across engines.
    QDef(
      "x9_text_quality",
      Some(s"""SELECT doc_id,
              |  length(text) AS n_chars_m,
              |  len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
              |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
              |  CASE WHEN length(text) > 0
              |    THEN CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
              |    ELSE 0.0 END AS punct_ratio,
              |  CASE WHEN length(text) > 0
              |    THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
              |    ELSE 0.0 END AS digit_ratio,
              |  CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |       tk -> tk IN (${sqlList(stopwords)}))) AS DOUBLE)
              |    / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
              |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
              |    / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
              |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text")).as("n_chars_m"),
            size(tokens).as("n_tokens"),
            regexp_count(col("text"), lit("[.,;:!?]")).as("n_punct"),
            // length guard keeps the division total under ANSI mode (an
            // empty text would otherwise throw DIVIDE_BY_ZERO)
            when(length(col("text")) > 0,
              regexp_count(col("text"), lit("[.,;:!?]")).cast("double")
                / length(col("text"))).otherwise(lit(0.0)).as("punct_ratio"),
            when(length(col("text")) > 0,
              regexp_count(col("text"), lit("[0-9]")).cast("double")
                / length(col("text"))).otherwise(lit(0.0)).as("digit_ratio"),
            (countIn(stopwords).cast("double") / size(tokens)).as("stopword_ratio"),
            (length(regexp_replace(col("text"), "\\s", "")).cast("double") / size(tokens)).as("avg_token_len"))
          .orderBy("doc_id")),

    // Language ID: marker-word n-gram heuristic with a deterministic
    // tie-break (en > de > es, 'und' when no markers at all).
    QDef(
      "x10_text_langid",
      Some(s"""WITH c AS (
              |  SELECT doc_id, lang,
              |    len(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk IN (${sqlList(enMarkers)}))) AS c_en,
              |    len(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk IN (${sqlList(deMarkers)}))) AS c_de,
              |    len(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk IN (${sqlList(esMarkers)}))) AS c_es
              |  FROM documents)
              |SELECT doc_id, lang, c_en, c_de, c_es,
              |  CASE WHEN c_en = 0 AND c_de = 0 AND c_es = 0 THEN 'und'
              |       WHEN c_en >= c_de AND c_en >= c_es THEN 'en'
              |       WHEN c_de >= c_es THEN 'de'
              |       ELSE 'es' END AS predicted_lang
              |FROM c ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val base = t(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            countIn(enMarkers).as("c_en"),
            countIn(deMarkers).as("c_de"),
            countIn(esMarkers).as("c_es"))
        base.select(
          col("doc_id"), col("lang"), col("c_en"), col("c_de"), col("c_es"),
          when(col("c_en") === 0 && col("c_de") === 0 && col("c_es") === 0, "und")
            .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es"), "en")
            .when(col("c_de") >= col("c_es"), "de")
            .otherwise("es").as("predicted_lang"))
          .orderBy("doc_id")
      }),

    // Document fingerprinting: content hash of the punctuation/whitespace
    // normalized text (md5 produces identical lowercase hex in both engines).
    QDef(
      "x11_text_fingerprint",
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(
              regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
              " +", " "))).as("fingerprint"))
          .orderBy("doc_id")),

    // Corpus vocabulary: global token frequencies, top 100. One explode +
    // one map-side-combinable groupBy — the canonical first step of any
    // tokenizer/vocab build, linear in corpus size.
    QDef(
      "x14_vocab_topk",
      Some("""SELECT tk AS token, COUNT(*) AS freq
             |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) tk FROM documents)
             |GROUP BY tk ORDER BY freq DESC, token LIMIT 100""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(explode(tokens).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token"))
          .limit(100)),

    // Bigram language-model counts: adjacent token pairs built row-locally
    // (no self-join), then one global aggregation; top 100.
    QDef(
      "x15_bigram_counts",
      Some(s"""WITH $bigramCtesSql
             |SELECT bigram, freq FROM bg
             |ORDER BY freq DESC, bigram LIMIT 100""".stripMargin),
      (s, dir) =>
        bigramsOf(t(s, dir, "documents"))
          .groupBy("bigram").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("bigram"))
          .limit(100)),

    // HEAVY HITTERS via a bounded-memory sketch (round 19) — x15 counts
    // bigrams with a full groupBy, which shuffles the whole key space; the
    // n-gram space is quadratic in vocabulary, so at web scale the
    // counting pass itself must be capacity-bounded. x68 runs the SAME
    // top-20 through the Misra-Gries typed aggregator
    // (functions/FreqSketch.scala): ONE global aggregation whose partials
    // hold <= capacity counters and merge associatively (Agarwal et al.'s
    // mergeable summaries) — <= capacity (key, count) pairs per partition
    // cross the shuffle, never the token stream, and any key with true
    // frequency above N/(capacity+1) is guaranteed to survive. The sketch
    // SELF-CERTIFIES exactness (an eviction flag in the buffer): on this
    // corpus distinct bigrams <= capacity, so no count was ever
    // decremented, the certificate is required in-query (the bm25Guard
    // discipline — the failure message names the capacity knob and the
    // lower-bound semantics that take over past it), and the top-20
    // matches x15's exact oracle BY PROOF, not by luck. Ranking happens on
    // the capacity-bounded driver-side result (<= 4096 pairs — k-sized,
    // never a stage).
    QDef(
      "x68_heavy_hitters",
      Some(bigramTop20OracleSql),
      (s, dir) => {
        import s.implicits._
        val capacity = 4096
        val bigrams = bigramsOf(t(s, dir, "documents"))
        val agg = new graft.functions.FreqSketchAggregator(capacity).toColumn
        val (pairs, exact) =
          bigrams.as[String].select(agg.name("hh")).collect()(0)
        require(exact,
          s"x68: the Misra-Gries sketch evicted — more than $capacity " +
            "distinct bigrams, so counts are N/(capacity+1)-error lower " +
            "bounds, not exact; raise the capacity (memory is " +
            "O(capacity)) or accept approximate heavy hitters and drop " +
            "this oracle comparison")
        val rows = pairs.take(20).zipWithIndex.map { case ((b, c), i) =>
          (i + 1, b, c)
        }
        rows.toSeq.toDF("rank", "bigram", "freq")
      }),

    // Quality filtering: the keep/drop decision a training pipeline makes
    // from the x9 signals — thresholds on length, punctuation/digit ratios,
    // stopword presence, and token shape. Pure row-local predicate.
    QDef(
      "x17_quality_filter",
      Some(s"""WITH q AS (
              |  SELECT doc_id, lang,
              |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
              |    CASE WHEN length(text) > 0
              |      THEN CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
              |      ELSE 0.0 END AS punct_ratio,
              |    CASE WHEN length(text) > 0
              |      THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
              |      ELSE 0.0 END AS digit_ratio,
              |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |         tk -> tk IN (${sqlList(stopwords)}))) AS DOUBLE)
              |      / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio
              |  FROM documents)
              |SELECT doc_id, lang, n_tokens FROM q
              |WHERE n_tokens BETWEEN 5 AND 5000
              |  AND punct_ratio <= 0.10 AND digit_ratio <= 0.20
              |  AND stopword_ratio >= 0.01
              |ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"), col("lang"),
            size(tokens).as("n_tokens"),
            when(length(col("text")) > 0,
              regexp_count(col("text"), lit("[.,;:!?]")).cast("double")
                / length(col("text"))).otherwise(lit(0.0)).as("punct_ratio"),
            when(length(col("text")) > 0,
              regexp_count(col("text"), lit("[0-9]")).cast("double")
                / length(col("text"))).otherwise(lit(0.0)).as("digit_ratio"),
            (countIn(stopwords).cast("double") / size(tokens)).as("stopword_ratio"))
          .filter(col("n_tokens").between(5, 5000)
            && col("punct_ratio") <= 0.10 && col("digit_ratio") <= 0.20
            && col("stopword_ratio") >= 0.01)
          .select("doc_id", "lang", "n_tokens")
          .orderBy("doc_id")),

    // Blocklist / safety filtering — the term-level screening pass every
    // production corpus runs before training (banned-term scrub): a
    // broadcastable term set, a per-doc hit count, and a verdict at a hit
    // threshold. Entirely row-local (one tokenize + one array filter, no
    // shuffle, the set ships as literals) — the map-only shape at 100 TB;
    // a real deployment swaps the literal list for a broadcast
    // bloom/hash set, same plan. Every doc is emitted WITH its verdict
    // (not pre-filtered) so downstream stages can audit removal rates.
    QDef(
      "x34_blocklist_filter",
      Some(s"""WITH h AS (
              |  SELECT doc_id,
              |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              |         tk -> tk IN (${sqlList(blocklist)}))) AS INT) AS n_hits
              |  FROM documents)
              |SELECT doc_id, n_hits, n_hits >= 3 AS flagged
              |FROM h ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), countIn(blocklist).cast("int").as("n_hits"))
          .withColumn("flagged", col("n_hits") >= 3)
          .orderBy("doc_id")),

    // The composed quality GATE (round 10): every per-doc signal family —
    // shape thresholds (x9/x17), repetition (x21), blocklist (x34) — folded
    // into ONE auditable verdict pass. Unlike x17 (which emits only the
    // keeps), every document comes out with a per-rule FAIL BITMASK, so the
    // pipeline can report removal rates per rule and re-litigate any
    // threshold without re-reading the corpus — the shape production
    // filter stacks actually ship. Entirely row-local: one tokenize, no
    // shuffle, map-only at 100 TB.
    QDef(
      "x37_quality_gate",
      Some(s"""WITH $GateSqlCtes
              |SELECT doc_id, n_tokens, fail_mask, fail_mask = 0 AS keep
              |FROM m ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        qualityGate(t(s, dir, "documents")).orderBy("doc_id")),

    // Stratified sampling: exactly 30 docs per language, selected by a
    // deterministic hash ordering (md5 of doc_id) — reproducible "random"
    // sampling with per-stratum quotas, the shape training-data mixes use.
    // One window sort per stratum; at scale the rank is computed per
    // partition-group, never globally.
    QDef(
      "x18_stratified_sample",
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 30 ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            org.apache.spark.sql.functions.row_number().over(w).as("rn"))
          .filter(col("rn") <= 30)
          .select("doc_id", "lang")
          .orderBy("doc_id")
      }),

    // TF-IDF building blocks with exact integer arithmetic: per-(doc, token)
    // term frequency joined to global document frequency, for tokens in at
    // least 100 docs. (The log-weighting step is left in exact counts so the
    // cross-engine compare stays bit-perfect; any downstream scorer applies
    // its own idf formula.) Two map-side-combinable aggregations + one
    // broadcastable join on the df side.
    QDef(
      "x19_tfidf_counts",
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk FROM documents),
             |tf AS (SELECT doc_id, tk, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
             |df AS (SELECT tk, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1)
             |SELECT doc_id, tk AS token, tf, df FROM tf JOIN df USING (tk)
             |WHERE df >= 100 ORDER BY doc_id, token""".stripMargin),
      (s, dir) => {
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(tokens).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tok.groupBy("token")
          .agg(countDistinct("doc_id").as("df"))
          .filter(col("df") >= 100)
        tf.join(broadcast(df), Seq("token"))
          .select("doc_id", "token", "tf", "df")
          .orderBy("doc_id", "token")
      }),

    // PII redaction: the scrub step every training pipeline runs before
    // anything else sees the text. The document text is first salted with
    // deterministic synthetic PII (email, IPv4, phone — built from doc_id /
    // source, so both engines construct the identical input), then masked by
    // three chained regexp_replace passes. Pure row-local codegen'd regex —
    // no UDFs, no shuffle; per-pattern match counts are emitted so the
    // redaction volume is auditable.
    QDef(
      "x20_pii_redact",
      Some("""WITH salted AS (
             |  SELECT doc_id,
             |    'contact user' || CAST(doc_id AS VARCHAR) || '@' || source || '.com ip 10.'
             |      || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
             |      || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |      || ' ' || substring(text, 1, 40) AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(raw,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted,
             |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             |  len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
             |  len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS n_phone
             |FROM salted ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phoneRe = "\\b\\d{3}-\\d{4}\\b"
        val raw = concat(
          lit("contact user"), col("doc_id").cast("string"), lit("@"),
          col("source"), lit(".com ip 10."),
          (col("doc_id") % 256).cast("string"), lit(".0."),
          (col("doc_id") % 100).cast("string"), lit(" tel 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" "), substring(col("text"), 1, 40))
        t(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(
            col("doc_id"),
            regexp_replace(regexp_replace(regexp_replace(col("raw"),
              lit(emailRe), lit("<EMAIL>")),
              lit(ipRe), lit("<IP>")),
              lit(phoneRe), lit("<PHONE>")).as("redacted"),
            regexp_count(col("raw"), lit(emailRe)).as("n_email"),
            regexp_count(col("raw"), lit(ipRe)).as("n_ip"),
            regexp_count(col("raw"), lit(phoneRe)).as("n_phone"))
          .orderBy("doc_id")
      }),

    // Repetition signals (the Gopher-style quality rules): distinct-token
    // ratio, most-frequent-token fraction, and most-frequent-bigram fraction,
    // all computed ROW-LOCALLY with higher-order array functions — no
    // explode, no shuffle; cost is O(tokens x per-doc vocab) per row, bounded
    // by document length, so the operator stays narrow at any corpus size.
    // Ratios are double divisions of exact integer counts (bit-identical
    // across engines).
    QDef(
      "x21_repetition_signals",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
             |  FROM documents
             |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
             |bg AS (
             |  SELECT doc_id, tk,
             |    list_transform(range(1, len(tk)),
             |      i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT)+1]) AS bg
             |  FROM tk)
             |SELECT doc_id, len(tk) AS n_tokens,
             |  CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS distinct_ratio,
             |  CAST(list_max(list_transform(list_distinct(tk),
             |    x -> len(list_filter(tk, y -> y = x)))) AS DOUBLE) / len(tk) AS top_token_frac,
             |  CAST(list_max(list_transform(list_distinct(bg),
             |    x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg) AS top_bigram_frac
             |FROM bg ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), tokens.as("tk"))
          .filter(size(col("tk")) >= 2)
          .withColumn("bg",
            expr("transform(sequence(0, size(tk)-2), i -> concat_ws(' ', tk[i], tk[i+1]))"))
          .select(
            col("doc_id"),
            size(col("tk")).as("n_tokens"),
            (size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
              .as("distinct_ratio"),
            (expr("array_max(transform(array_distinct(tk), x -> size(filter(tk, y -> y = x))))")
              .cast("double") / size(col("tk"))).as("top_token_frac"),
            (expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
              .cast("double") / size(col("bg"))).as("top_bigram_frac"))
          .orderBy("doc_id")),

    // Unicode canonicalization: NFC-normalize + control-character strip, the
    // first cleaning pass of a text pipeline (mixed composed/decomposed
    // spellings hash differently and break dedup). NFC has no Spark builtin,
    // so it runs as graft's native codegen'd expression `nfc_normalize`
    // (graft.functions.NfcNormalize — the custom-Expression extension point,
    // matching DuckDB's nfc_normalize bit-for-bit). The input is salted with
    // a decomposed "cafe" + combining-acute and a BEL control char so the
    // normalization is exercised on every row; character counts before/after
    // prove the composition happened (both engines count codepoints).
    QDef(
      "x22_unicode_clean",
      Some("""WITH salted AS (
             |  SELECT doc_id,
             |    substring(text, 1, 24) || ' cafe' || chr(769) || ' ' || lang || chr(7) AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  regexp_replace(nfc_normalize(raw), '[\x00-\x1F\x7F]', '', 'g') AS cleaned,
             |  length(raw) AS n_before,
             |  length(regexp_replace(nfc_normalize(raw), '[\x00-\x1F\x7F]', '', 'g')) AS n_after
             |FROM salted ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val raw = concat(substring(col("text"), 1, 24),
          lit(" café "), col("lang"), lit(""))
        val cleaned = regexp_replace(
          call_function("nfc_normalize", col("raw")), "[\\x00-\\x1F\\x7F]", "")
        t(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(
            col("doc_id"),
            cleaned.as("cleaned"),
            length(col("raw")).as("n_before"),
            length(cleaned).as("n_after"))
          .orderBy("doc_id")
      }),

    // Document chunking: split each document into fixed-token windows with
    // overlap (stride = window − overlap) — how corpora are shaped into
    // training sequences. Chunk starts are generated ROW-LOCALLY
    // (sequence/transform over the token array, no self-join); one explode
    // turns docs into chunks, so the operator is a narrow map + explode that
    // scales linearly. Chunk ids are deterministic (doc_id, start).
    QDef(
      "x23_doc_chunks",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
             |  FROM documents),
             |starts AS (
             |  SELECT doc_id, tk, unnest(range(0, greatest(len(tk) - 24, 1), 40)) AS start
             |  FROM tk)
             |SELECT doc_id, CAST(start AS INT) AS start,
             |  len(list_slice(tk, CAST(start AS INT) + 1, CAST(start AS INT) + 64)) AS n_tokens,
             |  array_to_string(list_slice(tk, CAST(start AS INT) + 1, CAST(start AS INT) + 64), ' ') AS chunk
             |FROM starts ORDER BY doc_id, start""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), tokens.as("tk"))
          // window 64 tokens, stride 40 (overlap 24); last partial window
          // kept — same arithmetic spelled in both engines
          .withColumn("start",
            explode(expr("sequence(0, greatest(size(tk) - 24 - 1, 0), 40)")))
          .select(
            col("doc_id"), col("start").cast("int").as("start"),
            expr("size(slice(tk, start + 1, 64))").as("n_tokens"),
            expr("array_join(slice(tk, start + 1, 64), ' ')").as("chunk"))
          .orderBy("doc_id", "start")),

    // Benchmark decontamination: flag training documents sharing verbatim
    // n-grams with a held-out eval set (doc_id % 97 — stand-in for a
    // benchmark), the standard train/test-overlap check run before every
    // training run. Shape: row-local shingling -> explode -> distinct ->
    // BROADCAST the (small) eval-gram set -> semi-join-style count per
    // train doc. At 100 TB the eval side stays benchmark-sized, so the join
    // never shuffles the corpus. n=3 here because the synthetic corpus
    // draws from a ~30-word vocabulary (real pipelines use 8-13 grams —
    // the arithmetic is identical, only the constant changes).
    QDef(
      "x24_decontaminate",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
             |grams AS (
             |  SELECT doc_id,
             |    array_to_string(list_slice(tk, CAST(i AS INT)+1, CAST(i AS INT)+3), ' ') AS g
             |  FROM tk, unnest(range(0, greatest(len(tk)-2, 0))) t(i)),
             |eval AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
             |hits AS (
             |  SELECT DISTINCT gr.doc_id, gr.g FROM grams gr JOIN eval USING (g)
             |  WHERE gr.doc_id % 97 <> 0)
             |SELECT doc_id, count(*) AS n_shared FROM hits
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val n = 3
        val grams = t(s, dir, "documents")
          .select(col("doc_id"), tokens.as("tk"))
          .filter(size(col("tk")) >= n) // sequence() reverses on start>stop
          .select(col("doc_id"), explode(expr(
            s"transform(sequence(0, size(tk) - $n), " +
              s"i -> array_join(slice(tk, i + 1, $n), ' '))")).as("g"))
        val evalGrams = grams.filter(col("doc_id") % 97 === 0)
          .select("g").distinct()
        grams.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(evalGrams), Seq("g"))
          .select("doc_id", "g").distinct()
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      }),

    // Multimodal plumbing: opaque binary payload + typed metadata. The text
    // column stands in for an image/audio blob; the operator extracts byte
    // length and a sha-256 content id — the same shape a real decode/feature
    // pipeline hangs off (see graft.operators.Multimodal for the batch path).
    QDef(
      "x12_multimodal_meta",
      Some("""SELECT doc_id,
             |  strlen(text) AS n_bytes,
             |  sha256(text) AS content_id,
             |  substring(md5(text), 1, 16) AS short_id
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            sha2(col("text"), 256).as("content_id"),
            substring(md5(col("text")), 1, 16).as("short_id"))
          .orderBy("doc_id")),

    // Token-budgeted data MIXING (round 5) — the mixture-rebalancing pass a
    // training pipeline runs after filtering: each language gets a token
    // budget (60% of the uniform per-language share here; any policy works)
    // and is deterministically DOWNSAMPLED to it. Selection is a pure
    // function of doc_id — keep iff the first 8 md5 hex digits sort below
    // the language's fraction threshold — so the sample is reproducible,
    // shuffle-free (one broadcast of per-language thresholds; the corpus is
    // touched once), and any engine recomputes the identical subset. Over-
    // budget languages shrink toward the target; under-budget ones pass
    // through whole (f clamps at 1).
    QDef(
      "x26_token_budget_mix",
      Some("""WITH d AS (
             |  SELECT doc_id, lang,
             |    len(string_split_regex(trim(text), '\s+')) AS tokens
             |  FROM documents),
             |pl AS (SELECT lang, SUM(tokens) AS lang_tokens FROM d GROUP BY lang),
             |st AS (SELECT SUM(lang_tokens) AS all_tokens, COUNT(*) AS n_langs FROM pl),
             |fr AS (SELECT lang,
             |         LEAST(1.0, (0.6 * (CAST(all_tokens AS DOUBLE) / n_langs))
             |                    / CAST(lang_tokens AS DOUBLE)) AS f
             |       FROM pl, st),
             |th AS (SELECT lang, CASE WHEN f >= 1.0 THEN 'g'
             |         ELSE printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT)) END AS thr
             |       FROM fr)
             |SELECT d.doc_id, d.lang, d.tokens
             |FROM d JOIN th ON d.lang = th.lang
             |WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.thr
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) =>
        budgetMix(t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            size(split(trim(col("text")), "\\s+")).as("tokens")))),

    // x26 with REAL token counts (round 14; oracled round 15): the same
    // budget arithmetic, but `tokens` is the x40 BPE encoder's output
    // instead of a whitespace proxy — the form a production mixer actually
    // runs, since budgets are contracted in model tokens. One extra corpus
    // pass (the encode) over x26; the mixing plan is shared (budgetMix).
    // DuckDB cannot replay the iterative BPE fold, but the BUDGET
    // ARITHMETIC is plain SQL: the per-doc counts are materialized to a
    // parquet fixture BOTH engines read (the Spark side reads it back so
    // the compared result and the oracle input are byte-identical), and
    // the oracle replays the whole mixing decision over that column. The
    // encode itself stays spec-gated (TextBpeSpec proves it merge-for-
    // merge against a sequential reference, and re-derives this exact
    // selection row-for-row).
    QDef(
      "x26b_token_budget_mix_bpe",
      Some(s"""WITH d AS (
             |  SELECT doc_id, lang, tokens
             |  FROM read_parquet('$X26bCountsFixture/*.parquet')),
             |pl AS (SELECT lang, SUM(tokens) AS lang_tokens FROM d GROUP BY lang),
             |st AS (SELECT SUM(lang_tokens) AS all_tokens, COUNT(*) AS n_langs FROM pl),
             |fr AS (SELECT lang,
             |         LEAST(1.0, (0.6 * (CAST(all_tokens AS DOUBLE) / n_langs))
             |                    / CAST(lang_tokens AS DOUBLE)) AS f
             |       FROM pl, st),
             |th AS (SELECT lang, CASE WHEN f >= 1.0 THEN 'g'
             |         ELSE printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT)) END AS thr
             |       FROM fr)
             |SELECT d.doc_id, d.lang, d.tokens
             |FROM d JOIN th ON d.lang = th.lang
             |WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < th.thr
             |ORDER BY d.doc_id""".stripMargin),
      (s, dir) => {
        val learned = bpeTrain(s, dir, merges = 15).collect() // merge-count rows
          .sortBy(_.getInt(0))
          .map(r => (r.getString(1), r.getString(2))).toSeq
        encodeBpe(t(s, dir, "documents"), learned)
          .select(col("doc_id"), col("lang"), col("n_tokens").as("tokens"))
          .hint("rebalance").write.mode("overwrite").parquet(
            QUtil.freshWarehouse(s, X26bCountsTag))
        budgetMix(s.read.parquet(X26bCountsFixture))
      }),

    // Sequence PACKING (round 14) — the concatenate-and-chunk pass that
    // turns documents into fixed-length training sequences (the GPT-style
    // pack: docs concatenate in order, the stream is cut every L tokens,
    // docs may straddle a cut). Per doc: which sequences it lands in —
    // start_seq/end_seq from the running token total, a pure prefix sum.
    // Scale shape: packing is SHARDED (`graft.x42.shards`, default 32; a
    // 100 TB corpus raises the shard count to its writer parallelism —
    // more shards = more parallel prefix sums, slightly more padding
    // waste at shard boundaries) so the window
    // runs per shard with no global sort or single-partition stage —
    // sequence ids are (shard, seq) pairs exactly as a sharded tokenizer
    // run would emit them. Everything is a deterministic function of the
    // (doc_id-ordered) corpus, so any engine reproduces the identical
    // packing; tokens >= 1 for every doc (split of "" is [""]), keeping
    // cum-1 non-negative where DuckDB's floor-// and Spark's truncating
    // div would otherwise disagree.
    QDef(
      "x42_sequence_pack",
      // the oracle states the DEFAULT shard count (compile-time lockstep
      // via X42DefaultShards); the conf exists for deployments, and
      // QueriesSpec proves a non-default count against an independent
      // sequential reference
      Some(s"""WITH d AS (
             |  SELECT doc_id, doc_id % $X42DefaultShards AS shard,
             |    len(string_split_regex(trim(text), '\\s+')) AS tokens
             |  FROM documents),
             |c AS (SELECT doc_id, shard, tokens,
             |        SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM d)
             |SELECT doc_id, shard, tokens,
             |  CAST((cum - tokens) // 512 AS BIGINT) AS start_seq,
             |  CAST((cum - 1) // 512 AS BIGINT) AS end_seq
             |FROM c ORDER BY doc_id""".stripMargin),
      (s, dir) => sequencePack(
        t(s, dir, "documents"),
        s.conf.getOption("graft.x42.shards").map(_.toInt)
          .getOrElse(X42DefaultShards))),

    // Interleaved MULTIMODAL packing (round 16) — the training-sequence
    // shape of a vision-language corpus: each document contributes its
    // text tokens PLUS its image's patch tokens (ceil(w/16) x ceil(h/16)
    // from REAL decoded dimensions — the ViT patch-grid arithmetic), and
    // the interleaved stream packs into fixed 512-token sequences in doc
    // order, sharded exactly like x42 (one shared packWindow — the two
    // packers cannot drift). Integer-exact throughout. The image corpus
    // is x46's deterministic one (a real pipeline reads its payload
    // column at that point); per-image patch counts are materialized to
    // a parquet fixture because the oracle cannot decode images — DuckDB
    // replays everything downstream of the decode: text tokenization,
    // the interleave sum, and the sharded prefix-sum pack.
    QDef(
      "x48_vlm_sequence_pack",
      Some(s"""WITH it AS (
             |  SELECT doc_id, image_tokens
             |  FROM read_parquet('$X48ImageTokFixture/*.parquet')),
             |d AS (
             |  SELECT d0.doc_id, d0.doc_id % $X42DefaultShards AS shard,
             |    len(string_split_regex(trim(text), '\\s+')) AS text_tokens,
             |    it.image_tokens,
             |    len(string_split_regex(trim(text), '\\s+')) + it.image_tokens AS tokens
             |  FROM documents d0 JOIN it ON d0.doc_id = it.doc_id),
             |c AS (SELECT *, SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |      FROM d)
             |SELECT doc_id, shard, text_tokens, image_tokens, tokens,
             |  CAST((cum - tokens) // 512 AS BIGINT) AS start_seq,
             |  CAST((cum - 1) // 512 AS BIGINT) AS end_seq
             |FROM c ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal
        val imgTok = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .mapPartitions { it =>
            it.map { id =>
              val payload = (id % 3) match {
                case 0 => Multimodal.renderImage(id / 3, 32, "png")
                case 1 => Multimodal.renderImage(id / 3, 48, "png", brightness = 2)
                case _ => Multimodal.renderImage(id / 3, 32, "jpg")
              }
              val (w, h, _) = Multimodal.decodeGray(payload).getOrElse(
                throw new IllegalStateException(
                  s"x48: undecodable fixture image for doc $id"))
              (id, ((w + 15) / 16) * ((h + 15) / 16))
            }
          }.toDF("doc_id", "image_tokens")
        QUtil.writeSized(imgTok, QUtil.freshWarehouse(s, X48ImageTokTag))
        val img = s.read.parquet(X48ImageTokFixture)
        val shards = s.conf.getOption("graft.x42.shards").map(_.toInt)
          .getOrElse(X42DefaultShards)
        val d = t(s, dir, "documents")
          .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
            size(split(trim(col("text")), "\\s+")).as("text_tokens"))
          .join(img, "doc_id") // 1:1 on doc_id — the natural co-keyed join
          .withColumn("tokens", col("text_tokens") + col("image_tokens"))
        packWindow(d)
          .select(col("doc_id"), col("shard"), col("text_tokens"),
            col("image_tokens"), col("tokens"),
            col("start_seq"), col("end_seq"))
          .orderBy("doc_id")
      }),

    // Sequence-length BUCKETING report (round 15) — the batching-efficiency
    // pass behind bucketed batch samplers (as in T5 / fairseq batching by
    // length): pad each doc only to its power-of-two bucket cap instead of
    // the global max sequence length, and quantify the padding saved. Per
    // bucket: doc count, true token mass, padding paid at the bucket cap,
    // and padding the same docs would pay at a global 1024 cap — the
    // difference is the compute a bucketed sampler saves. Integer-exact
    // throughout (the x30 discipline); docs beyond 1024 tokens contribute
    // their truncation cap, as a fixed-context trainer would. Row-local
    // CASE + one map-side-combinable groupBy over ≤7 keys: at 100 TB this
    // is a single corpus pass with a 7-row result.
    QDef(
      "x45_length_bucket_pack",
      Some("""WITH d AS (
             |  SELECT len(string_split_regex(trim(text), '\s+')) AS t FROM documents),
             |b AS (SELECT t,
             |        CASE WHEN t<=16 THEN 16 WHEN t<=32 THEN 32 WHEN t<=64 THEN 64
             |             WHEN t<=128 THEN 128 WHEN t<=256 THEN 256
             |             WHEN t<=512 THEN 512 ELSE 1024 END AS bucket_cap,
             |        LEAST(t, 1024) AS tc
             |      FROM d)
             |SELECT bucket_cap, count(*) AS n_docs,
             |  CAST(SUM(tc) AS BIGINT) AS sum_tokens,
             |  CAST(SUM(bucket_cap - tc) AS BIGINT) AS pad_bucketed,
             |  CAST(SUM(1024 - tc) AS BIGINT) AS pad_global
             |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(size(split(trim(col("text")), "\\s+")).as("t"))
          .withColumn("bucket_cap",
            when(col("t") <= 16, 16).when(col("t") <= 32, 32)
              .when(col("t") <= 64, 64).when(col("t") <= 128, 128)
              .when(col("t") <= 256, 256).when(col("t") <= 512, 512)
              .otherwise(1024))
          .withColumn("tc", least(col("t"), lit(1024)))
          .groupBy("bucket_cap").agg(
            count(lit(1)).as("n_docs"),
            sum(col("tc").cast("long")).as("sum_tokens"),
            sum((col("bucket_cap") - col("tc")).cast("long")).as("pad_bucketed"),
            sum((lit(1024) - col("tc")).cast("long")).as("pad_global"))
          .orderBy("bucket_cap")),

    // DSIR-style importance WEIGHTING (round 14; Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"): score raw
    // docs by how target-like their hashed-n-gram distribution is. The
    // target sample is the doc_id%97 slice (x24's eval split); features
    // are bigrams hashed to 256 buckets via the first two md5 hex chars
    // (the hashed-feature trick that keeps the distribution tables
    // O(buckets), engine-portable as plain strings). DSIR's log-ratio is
    // restated in EXACT integer arithmetic — per-feature scaled smoothed
    // ratio r_f = ((c_target+1)*1e6) div (c_raw+1), per-doc score = sum of
    // r over its bigram instances — so both engines agree bit-for-bit (the
    // x30 discipline: never sum engine-ordered doubles). target_like marks
    // docs whose mean ratio exceeds uniform; downstream sampling ranks on
    // score_num/n_bigrams. Shape at 100 TB: two 256-row broadcast tables,
    // one corpus explode, everything else row-local — no window, no
    // self-join.
    QDef(
      "x43_dsir_weight",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
             |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
             |bg AS (
             |  SELECT doc_id,
             |    substring(md5(tk[CAST(i AS INT)+1] || ' ' || tk[CAST(i AS INT)+2]), 1, 2) AS f
             |  FROM tk, unnest(range(0, len(tk)-1)) t(i)),
             |tc AS (SELECT f, count(*) AS ct FROM bg WHERE doc_id % 97 = 0 GROUP BY f),
             |rc AS (SELECT f, count(*) AS cr FROM bg WHERE doc_id % 97 <> 0 GROUP BY f),
             |sc AS (SELECT bg.doc_id,
             |         ((coalesce(tc.ct, 0) + 1) * 1000000) // (rc.cr + 1) AS r
             |       FROM bg JOIN rc USING (f) LEFT JOIN tc USING (f)
             |       WHERE bg.doc_id % 97 <> 0)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
             |  CAST(sum(r) AS BIGINT) AS score_num,
             |  sum(r) > 1000000 * count(*) AS target_like
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        // repartition before the explode (the shingleArraysOf fix, r20):
        // the one-split fixture otherwise builds the bigram checkpoint —
        // which x44's composed pipeline replays too — on one task
        val tk = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), tokens.as("tk"))
          .filter(size(col("tk")) >= 2)
        // inline explode + checkpoint: x30's measured discipline (the
        // bigram build must run once, not once per consumer)
        val bg = tk.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk)-2), i -> concat_ws(' ', tk[i], tk[i+1]))")).as("b"))
          .select(col("doc_id"), substring(md5(col("b")), 1, 2).as("f"))
          .localCheckpoint()
        val tc = bg.filter(col("doc_id") % 97 === 0)
          .groupBy("f").agg(count(lit(1)).as("ct"))
        val rc = bg.filter(col("doc_id") % 97 =!= 0)
          .groupBy("f").agg(count(lit(1)).as("cr"))
        bg.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(rc), "f")
          .join(broadcast(tc), Seq("f"), "left")
          .select(col("doc_id"),
            expr("((coalesce(ct, 0L) + 1L) * 1000000L) div (cr + 1L)").as("r"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_bigrams"),
            sum("r").as("score_num"),
            (sum("r") > count(lit(1)) * lit(1000000L)).as("target_like"))
          .orderBy("doc_id")
      }),

    // The COMPOSED curation pipeline (round 14) — the end-to-end pass a
    // training-data pipeline actually ships, in ONE declarative plan:
    // quality gate -> exact dedup -> eval decontamination -> per-language
    // token budget, over the raw corpus (the non-eval slice; doc_id%97==0
    // is the held-out eval set, as in x24/x43). EVERY document is emitted
    // with a per-stage fail BITMASK (bit0 quality, bit1 duplicate, bit2
    // contaminated, bit3 over-budget) — removal rates stay auditable per
    // stage, thresholds re-litigable without re-running upstream stages —
    // and `kept` is the final verdict. Stage order is load-bearing: the
    // budget thresholds are computed over the SURVIVORS of the first three
    // stages (budgets meter what you'd actually train on), via the exact
    // x26 arithmetic (`budgetThresholds`, shared code) so the mix policy
    // cannot drift from the standalone operator. Shape at 100 TB: two
    // corpus-keyed shuffles (content-hash dedup group, contamination
    // doc-id mark), one corpus explode against a broadcast eval-gram set,
    // thresholds broadcast — no window over the corpus, no self-join; the
    // tokenized corpus materializes once (localCheckpoint) and feeds all
    // four stages instead of re-reading parquet per branch.
    QDef(
      "x44_pipeline_curate",
      Some("""WITH raw AS (
             |  SELECT doc_id, lang, n_chars,
             |    string_split_regex(trim(text), '\s+') AS tk,
             |    len(string_split_regex(trim(text), '\s+')) AS tokens,
             |    md5(text) AS h
             |  FROM documents),
             |corpus AS (SELECT * FROM raw WHERE doc_id % 97 <> 0),
             |grams AS (
             |  SELECT doc_id,
             |    array_to_string(list_slice(tk, CAST(i AS INT)+1, CAST(i AS INT)+3), ' ') AS g
             |  FROM raw, unnest(range(0, greatest(len(tk)-2, 0))) t(i)),
             |ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
             |contam AS (SELECT DISTINCT gr.doc_id FROM grams gr JOIN ev USING (g)
             |           WHERE gr.doc_id % 97 <> 0),
             |keeper AS (SELECT h, MIN(doc_id) AS keeper FROM corpus GROUP BY h),
             |staged AS (
             |  SELECT c.doc_id, c.lang, c.tokens,
             |    (CASE WHEN c.tokens < 5 OR CAST(c.n_chars AS DOUBLE)/c.tokens > 15.0
             |          THEN 1 ELSE 0 END
             |     + CASE WHEN c.doc_id <> k.keeper THEN 2 ELSE 0 END
             |     + CASE WHEN ct.doc_id IS NOT NULL THEN 4 ELSE 0 END) AS bits3
             |  FROM corpus c JOIN keeper k USING (h)
             |    LEFT JOIN contam ct ON ct.doc_id = c.doc_id),
             |surv AS (SELECT doc_id, lang, tokens FROM staged WHERE bits3 = 0),
             |pl AS (SELECT lang, SUM(tokens) AS lang_tokens FROM surv GROUP BY lang),
             |st AS (SELECT SUM(lang_tokens) AS all_tokens, COUNT(*) AS n_langs FROM pl),
             |fr AS (SELECT lang,
             |         LEAST(1.0, (0.6 * (CAST(all_tokens AS DOUBLE) / n_langs))
             |                    / CAST(lang_tokens AS DOUBLE)) AS f
             |       FROM pl, st),
             |th AS (SELECT lang, CASE WHEN f >= 1.0 THEN 'g'
             |         ELSE printf('%08x', CAST(floor(f * 4294967296.0) AS BIGINT)) END AS thr
             |       FROM fr),
             |fin AS (
             |  SELECT s.doc_id, s.lang, s.tokens,
             |    s.bits3 + CASE WHEN s.bits3 = 0 AND
             |        NOT (substring(md5(CAST(s.doc_id AS VARCHAR)), 1, 8) < th.thr)
             |      THEN 8 ELSE 0 END AS bits
             |  FROM staged s LEFT JOIN th USING (lang))
             |SELECT doc_id, lang, CAST(tokens AS INT) AS n_tokens,
             |  CAST(bits AS INT) AS fail_bits, bits = 0 AS kept
             |FROM fin ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val n = 3
        val raw = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            tokens.as("tk"), md5(col("text")).as("h"))
          .withColumn("tokens", size(col("tk")))
        val corpus = raw.filter(col("doc_id") % 97 =!= 0).localCheckpoint()
        // stage 1 (row-local): shape quality — too short, or suspiciously
        // long average token (mean chars/token > 15: markup, not prose)
        val quality = corpus.withColumn("qf",
          col("tokens") < 5 ||
            (col("n_chars").cast("double") / col("tokens")) > lit(15.0))
        // stage 2: exact dedup, x1's shape — group on the content hash,
        // keep the smallest doc_id (one corpus shuffle on h)
        val keeper = corpus.groupBy("h").agg(min("doc_id").as("keeper"))
        // stage 3: decontamination, x24's shape — eval 3-gram set
        // broadcast, corpus explode, contaminated ids marked (one corpus
        // shuffle on doc_id for the distinct+mark)
        def gramsOf(d: org.apache.spark.sql.DataFrame) =
          d.filter(size(col("tk")) >= n)
            .select(col("doc_id"), explode(expr(
              s"transform(sequence(0, size(tk) - $n), " +
                s"i -> array_join(slice(tk, i + 1, $n), ' '))")).as("g"))
        // eval grams come off the raw scan (the %97 filter pushes to
        // parquet); corpus grams re-read the CHECKPOINTED tokenization
        val evalGrams = gramsOf(raw.filter(col("doc_id") % 97 === 0))
          .select("g").distinct()
        val contam = gramsOf(corpus)
          .join(broadcast(evalGrams), Seq("g"))
          .select("doc_id").distinct()
          .withColumn("cf", lit(true))
        val staged = quality
          .join(keeper, "h")
          .join(contam, Seq("doc_id"), "left")
          .withColumn("bits3",
            when(col("qf"), 1).otherwise(0) +
              when(col("doc_id") =!= col("keeper"), 2).otherwise(0) +
              when(col("cf").isNotNull, 4).otherwise(0))
        // stage 4: the x26 budget over stage-1..3 SURVIVORS
        val thr = budgetThresholds(
          staged.filter(col("bits3") === 0)
            .select(col("doc_id"), col("lang"), col("tokens")))
        staged.join(broadcast(thr), Seq("lang"), "left")
          .withColumn("fail_bits", (col("bits3") +
            when(col("bits3") === 0 &&
              !(substring(md5(col("doc_id").cast("string")), 1, 8)
                < col("thr")), 8).otherwise(0)).cast("int"))
          .select(col("doc_id"), col("lang"),
            col("tokens").cast("int").as("n_tokens"),
            col("fail_bits"), (col("fail_bits") === 0).as("kept"))
          .orderBy("doc_id")
      }),

    // Boilerplate stripping (the C4/RefinedWeb "remove spans repeated
    // across the corpus" step): docs split into non-overlapping 2-token
    // chunks; a chunk whose corpus document-frequency exceeds 4% of the
    // corpus is boilerplate, and every doc is re-emitted with those chunks
    // removed (order preserved). Shape at 100 TB: ONE shuffle to count
    // distinct (chunk, doc) pairs, then the over-threshold chunk set —
    // small by definition (|hot| <= chunks/(0.04·N)) — broadcasts and the
    // rebuild pass is entirely row-local: the corpus itself never
    // shuffles for reconstruction. (A real deployment swaps the broadcast
    // array for a bloom/hash structure; the plan shape is identical.)
    QDef(
      "x28_boilerplate_strip",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
             |ch AS (
             |  SELECT doc_id, CAST(i AS INT) AS i,
             |    array_to_string(list_slice(tk, CAST(i AS INT)+1, CAST(i AS INT)+2), ' ') AS c
             |  FROM tk, unnest(range(0, len(tk), 2)) t(i)),
             |freq AS (SELECT c, count(DISTINCT doc_id) AS df FROM ch GROUP BY c),
             |tot AS (SELECT count(*) AS n FROM documents),
             |hot AS (SELECT c FROM freq, tot WHERE df > 0.04 * n),
             |flag AS (
             |  SELECT ch.doc_id, ch.i, ch.c, hot.c IS NOT NULL AS is_hot
             |  FROM ch LEFT JOIN hot ON ch.c = hot.c)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
             |  CAST(sum(CASE WHEN is_hot THEN 1 ELSE 0 END) AS INT) AS n_removed,
             |  coalesce(array_to_string(list(c ORDER BY i) FILTER (WHERE NOT is_hot), ' '),
             |           '') AS clean_text
             |FROM flag GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val tk = docs.select(col("doc_id"),
          split(trim(col("text")), "\\s+").as("tk"))
        val ch = tk
          .select(col("doc_id"), col("tk"),
            explode(expr("sequence(0, size(tk)-1, 2)")).as("i"))
          .select(col("doc_id"),
            expr("array_join(slice(tk, i+1, 2), ' ')").as("c"))
        val tot = docs.agg(count(lit(1)).as("n"))
        val freq = ch.distinct().groupBy("c").agg(count(lit(1)).as("df"))
        val hot = freq.crossJoin(broadcast(tot))
          .filter(col("df") > lit(0.04) * col("n")).select("c")
        // The 4% document-frequency threshold bounds the hot set at
        // |hot| <= total_chunks/(0.04·N) — real, but in expectation only:
        // a short-doc corpus can push it past what one collected array
        // should ship. The cap makes the bound LOCAL at zero added cost:
        // the fast path asserts |hot| <= cap inside the same aggregation
        // that builds the array (assert_true, row-local — no extra job,
        // no driver materialization), failing loudly with the remedy
        // rather than silently shipping an oversized broadcast. Setting
        // graft.x28.hotCap=-1 selects the remedy: a left join against the
        // hot set with an ordered per-doc reassembly — one extra corpus
        // shuffle, hot set never collected; spec-proven equal.
        val cap = s.conf.get("graft.x28.hotCap", "65536").toLong
        val out = if (cap >= 0) {
          // the check lives INSIDE the hot column's defining expression
          // (not a separate assert column Catalyst could prune away)
          val hotArr = hot.agg(collect_set(col("c")).as("hot0"))
            .select(when(size(col("hot0")) <= cap, col("hot0"))
              .otherwise(raise_error(concat(
                lit("x28: hot set of "), size(col("hot0")),
                lit(s" chunks exceeds graft.x28.hotCap=$cap — set " +
                  "graft.x28.hotCap=-1 to use the join fallback"))))
              .as("hot"))
          tk.crossJoin(broadcast(hotArr))
            .select(col("doc_id"),
              expr("transform(sequence(0, size(tk)-1, 2), " +
                "i -> array_join(slice(tk, i+1, 2), ' '))").as("cs"),
              col("hot"))
            .select(col("doc_id"),
              size(col("cs")).as("n_chunks"),
              expr("size(filter(cs, c -> array_contains(hot, c)))").as("n_removed"),
              expr("array_join(filter(cs, c -> NOT array_contains(hot, c)), ' ')")
                .as("clean_text"))
        } else {
          val chIdx = tk.select(col("doc_id"), posexplode(expr(
            "transform(sequence(0, size(tk)-1, 2), " +
              "i -> array_join(slice(tk, i+1, 2), ' '))")))
            .withColumnRenamed("col", "c")
          chIdx.join(hot.withColumn("is_hot", lit(true)), Seq("c"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).cast("int").as("n_chunks"),
              sum(when(col("is_hot"), 1).otherwise(0)).cast("int").as("n_removed"),
              array_join(expr("transform(array_sort(collect_list(" +
                "CASE WHEN is_hot IS NULL THEN struct(pos, c) END)), x -> x.c)"),
                " ").as("clean_text"))
        }
        out.orderBy("doc_id")
      }),

    // Language-model familiarity scoring — the log-prob-free analog of
    // perplexity filtering: a document's score is the average corpus
    // frequency of its bigrams (familiar text scores high, out-of-
    // distribution text low). Exact integer arithmetic with ONE double
    // division, so both engines agree bit-for-bit — the reason this uses
    // raw frequencies, not log-probs (libm log() is not cross-engine
    // reproducible). Shape at 100 TB: the bigram table is bounded by
    // vocab² and BROADCASTS; scoring is a broadcast hash join over the
    // exploded bigrams plus a map-side-combinable per-doc aggregation —
    // NOT a row-local map lookup (Catalyst map element_at is a linear
    // scan, measured 4x slower than the join at sf0.1).
    QDef(
      "x30_lm_familiarity",
      Some("""WITH tk AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
             |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
             |bg AS (
             |  SELECT doc_id, tk[CAST(i AS INT)+1] || ' ' || tk[CAST(i AS INT)+2] AS b
             |  FROM tk, unnest(range(0, len(tk)-1)) t(i)),
             |cnt AS (SELECT b, count(*) AS c FROM bg GROUP BY b)
             |SELECT doc_id, CAST(count(*) AS INT) AS n_bigrams,
             |  CAST(sum(c) AS DOUBLE) / count(*) AS familiarity
             |FROM bg JOIN cnt USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        // repartition before the explode (the shingleArraysOf fix, r20):
        // the one-split fixture otherwise builds the whole bigram
        // checkpoint — and the count aggregate's map side — on one task
        val tk = t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), tokens.as("tk"))
          .filter(size(col("tk")) >= 2)
        // explode the transform() DIRECTLY: exploding a NAMED array column
        // lets the optimizer infer `size(arr) > 0`, substitute the array's
        // defining expression, and push the whole transform() into the
        // scan as a data filter — the bigram build then runs TWICE per row
        // (once in filter context), measured 10x slower at sf0.1. Inline
        // explode leaves only the original token-count filter on the scan.
        val exploded = tk.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(tk)-2), i -> concat_ws(' ', tk[i], tk[i+1]))")).as("b"))
          .localCheckpoint() // bigrams explode once, feed counts AND scoring
        // The bigram-frequency table is vocab²-bounded, which is
        // broadcastable at any realistic vocab — but that is an expectation,
        // not a guarantee (a pathological corpus can exceed the broadcast
        // ceiling). Two-tier size gate, cheapest-first: TOTAL bigram
        // occurrences (a row count over the already-materialized local
        // checkpoint, no recompute) bounds the distinct count from above —
        // within the cap, broadcast outright (measured 4x over map-lookup
        // at sf0.1) at ~zero added cost. Only past that bound is the exact
        // distinct count measured — recomputed at the join rather than
        // persisted (a lazily-returned DataFrame has no unpersist point,
        // and a leaked cache entry outlives the query); the double
        // aggregation is confined to the pathological over-bound regime.
        // Over the cap the join runs shuffled — same rows, no ceiling
        // failure.
        val cap = s.conf.get("graft.x30.broadcastCap", "2000000").toLong
        val counts0 = exploded.groupBy("b").agg(count(lit(1)).as("c"))
        val dim =
          if (exploded.count() <= cap || counts0.count() <= cap)
            broadcast(counts0)
          else counts0
        exploded.join(dim, "b")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("nb"), sum(col("c")).as("sc"))
          .select(col("doc_id"), col("nb").cast("int").as("n_bigrams"),
            (col("sc").cast("double") / col("nb")).as("familiarity"))
          .orderBy("doc_id")
      }),

    // Deterministic train/val/test corpus split (90/5/5): the assignment is
    // a pure function of doc_id (first 8 hex digits of md5 against fixed
    // thresholds), so ANY engine — and any rerun, at any scale, on any
    // partitioning — derives the identical split. Row-local, zero shuffle;
    // the property every reproducible training pipeline needs from its
    // splitter.
    QDef(
      "x32_corpus_split",
      Some("""WITH h AS (
             |  SELECT doc_id, lang,
             |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS hx
             |  FROM documents)
             |SELECT doc_id, lang,
             |  CASE WHEN hx < 'e6666666' THEN 'train'
             |       WHEN hx < 'f3333333' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM h ORDER BY doc_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            substring(md5(col("doc_id").cast("string")), 1, 8).as("hx"))
          .select(col("doc_id"), col("lang"),
            when(col("hx") < "e6666666", "train")
              .when(col("hx") < "f3333333", "val")
              .otherwise("test").as("split"))
          .orderBy("doc_id")),

    // BPE tokenizer-vocabulary TRAINING (round 10) — the merge-learning
    // loop every tokenizer pipeline runs (Sennrich et al. 2016; the
    // HuggingFace trainer's word-count formulation). The corpus is read
    // ONCE into a (word, freq) table; every iteration then runs on that
    // VOCABULARY-sized table, never the corpus: adjacent-symbol pairs are
    // counted weighted by word frequency (one map-side-combinable
    // vocab-sized shuffle per PASS — and since round 17 a pass learns a
    // whole BATCH of provably-independent merges, see distributedMerges),
    // the top pairs (tie-break lexicographic) become the next merges,
    // each applied to the word symbol arrays as one row-local left fold.
    // Driver traffic is O(batch) rows per pass — never data-sized. The
    // ranked merge table a tokenizer ships. TextBpeSpec proves the merges
    // equal an independent driver-side reference implementation — and
    // since round 16 the TRAINING LOOP ITSELF is oracled: DuckDB replays
    // all 15 iterations as a recursive CTE whose working table is the full
    // per-word segmentation state (x40's marker-delimited string form).
    // Each recursion step, in one pass over that state: explodes adjacent
    // symbol pairs per index (overlapping occurrences count, exactly like
    // the trainer), window-sums pair counts weighted by word frequency,
    // broadcasts the argmax (count DESC, then left/right ascending — the
    // utf8Lt tie-break; DuckDB compares strings by UTF-8 bytes) to every
    // row via FIRST_VALUE over a global ORDER BY frame, and rewrites each
    // word's segmentation with the same left-to-right non-overlapping
    // replace() the x40 oracle uses. Single-symbol words ride along via a
    // NULL right-neighbor (excluded from counting by a NULL weight), so
    // the state never loses a word. The suite's last rows-only check is
    // gone: every query is now verified against an independent engine.
    QDef(
      "x38_bpe_train",
      Some(s"""WITH RECURSIVE wf AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
             |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
             |    FROM documents)
             |  WHERE len(w) > 0 GROUP BY w),
             |st AS (
             |  SELECT 0 AS rank, w, freq,
             |    regexp_replace(w, '(.)', '$Stx\\1$Etx', 'g') AS seg,
             |    CAST(NULL AS VARCHAR) AS m_l, CAST(NULL AS VARCHAR) AS m_r,
             |    CAST(NULL AS BIGINT) AS m_cnt
             |  FROM wf
             |  UNION ALL
             |  SELECT DISTINCT rank, w, freq,
             |    replace(seg, '$Stx' || bl || '$Etx$Stx' || br || '$Etx',
             |      '$Stx' || bl || br || '$Etx') AS seg,
             |    bl, br, bc
             |  FROM (
             |    SELECT rank, w, freq, seg,
             |      FIRST_VALUE(lft) OVER win AS bl,
             |      FIRST_VALUE(rgt) OVER win AS br,
             |      FIRST_VALUE(cnt) OVER win AS bc
             |    FROM (
             |      SELECT rank, w, freq, seg, lft, rgt,
             |        SUM(pw) OVER (PARTITION BY lft, rgt) AS cnt
             |      FROM (
             |        SELECT rank + 1 AS rank, w, freq, seg,
             |          syms[i] AS lft, syms[i + 1] AS rgt,
             |          CASE WHEN syms[i + 1] IS NULL THEN NULL ELSE freq END AS pw
             |        FROM (
             |          SELECT rank, w, freq, seg,
             |            string_split(substr(seg, 2, length(seg) - 2),
             |              '$Etx$Stx') AS syms
             |          FROM st WHERE rank < 15),
             |          unnest(range(1, greatest(len(syms), 2))) t(i)))
             |    WINDOW win AS (ORDER BY cnt DESC NULLS LAST,
             |      lft ASC NULLS LAST, rgt ASC NULLS LAST
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |  WHERE bc IS NOT NULL)
             |SELECT DISTINCT CAST(rank AS INT) AS rank, m_l AS "left",
             |  m_r AS "right", m_l || m_r AS merged, m_cnt AS pair_count
             |FROM st WHERE rank >= 1 ORDER BY rank""".stripMargin),
      (s, dir) => bpeTrain(s, dir, merges = 15)),

    // BPE tokenizer ENCODE (round 13) — the APPLY side of x38: turn the
    // learned merge table into per-document token counts, the pass every
    // shipped tokenizer runs over the whole corpus. Train once (one corpus
    // pass + the vocab-sized merge loop), collect the MERGE-COUNT-sized
    // table (15 rows here, 32k-100k in production — never data- or
    // vocab-sized), and apply it row-locally via the native `BpeEncode`
    // expression: per word, repeatedly fold the lowest-rank adjacent pair
    // left-to-right (the priority formulation; equivalent to sequential
    // rank replay for trained tables — see BpeTable's scaladoc, proven in
    // TextBpeSpec). Zero shuffle beyond the final orderBy; the merge table
    // ships closure-side once per task binary. Losslessness is asserted
    // IN-QUERY: the tokens of every word must concatenate back to the
    // document's whitespace-joined text, so a wrong segmentation cannot
    // return silently. No SQL oracle (DuckDB would have to replay the
    // iterative fold); TextBpeSpec proves the encoder equals an
    // independent sequential reference implementation word-for-word, and
    // ORACLED since round 16: the learned merge table (15 rows at fixture
    // scale, 32k-100k in production — always merge-count-sized) is
    // materialized to a parquet fixture, and the DuckDB oracle REPLAYS
    // Sennrich's sequential-rank encode per word as a bounded recursive
    // CTE over it: the segmentation rides as a marker-delimited string
    // (see Stx/Etx above), each recursion step applies merge rank r+1 as
    // one left-to-right non-overlapping replace(), and token counts fall
    // out as marker counts. Sequential replay equals the engine's
    // priority-formulation encode for TRAINED tables (a learned merge's
    // components are themselves learned at strictly lower ranks —
    // BpeTable's scaladoc, proven in TextBpeSpec), so the oracle checks
    // the encode itself, not a restatement. Only x38's training loop
    // (iterative argmax) remains spec-gated.
    QDef(
      "x40_bpe_encode",
      Some(s"""WITH RECURSIVE m AS (
             |  SELECT CAST(rank AS INT) AS rank, "left" AS l, "right" AS r
             |  FROM read_parquet('$X40MergesFixture/*.parquet')),
             |w AS (
             |  SELECT doc_id, w FROM (
             |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
             |    FROM documents)
             |  WHERE len(w) > 0),
             |seg AS (
             |  SELECT doc_id, regexp_replace(w, '(.)', '$Stx\\1$Etx', 'g') AS seg,
             |    0 AS r
             |  FROM w
             |  UNION ALL
             |  SELECT seg.doc_id,
             |    replace(seg.seg, '$Stx' || m.l || '$Etx$Stx' || m.r || '$Etx',
             |      '$Stx' || m.l || m.r || '$Etx'),
             |    seg.r + 1
             |  FROM seg JOIN m ON m.rank = seg.r + 1),
             |fin AS (SELECT doc_id, seg FROM seg
             |        WHERE r = (SELECT count(*) FROM m)),
             |agg AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS INT) AS n_words,
             |    CAST(SUM(len(seg) - len(replace(seg, '$Stx', ''))) AS INT)
             |      AS n_tokens,
             |    CAST(SUM(len(replace(replace(seg, '$Stx', ''), '$Etx', ''))) AS INT)
             |      AS n_codepoints
             |  FROM fin GROUP BY doc_id)
             |SELECT d.doc_id, d.lang,
             |  COALESCE(a.n_words, 0) AS n_words,
             |  COALESCE(a.n_tokens, 0) AS n_tokens,
             |  COALESCE(a.n_codepoints, 0) AS n_codepoints
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      (s, dir) => {
        // writeSized (r20): the 15-row merge table otherwise lands as one
        // file per reduce partition — a 32-file scan for 15 rows
        QUtil.writeSized(
          bpeTrain(s, dir, merges = 15).select("rank", "left", "right"),
          QUtil.freshWarehouse(s, X40MergesTag))
        // read the table BACK from the fixture, so the encoder applies
        // exactly the bytes the oracle replays (the x26b pattern)
        val learned = s.read.parquet(X40MergesFixture).collect()
          .sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
        encodeBpe(t(s, dir, "documents"), learned).orderBy("doc_id")
      })
  )

  /** Shared mixing arithmetic of x26/x26b over a (doc_id, lang, tokens)
    * frame: per-language token budgets (60% of the uniform share) become
    * md5-hex keep thresholds, and selection is a pure row-local function of
    * doc_id — reproducible, shuffle-free past the one vocabulary-sized
    * aggregate, broadcast-joined back onto the corpus. The token
    * DEFINITION is the caller's: whitespace counts for the oracled x26
    * (DuckDB restates them), real BPE counts for x26b. The arithmetic
    * shapes mirror the x26 oracle exactly (same IEEE op order), so the
    * thresholds — and therefore the sample — are bit-identical across
    * engines given equal token columns.
    */
  /** x42's default shard count — embedded into BOTH the Spark plan and the
    * DuckDB oracle string at compile time so they cannot drift; the
    * `graft.x42.shards` conf overrides the Spark side for deployments
    * (more shards = more parallel prefix sums, slightly more padding waste
    * at shard boundaries).
    */
  private[graft] final val X42DefaultShards = 32

  /** The x42 sequence-packing plan at a given shard count: per-shard
    * running prefix sum over doc_id order, no global sort — sequence ids
    * are (shard, seq) pairs exactly as a sharded tokenizer run emits them.
    */
  private[graft] def sequencePack(docs: DataFrame, shards: Int): DataFrame = {
    require(shards >= 1, s"graft.x42.shards must be >= 1, got $shards")
    packWindow(docs
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        size(split(trim(col("text")), "\\s+")).as("tokens")))
      .select(col("doc_id"), col("shard"), col("tokens"),
        col("start_seq"), col("end_seq"))
      .orderBy("doc_id")
  }

  /** The one packing window (x42's arithmetic, factored for x48): given
    * (doc_id, shard, tokens, ...), append the running per-shard prefix sum
    * and the 512-token sequence span each doc lands in. One definition —
    * text-only (x42) and interleaved multimodal (x48) packing cannot
    * drift.
    */
  private def packWindow(d: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    d.withColumn("cum", sum("tokens").over(w))
      .withColumn("start_seq", expr("(cum - tokens) div 512"))
      .withColumn("end_seq", expr("(cum - 1) div 512"))
  }

  private[graft] def budgetMix(d: DataFrame): DataFrame = {
    d.join(broadcast(budgetThresholds(d)), "lang")
      .filter(substring(md5(col("doc_id").cast("string")), 1, 8) < col("thr"))
      .select(col("doc_id"), col("lang"), col("tokens"))
      .orderBy("doc_id")
  }

  /** The per-language md5-prefix selection thresholds of the x26 budget
    * arithmetic (keep iff `substring(md5(doc_id), 1, 8) < thr`): factored
    * from [[budgetMix]] so x44's composed pipeline can MARK over-budget
    * docs (audit bitmask) with the exact thresholds x26 selects by — one
    * arithmetic, one IEEE op order, two consumers that cannot drift.
    * Input needs `lang` and `tokens`; the caller decides which docs count
    * toward the budgets (x26: the whole corpus; x44: survivors of the
    * earlier pipeline stages).
    */
  /** The composed row-local quality gate of x37 (shape thresholds +
    * repetition + blocklist -> per-rule fail bitmask, keep = mask 0).
    * Deliberately window- and aggregate-free: row-local code gates a batch
    * corpus and an UNBOUNDED STREAM identically (st14 runs this exact
    * function per micro-batch with no state store), and one definition
    * means the two spellings cannot drift. Callers order the result.
    */
  /** The x37 gate's oracle CTEs (`q` signals, `m` fail-mask) as one shared
    * SQL fragment — x37 states it alone, x60 composes it with the image
    * screens, so the two oracles' gate spellings cannot drift (the same
    * guarantee `qualityGate` gives the Spark side).
    */
  private[graft] lazy val GateSqlCtes: String =
    s"""q AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |    CASE WHEN length(text) > 0
       |      THEN CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
       |      ELSE 0.0 END AS punct_ratio,
       |    CASE WHEN length(text) > 0
       |      THEN CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
       |      ELSE 0.0 END AS digit_ratio,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |         tk -> tk IN (${sqlList(stopwords)}))) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
       |    CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS distinct_ratio,
       |    len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        tk -> tk IN (${sqlList(blocklist)}))) AS block_hits
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, n_tokens,
       |    (CASE WHEN n_tokens BETWEEN 5 AND 5000 THEN 0 ELSE 1 END)
       |    + (CASE WHEN punct_ratio <= 0.10 THEN 0 ELSE 2 END)
       |    + (CASE WHEN digit_ratio <= 0.20 THEN 0 ELSE 4 END)
       |    + (CASE WHEN stopword_ratio >= 0.01 THEN 0 ELSE 8 END)
       |    + (CASE WHEN distinct_ratio >= 0.30 THEN 0 ELSE 16 END)
       |    + (CASE WHEN block_hits < 3 THEN 0 ELSE 32 END) AS fail_mask
       |  FROM q)""".stripMargin

  private[graft] def qualityGate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens.as("tk"), col("text"))
      .withColumn("n_tokens", size(col("tk")))
      // length guards keep the divisions total under ANSI mode
      // (length(text)=0 would throw DIVIDE_BY_ZERO); n_tokens is >= 1
      // for any non-null text (split('') = ['']), so the token-ratio
      // divisors need no guard
      .withColumn("punct_ratio",
        when(length(col("text")) > 0,
          regexp_count(col("text"), lit("[.,;:!?]")).cast("double")
            / length(col("text"))).otherwise(lit(0.0)))
      .withColumn("digit_ratio",
        when(length(col("text")) > 0,
          regexp_count(col("text"), lit("[0-9]")).cast("double")
            / length(col("text"))).otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        countIn(stopwords).cast("double") / size(col("tk")))
      .withColumn("distinct_ratio",
        size(array_distinct(col("tk"))).cast("double") / size(col("tk")))
      .withColumn("block_hits", countIn(blocklist))
      // every rule is phrased PASS -> 0, else fail: a NULL signal (e.g.
      // text IS NULL) fails its rule in BOTH engines (when(NULL) takes
      // the otherwise branch, CASE WHEN NULL takes ELSE) instead of
      // silently passing the gate
      .withColumn("fail_mask",
        when(col("n_tokens").between(5, 5000), 0).otherwise(1)
          + when(col("punct_ratio") <= 0.10, 0).otherwise(2)
          + when(col("digit_ratio") <= 0.20, 0).otherwise(4)
          + when(col("stopword_ratio") >= 0.01, 0).otherwise(8)
          + when(col("distinct_ratio") >= 0.30, 0).otherwise(16)
          + when(col("block_hits") < 3, 0).otherwise(32))
      .withColumn("keep", col("fail_mask") === 0)
      .select("doc_id", "n_tokens", "fail_mask", "keep")

  private[graft] def budgetThresholds(d: DataFrame): DataFrame = {
    val perLang = d.groupBy("lang").agg(sum("tokens").as("lang_tokens"))
    val stats = perLang.agg(
      sum("lang_tokens").as("all_tokens"), count(lit(1)).as("n_langs"))
    perLang.crossJoin(broadcast(stats))
      .withColumn("f", least(lit(1.0),
        (lit(0.6) * (col("all_tokens").cast("double") / col("n_langs")))
          / col("lang_tokens").cast("double")))
      .withColumn("thr", when(col("f") >= 1.0, lit("g"))
        .otherwise(format_string("%08x",
          floor(col("f") * lit(4294967296.0)).cast("long"))))
      .select("lang", "thr")
  }

  /** Corpus pass of x40: whitespace words -> BPE tokens per document, with
    * the in-query losslessness proof. Factored out so TextBpeSpec can
    * drive it with an independently-learned table (callers order the
    * result themselves — x26b feeds it into a join, where a sort would be
    * dead weight).
    */
  private[graft] def encodeBpe(docs: DataFrame,
      learned: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession) // idempotent
    // the merge table rides the plan as ONE foldable literal — evaluated
    // once per BpeEncode instance into the rank map, never per row
    val mergesLit = typedlit(learned.map { case (l, r) => Seq(l, r) })
    val enc = (w: Column) => call_function("bpe_encode", w, mergesLit)
    docs
      // repartition before the encode (the shingleArraysOf fix, r20): the
      // documents fixture is ONE parquet split and the whole per-word BPE
      // encode is row-local — without the exchange the corpus encodes on a
      // single task; with it the CPU-bound merge replay runs cluster-wide
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"), col("lang"),
        expr("filter(split(trim(text), '\\\\s+'), w -> length(w) > 0)")
          .as("words"))
      .select(col("doc_id"), col("lang"), col("words"),
        flatten(transform(col("words"), enc)).as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("words")).as("n_words"),
        // the defining expression of n_tokens carries the losslessness
        // check (not a separate column Catalyst could prune away):
        // concatenated tokens must rebuild the concatenated words exactly
        when(array_join(col("toks"), "") === array_join(col("words"), ""),
          size(col("toks")))
          .otherwise(raise_error(concat(lit("x40: BPE tokens fail to "),
            lit("reassemble doc "), col("doc_id").cast("string"))))
          .as("n_tokens"),
        aggregate(transform(col("words"), w => length(w)),
          lit(0), (a, x) => a + x).as("n_codepoints"))
  }

  /** One live persisted BPE word table per session (released on rebuild —
    * the lazily-returned-DataFrame discipline, see DedupOps.liveArrays).
    */
  private val liveBpe =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, DataFrame]()

  private[graft] def bpeTrain(s: SparkSession, dir: String, merges: Int,
      driverVocabCap: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    def release(df: DataFrame): Unit = { df.unpersist(); () }
    Option(liveBpe.remove(s)).foreach(release)
    // The corpus pass is the DISTRIBUTED part that matters at 100 TB: one
    // map-side-combinable word-frequency aggregate. The merge loop then
    // runs over the DISTINCT-WORD table, which is vocabulary-sized — when
    // it fits the driver (cap below), iterate there (the HuggingFace
    // trainer's shape: the word-count dict is in memory; 1M words is tens
    // of MB) instead of paying ~2 cluster jobs per merge; past the cap the
    // same loop runs distributed, one vocab-sized shuffle per merge.
    // empty words (whitespace-only docs tokenize to ['']) carry no
    // symbols: drop them HERE so neither path sees them — the distributed
    // symbolizer would otherwise hit sequence(1,0) = [1,0] (descending!)
    // and fabricate a phantom ("","") pair
    val wordFreq = t(s, dir, "documents")
      .select(explode(tokens).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .persist()
    liveBpe.put(s, wordFreq)
    val vocab = wordFreq.count()
    val rows: Seq[Row] =
      if (vocab <= driverVocabCap) {
        val wf = wordFreq.collect().map(r => r.getString(0) -> r.getLong(1))
        driverMerges(wf.toMap, merges)
          .map { case (rank, l, r, m, c) => Row(rank, l, r, m, c) }
      } else distributedMerges(s, wordFreq, merges)
    Option(liveBpe.remove(s)).foreach(release)
    s.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("merged", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
  }

  /** In-memory merge loop over the collected word-frequency map — the
    * textbook Sennrich formulation, byte-for-byte the same ranking and
    * tie-break as [[distributedMerges]] (TextBpeSpec proves both against
    * an independent reimplementation).
    */
  /** One symbol per Unicode CODE POINT — matching Spark's code-point
    * `length`/`substring` semantics in [[distributedMerges]] (a UTF-16
    * code-unit split would shear surrogate pairs and learn different
    * merges on emoji-bearing corpora).
    */
  private def codePointSyms(w: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      buf += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    buf.result()
  }

  /** Spark orders strings by UTF-8 BYTES (UTF8String), not Java's UTF-16
    * code units — the two disagree between supplementary-plane and
    * U+E000..U+FFFF characters, so the driver tie-break must compare the
    * same way the distributed orderBy does.
    */
  private[graft] def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  private def driverMerges(words: Map[String, Long], merges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var state: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, f) => (codePointSyms(w), f) }
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var dry = false
    while (rank <= merges && !dry) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) dry = true
      else {
        val ((l, r), cnt) = counts.foldLeft(("", "") -> -1L) {
          case (acc @ ((bl, br), bc), kv @ ((a, b), c)) =>
            if (c > bc || (c == bc &&
                (utf8Lt(a, bl) || (a == bl && utf8Lt(b, br))))) kv else acc
        }
        out += ((rank, l, r, l + r, cnt))
        state = state.map { case (syms, f) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              buf += (l + r); i += 2 // left-to-right, non-overlapping
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), f)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Pass count of the most recent [[distributedMerges]] run — test
    * observability for the batching guarantee (passes < merges on real
    * corpora; TextBpeSpec asserts it).
    */
  private[graft] val lastDistributedPasses =
    new java.util.concurrent.atomic.AtomicInteger(0)

  /** Distributed merge loop for corpora whose VOCABULARY exceeds driver
    * memory: each PASS is one vocab-sized map-side-combined shuffle (pair
    * counts weighted by word freq) + a bounded top-N collect; the symbol
    * table is re-persisted per pass so pass k never re-derives earlier
    * merges from lineage.
    *
    * BATCHED (round 17): one pass learns a BATCH of merges, not one — at
    * a production 64k vocabulary, one-Spark-job-per-merge means 64k
    * sequential jobs; batching cuts passes by the batch factor. The batch
    * is the maximal RANK-ORDER PREFIX of the pair counts that is provably
    * what sequential iteration would pick:
    *
    *  - members are pairwise DISJOINT (no shared symbol): applying one
    *    cannot change another's count — pre-existing pair counts only
    *    ever DECREASE under a merge (occurrences are destroyed, never
    *    created), and a disjoint pair loses none;
    *  - every member's count is STRICTLY greater than the count of the
    *    first rank-order pair that OVERLAPS the batch's symbols (and of
    *    the last fetched row, bounding the unseen tail): a merge (a,b)
    *    CREATES pairs like (x,ab) with count <= the pre-merge count of
    *    the overlapping (x,a) — such a creation can tie an equal-count
    *    candidate and win the lexicographic tie-break, so equal counts
    *    end the batch (the strict inequality makes created pairs unable
    *    to outrank any later batch member).
    *
    * Under those two rules, sequential replay picks exactly the batch
    * members in order (each step's argmax count is unchanged; every other
    * pair is <= it, with created/shrunk pairs strictly below the next
    * member), so the merge table is IDENTICAL — TextBpeSpec proves it
    * against the independent sequential reference, including on corpora
    * with ties. The first pair alone is always safe (that IS the
    * sequential step), guaranteeing progress when the rules truncate
    * everything else.
    */
  private[graft] def distributedMerges(s: SparkSession, wordFreq: DataFrame,
      merges: Int): Seq[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.Row
    def release(df: DataFrame): Unit = { df.unpersist(); () }
    var words = wordFreq
      .select(col("freq"), expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))").as("syms"))
      .persist()
    val out = Seq.newBuilder[Row]
    var rank = 1
    var dry = false
    var passes = 0
    // ONE left-to-right non-overlapping fold applying the WHOLE batch:
    // pairwise disjointness means at most one batch merge can match any
    // adjacency, and a merge neither breaks nor creates another batch
    // member's adjacencies — so a single scan equals sequential per-merge
    // application (TextBpeSpec proves it on adversarial corpora).
    // Replacing the matched tail element keeps self-overlap handling
    // automatic ("aaa" under (a,a) -> ["aa","a"]). One fold per PASS, not
    // per merge: chaining per-merge folds nests the column tree ~4x per
    // merge — exponential expression size, OOM by batch 10.
    def foldBatch(syms: Column, batch: Seq[(String, String, Long)]): Column =
      when(size(syms) < 2, syms).otherwise(aggregate(
        slice(syms, lit(2), size(syms) - 1),
        array(element_at(syms, 1)),
        (acc, x) => batch.foldLeft(concat(acc, array(x))) {
          case (els, (l, r, _)) =>
            when(element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(els)
        }))
    while (rank <= merges && !dry) {
      val remaining = merges - rank + 1
      // fetch a few times the remaining budget so the disjoint prefix has
      // room; bounded, so the collect stays driver-safe at any vocabulary
      val fetch = math.min(1024, math.max(16, 4 * remaining))
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(fetch).collect() // bounded: O(batch) rows per pass
      if (top.isEmpty) dry = true
      else {
        passes += 1
        // greedy disjoint prefix + strict-count truncation (see scaladoc).
        // The scan keeps walking past the selection budget: created pairs
        // arise only from sources OVERLAPPING a selected merge, so the
        // truncation bound is the count of the first overlapping pair
        // ANYWHERE below — not just within the budget window.
        val used = scala.collection.mutable.Set[String]()
        val sel = scala.collection.mutable.Buffer[(String, String, Long)]()
        var stopCnt = -1L // count bound created/overlapping pairs obey
        var i = 0
        while (i < top.length && stopCnt < 0) {
          val (l, r, c) =
            (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
          if (used(l) || used(r)) stopCnt = c
          else if (sel.size < remaining) {
            sel += ((l, r, c)); used += l; used += r
            // the CONCATENATION is used too: a later candidate containing
            // a member's merged symbol (x, l+r) has its true count CHANGED
            // by that member (applying (l,r) creates l+r occurrences), so
            // it must END the batch like any overlap — (l, r) alone misses
            // it. No such state is reachable from char-initialized training
            // that we could construct (l+r would have to pre-exist as a
            // symbol while (l,r) is still a live pair), but the proof in
            // the scaladoc does not close the case, so the guard does.
            used += (l + r)
          }
          // disjoint-but-over-budget rows neither select nor bound
          i += 1
        }
        if (stopCnt < 0 && top.length == fetch)
          stopCnt = top.last.getLong(2) // unseen tail bounds created pairs
        val batch0 =
          if (stopCnt >= 0) sel.takeWhile(_._3 > stopCnt).toSeq else sel.toSeq
        // progress guarantee: the argmax alone IS the sequential step
        val batch = if (batch0.isEmpty) sel.take(1).toSeq else batch0.toSeq
        batch.foreach { case (l, r, c) =>
          out += Row(rank, l, r, l + r, c)
          rank += 1
        }
        val next = words
          .select(col("freq"), foldBatch(col("syms"), batch).as("syms"))
          .persist()
        next.count() // materialize before dropping the parent
        release(words)
        words = next
      }
    }
    release(words)
    lastDistributedPasses.set(passes)
    out.result()
  }
}
