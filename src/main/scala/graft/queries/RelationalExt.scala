package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QUtil._

/** Extended relational coverage beyond the reference surface: grouping-set
  * variants, set operations, outer joins, subqueries, pivot, scalar/array
  * function bundles, as-of and range joins, and order statistics. The
  * reference has none of these (SURVEY §2.6 "Absent categories") — they are
  * the Catalyst-native capabilities a user gains by switching engines.
  *
  * Scale notes are per-op; the as-of and range joins use the standard
  * shuffle-friendly rewrites (union+carry-forward window; time bucketing)
  * rather than inequality joins, which do not scale.
  */
object RelationalExt {

  val defs: Seq[QDef] = Seq(

    // CUBE grouping sets (all 4 combinations of the two dimensions).
    QDef(
      "g2_cube",
      Some("""SELECT coalesce(lang, 'ALL') AS lang_g, coalesce(source, 'ALL') AS source_g,
             |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY CUBE(lang, source)
             |ORDER BY lang_g, source_g""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .cube("lang", "source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
          .select(
            coalesce(col("lang"), lit("ALL")).as("lang_g"),
            coalesce(col("source"), lit("ALL")).as("source_g"),
            col("n"), col("chars"))
          .orderBy("lang_g", "source_g")),

    // Explicit GROUPING SETS with grouping_id disambiguation (distinguishes
    // a real NULL group key from a rolled-up one, unlike coalesce tricks).
    QDef(
      "g3_grouping_sets",
      Some("""SELECT lang, source, GROUPING(lang, source) AS gid, COUNT(*) AS n
             |FROM documents GROUP BY GROUPING SETS ((lang), (source), ())
             |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin),
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.createOrReplaceTempView("documents_gs")
        d.sparkSession.sql(
          """SELECT lang, source, grouping_id(lang, source) AS gid, COUNT(*) AS n
            |FROM documents_gs GROUP BY GROUPING SETS ((lang), (source), ())
            |ORDER BY gid, lang NULLS FIRST, source NULLS FIRST""".stripMargin)
      }),

    // INTERSECT (set semantics, distinct).
    QDef(
      "set1_intersect",
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")),

    // EXCEPT (set difference, distinct).
    QDef(
      "set2_except",
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
          .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
          .orderBy("nationkey")),

    // FULL OUTER join: slice customers so both unmatched sides are non-empty;
    // NULL ordering pinned explicitly (Spark defaults NULLS FIRST, DuckDB
    // NULLS LAST — never rely on either).
    QDef(
      "j3_full_outer",
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderstatus
             |FROM (SELECT * FROM customer WHERE c_custkey <= 100) c
             |FULL OUTER JOIN orders ON c_custkey = o_custkey
             |ORDER BY c_custkey NULLS LAST, o_orderkey NULLS LAST""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") <= 100)
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "full_outer")
          .select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")
          .orderBy(col("c_custkey").asc_nulls_last, col("o_orderkey").asc_nulls_last)),

    // Scalar subquery: orders above the global average price. The aggregate
    // side is a 1-row DataFrame broadcast into a cross join — no correlated
    // re-evaluation, one pass over orders.
    QDef(
      "sub1_scalar_subquery",
      Some(s"""SELECT o_orderkey, o_totalprice
              |FROM orders
              |WHERE o_totalprice > (SELECT ${davgSql("o_totalprice")} FROM orders)
              |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val avgDf = o.agg(davg(col("o_totalprice")).as("avg_price"))
        o.crossJoin(broadcast(avgDf))
          .filter(col("o_totalprice") > col("avg_price"))
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      }),

    // RANGE-interval window frame: per-event trailing 1-hour sum per user —
    // the frame is defined by the ORDER-BY VALUE distance (all ties
    // included), not a row count, which is what event-time analytics
    // actually mean. Addends are fixed-point quantized so the frame sums
    // are exact integers in both engines. One shuffle on user_id.
    QDef(
      "w5_range_frame",
      // The outer CAST pins the top-level type: DuckDB's SUM(BIGINT) yields
      // HUGEINT, which pandas materializes as float64 in the driver's hasher
      // and hash-mismatches Spark's int64 even when every value is equal.
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_q
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"),
            floor(col("value") * 1000000.0 + 0.5).cast("long").as("q"))
          .withColumn("trail_q", sum(col("q")).over(w))
          .select("event_id", "user_id", "trail_q")
          .orderBy("event_id")
      }),

    // Collation-aware string semantics (Spark 4 collations): equality,
    // prefix, and containment under UTF8_LCASE compare case-insensitively
    // without materializing lowercased copies — the oracle states the
    // lower()-normalized equivalent.
    QDef(
      "f6_collation",
      Some("""SELECT c_custkey,
             |  (lower(c_mktsegment) = 'automobile') AS is_auto_ci,
             |  starts_with(lower(c_name), 'customer#') AS name_prefix_ci,
             |  contains(lower(c_name), '00001') AS has_00001
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            (collate(col("c_mktsegment"), "UTF8_LCASE") === lit("automobile"))
              .as("is_auto_ci"),
            startswith(collate(col("c_name"), "UTF8_LCASE"), lit("CUSTOMER#"))
              .as("name_prefix_ci"),
            contains(collate(col("c_name"), "UTF8_LCASE"), lit("00001"))
              .as("has_00001"))
          .orderBy("c_custkey")),

    // Correlated EXISTS / NOT EXISTS subqueries: customers with at least
    // one high-value order and none cancelled — Catalyst decorrelates both
    // into semi/anti joins (one hash-partitioned pass each, no per-row
    // re-execution), the rewrite that makes correlated SQL viable at scale.
    QDef(
      "sub2_exists_subquery",
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
             |AND NOT EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
             |    AND o.o_totalprice < 1000)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("sub2_customer")
        t(s, dir, "orders").createOrReplaceTempView("sub2_orders")
        s.sql("""SELECT c_custkey, c_name FROM sub2_customer c
                |WHERE EXISTS (
                |  SELECT 1 FROM sub2_orders o
                |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
                |AND NOT EXISTS (
                |  SELECT 1 FROM sub2_orders o
                |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                |    AND o.o_totalprice < 1000)
                |ORDER BY c_custkey""".stripMargin)
      }),

    // SQL three-valued logic in one verifiable bundle: null-safe equality,
    // NULL propagation through comparisons and IN, NULLIF/COALESCE, and
    // explicit NULLS FIRST ordering — the semantics corner every engine
    // must agree on exactly.
    QDef(
      "n1_null_semantics",
      Some("""WITH j AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_nationkey END AS nk
             |  FROM customer)
             |SELECT c_custkey, nk,
             |  (nk IS NOT DISTINCT FROM NULL) AS is_null_safe,
             |  (nk = 7) AS eq7,
             |  (nk IN (1, 2, 3)) AS in123,
             |  coalesce(nk, -1) AS nk_filled,
             |  nullif(nk, 7) AS no7
             |FROM j ORDER BY nk NULLS FIRST, c_custkey""".stripMargin),
      (s, dir) => {
        val j = t(s, dir, "customer")
          .select(col("c_custkey"),
            when(col("c_custkey") % 3 === 0, lit(null))
              .otherwise(col("c_nationkey")).as("nk"))
        j.select(col("c_custkey"), col("nk"),
            (col("nk") <=> lit(null)).as("is_null_safe"),
            (col("nk") === 7).as("eq7"),
            col("nk").isin(1, 2, 3).as("in123"),
            coalesce(col("nk"), lit(-1L)).as("nk_filled"),
            nullif(col("nk"), lit(7L)).as("no7"))
          .orderBy(col("nk").asc_nulls_first, col("c_custkey"))
      }),

    // LATERAL subquery: each nation's three priciest orders via a
    // correlated lateral join — Catalyst decorrelates the per-row LIMIT
    // into a ranked window over one shuffled pass (the plan shape w2 uses
    // directly), so the SQL-standard LATERAL form costs the same as the
    // hand-written window rewrite.
    QDef(
      "j7_lateral",
      Some("""SELECT n.n_nationkey, t.o_orderkey, t.o_totalprice
             |FROM nation n, LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
             |ORDER BY n_nationkey, o_totalprice DESC, o_orderkey""".stripMargin),
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("j7_nation")
        t(s, dir, "orders").createOrReplaceTempView("j7_orders")
        t(s, dir, "customer").createOrReplaceTempView("j7_customer")
        s.sql("""SELECT n.n_nationkey, t.o_orderkey, t.o_totalprice
                |FROM j7_nation n, LATERAL (
                |  SELECT o_orderkey, o_totalprice FROM j7_orders
                |  JOIN j7_customer ON o_custkey = c_custkey
                |  WHERE c_nationkey = n.n_nationkey
                |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
                |ORDER BY n_nationkey, o_totalprice DESC, o_orderkey""".stripMargin)
      }),

    // PIVOT: order counts per nation x market segment. Explicit value list so
    // the output schema is static (required for both engines and for any
    // sane plan at scale — dynamic pivot means a driver-side distinct first).
    QDef(
      "pv1_pivot",
      Some("""SELECT c_nationkey,
             |  COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS AUTOMOBILE,
             |  COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS BUILDING,
             |  COUNT(*) FILTER (c_mktsegment = 'FURNITURE') AS FURNITURE,
             |  COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS HOUSEHOLD,
             |  COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS MACHINERY
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy("c_nationkey")
          .pivot("c_mktsegment",
            Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("c_nationkey")),

    // Scalar function bundle: string/date/math expressions with identical
    // cross-engine semantics (all codegen'd, no UDFs).
    QDef(
      "f1_scalar_funcs",
      Some("""SELECT o_orderkey,
             |  upper(o_orderstatus) AS status_u,
             |  substring(o_orderpriority, 3) AS prio_txt,
             |  length(o_orderpriority) AS prio_len,
             |  concat(o_orderstatus, '-', o_orderpriority) AS tag,
             |  EXTRACT(year FROM o_orderdate) AS y,
             |  EXTRACT(month FROM o_orderdate) AS m,
             |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |  abs(o_totalprice - 100000.0) AS dist_100k,
             |  CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_k,
             |  o_orderkey % 7 AS key_mod,
             |  greatest(o_totalprice, 50000.0) AS at_least_50k,
             |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            upper(col("o_orderstatus")).as("status_u"),
            substring(col("o_orderpriority"), 3, Int.MaxValue).as("prio_txt"),
            length(col("o_orderpriority")).as("prio_len"),
            concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
            abs(col("o_totalprice") - 100000.0).as("dist_100k"),
            floor(col("o_totalprice") / 1000.0).as("price_k"),
            (col("o_orderkey") % 7).as("key_mod"),
            greatest(col("o_totalprice"), lit(50000.0)).as("at_least_50k"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_decoded"))
          .orderBy("o_orderkey")),

    // Array function bundle over the embeddings list column: slice, length,
    // element access, reverse, per-element transform — all row-local.
    QDef(
      "f2_array_funcs",
      Some("""SELECT vec_id,
             |  len(embedding) AS dim,
             |  CAST(embedding[1] AS DOUBLE) AS first_e,
             |  CAST(embedding[len(embedding)] AS DOUBLE) AS last_e,
             |  CAST(list_reverse(embedding[1:3])[1] AS DOUBLE) AS rev_head,
             |  len(list_filter(embedding, x -> x >= 0)) AS n_nonneg,
             |  CAST(list_transform(embedding[1:2], x -> CAST(x AS DOUBLE) * 2.0)[1] AS DOUBLE) AS twice_first
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "embeddings")
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            element_at(col("embedding"), 1).cast("double").as("first_e"),
            element_at(col("embedding"), size(col("embedding"))).cast("double").as("last_e"),
            element_at(reverse(slice(col("embedding"), 1, 3)), 1).cast("double").as("rev_head"),
            size(filter(col("embedding"), x => x >= 0)).cast("long").as("n_nonneg"),
            element_at(transform(slice(col("embedding"), 1, 2),
              x => x.cast("double") * 2.0), 1).as("twice_first"))
          .orderBy("vec_id")),

    // AS-OF join: each purchase matched to the user's latest click at-or-
    // before it. Implemented as the scalable union + carry-forward-window
    // rewrite (one shuffle on user_id, no inequality join): tag both streams,
    // sort by (ts, clicks-first), carry the last click ts forward.
    QDef(
      "j5_asof_join",
      Some("""SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            col("ts").as("click_ts_raw"), lit(0).as("kind"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("timestamp").as("click_ts_raw"), lit(1).as("kind"))
        // kind=0 sorts clicks before purchases at equal ts => "at or before"
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("click_ts", last(col("click_ts_raw"), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"), col("ts"), col("click_ts"))
          .orderBy("event_id")
      }),

    // Range (interval) join: event pairs of the same user within 10 minutes.
    // Implemented by time-bucketing: join on (user, bucket) for the event's
    // own and next bucket, then apply the exact predicate — an equi-join
    // Catalyst can hash-partition, instead of an O(n^2) theta join. Emitting
    // a<b once means joining a to both buckets b could land in.
    QDef(
      "j6_range_join",
      Some("""SELECT a.event_id AS id_a, b.event_id AS id_b,
             |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
             |FROM events a JOIN events b
             |  ON a.user_id = b.user_id AND a.event_id < b.event_id
             |  AND b.ts >= a.ts AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
             |ORDER BY id_a, id_b""".stripMargin),
      (s, dir) => {
        val winUs = 600000000L // 10 min
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
        val a = ev.select(col("event_id").as("id_a"), col("user_id"), col("us").as("us_a"),
          explode(array((col("us") / winUs).cast("long"),
            (col("us") / winUs).cast("long") + 1L)).as("bucket"))
        val b = ev.select(col("event_id").as("id_b"), col("user_id"), col("us").as("us_b"),
          (col("us") / winUs).cast("long").as("bucket"))
        a.join(b, Seq("user_id", "bucket"))
          .filter(col("id_a") < col("id_b")
            && col("us_b") >= col("us_a") && col("us_b") - col("us_a") <= winUs)
          .select(col("id_a"), col("id_b"), (col("us_b") - col("us_a")).as("dt_us"))
          .distinct() // a pair can collide in both buckets
          .orderBy("id_a", "id_b")
      }),

    // NEAREST as-of join with tolerance (round 10) — pandas
    // merge_asof(direction='nearest'): each click pairs with the CLOSEST
    // purchase by the same user within +/-30 min, either direction (j5 is
    // the backward-only variant). Equi-join rewrite: purchases register
    // under their own 30-min bucket AND both neighbors, so a click probes
    // ONE bucket key and still sees every candidate within tolerance —
    // cost tracks true candidates, never user-cross-products; the argmin
    // is a per-click window (tie-break: time diff, then earlier purchase,
    // then id — deterministic in both engines).
    QDef(
      "j8_asof_nearest",
      Some("""WITH c AS (
             |  SELECT event_id AS cid, user_id, epoch_us(ts) AS cus
             |  FROM events WHERE event_type = 'click'),
             |p AS (
             |  SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
             |  FROM events WHERE event_type = 'purchase'),
             |cand AS (
             |  SELECT c.cid, c.user_id, p.pid, p.pus,
             |    abs(p.pus - c.cus) AS adt
             |  FROM c JOIN p ON c.user_id = p.user_id
             |  WHERE abs(p.pus - c.cus) <= 1800000000)
             |SELECT cid, user_id, pid, CAST(adt AS BIGINT) AS abs_dt_us FROM (
             |  SELECT cid, user_id, pid, adt,
             |    row_number() OVER (PARTITION BY cid ORDER BY adt, pus, pid) AS rn
             |  FROM cand)
             |WHERE rn = 1 ORDER BY cid""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tolUs = 1800L * 1000000L // 30 min; also the bucket width
        val ev = t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("cid"), col("user_id"),
            col("us").as("cus"), (col("us") / tolUs).cast("long").as("bucket"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"),
            col("us").as("pus"),
            explode(array(
              (col("us") / tolUs).cast("long") - 1L,
              (col("us") / tolUs).cast("long"),
              (col("us") / tolUs).cast("long") + 1L)).as("bucket"))
        val byClick = Window.partitionBy("cid")
          .orderBy(col("adt"), col("pus"), col("pid"))
        clicks.join(purchases, Seq("user_id", "bucket"))
          .withColumn("adt", abs(col("pus") - col("cus")))
          .filter(col("adt") <= tolUs)
          // each click probes exactly ONE bucket key, so a pair appears at
          // most once (the replicated side never meets the same click twice)
          .withColumn("rn", row_number().over(byClick))
          .filter(col("rn") === 1)
          .select(col("cid"), col("user_id"), col("pid"),
            col("adt").as("abs_dt_us"))
          .orderBy("cid")
      }),

    // Window function bundle: offsets, ranks, distribution functions, and
    // frame-bounded first/last over a deterministic (unique-key) ordering.
    QDef(
      "w3_window_funcs",
      Some("""SELECT p_partkey, p_brand, p_retailprice,
             |  lag(p_retailprice) OVER w AS prev_price,
             |  lead(p_retailprice) OVER w AS next_price,
             |  rank() OVER w AS rnk,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume,
             |  ntile(4) OVER w AS quartile,
             |  first_value(p_partkey) OVER w AS cheapest_key,
             |  last_value(p_partkey) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key
             |FROM part
             |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
             |ORDER BY p_partkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
        val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "part")
          .select(
            col("p_partkey"), col("p_brand"), col("p_retailprice"),
            lag("p_retailprice", 1).over(w).as("prev_price"),
            lead("p_retailprice", 1).over(w).as("next_price"),
            rank().over(w).as("rnk"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            ntile(4).over(w).as("quartile"),
            first_value(col("p_partkey")).over(w).as("cheapest_key"),
            last_value(col("p_partkey")).over(full).as("priciest_key"))
          .orderBy("p_partkey")
      }),

    // Cross join: every (region, market segment) pair with customer counts —
    // the small-x-small cartesian every reporting rollup needs.
    QDef(
      "j4_cross_join",
      Some("""SELECT r_name, seg, n FROM region
             |CROSS JOIN (SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer GROUP BY 1) s
             |ORDER BY r_name, seg""".stripMargin),
      (s, dir) => {
        val segs = t(s, dir, "customer")
          .groupBy(col("c_mktsegment").as("seg")).agg(count(lit(1)).as("n"))
        t(s, dir, "region").select("r_name")
          .crossJoin(broadcast(segs))
          .orderBy("r_name", "seg")
      }),

    // Order statistics: discrete percentiles (selection of actual values, so
    // exact and engine-independent) per group.
    QDef(
      "a1_percentiles",
      Some("""SELECT l_returnflag,
             |  quantile_disc(l_quantity, 0.5) AS p50,
             |  quantile_disc(l_quantity, 0.9) AS p90,
             |  min(l_quantity) AS qmin, max(l_quantity) AS qmax
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"),
            min("l_quantity").as("qmin"), max("l_quantity").as("qmax"))
          .orderBy("l_returnflag")),

    // COUNT(DISTINCT) — exact, per group, two-level shuffle.
    QDef(
      "a2_count_distinct",
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
          .orderBy("event_type")),

    // Two-phase salted aggregation: the skew pattern for hot grouping keys.
    // Phase 1 aggregates on (key, salt) — hot keys fan out over 16 reducers —
    // phase 2 merges the partials per key. Result is identical to a direct
    // groupBy (sums/counts are associative; the decimal sum keeps the double
    // reduction exact), and both phases are map-side combinable.
    QDef(
      "q6_skew_twophase_agg",
      Some(s"""SELECT event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.types.{DecimalType, DoubleType}
        val partial = t(s, dir, "events")
          .withColumn("salt", pmod(col("event_id"), lit(16)))
          .groupBy("event_type", "salt")
          .agg(count(lit(1)).as("pn"),
            // micro-unit quantization (see QUtil.dsum) keeps the two-phase
            // sum exact and bit-identical to the single-phase oracle
            sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long")
              .cast(DecimalType(38, 0))).as("psum"))
        partial
          .groupBy("event_type")
          .agg(sum("pn").as("n"),
            (sum("psum").cast(DoubleType) / lit(1000000.0)).as("sum_value"))
          .orderBy("event_type")
      }),

    // Top-k per group via a typed Aggregator (graft.functions.TopKAggregator):
    // identical result to the window formulation (w2), but the shuffle moves
    // k values per partition instead of sorting whole partitions — the shape
    // that wins when groups are huge. Same oracle as w2 cross-checks the two.
    QDef(
      "w4_topk_aggregator",
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) WHERE rn <= 3
             |ORDER BY p_brand, rn""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val topk = new graft.functions.TopKAggregator(3).toColumn
        t(s, dir, "part")
          .select(col("p_brand"), col("p_retailprice"), col("p_partkey"))
          .as[(String, Double, Long)]
          .groupByKey(_._1)
          .mapValues(r => (r._2, r._3))
          .agg(topk.name("topk"))
          .flatMap { case (brand, top) =>
            top.zipWithIndex.map { case ((price, key), i) =>
              (brand, key, price, i + 1)
            }
          }
          .toDF("p_brand", "p_partkey", "p_retailprice", "rn")
          .orderBy("p_brand", "rn")
      }),

    // Regex function bundle: extract / global replace / match / count with
    // cross-engine-identical semantics (Spark replaces globally by default;
    // DuckDB needs the 'g' flag — pinned explicitly on the oracle side).
    QDef(
      "f4_regex_funcs",
      Some("""SELECT o_orderkey,
             |  regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2) AS prio_word,
             |  regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS masked,
             |  regexp_matches(o_orderpriority, '^[123]-') AS is_top3,
             |  len(regexp_extract_all(o_orderpriority, '[A-Z]')) AS n_upper
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            regexp_extract(col("o_orderpriority"), "([0-9]+)-([A-Z]+)", 2).as("prio_word"),
            regexp_replace(col("o_orderpriority"), "[0-9]+", "#").as("masked"),
            col("o_orderpriority").rlike("^[123]-").as("is_top3"),
            regexp_count(col("o_orderpriority"), lit("[A-Z]")).cast("long").as("n_upper"))
          .orderBy("o_orderkey")),

    // Datetime function bundle over the events timestamp (session pinned
    // UTC, so wall-clock fields match the oracle's NTZ values exactly):
    // field extraction, epoch micros, ISO truncation, and date arithmetic —
    // all codegen'd built-ins.
    QDef(
      "f5_datetime_funcs",
      Some("""SELECT event_id,
             |  CAST(ts AS DATE) AS d,
             |  EXTRACT(hour FROM ts) AS h,
             |  EXTRACT(minute FROM ts) AS mi,
             |  EXTRACT(second FROM ts) AS sec,
             |  EXTRACT(quarter FROM ts) AS q,
             |  dayofyear(ts) AS doy,
             |  weekofyear(ts) AS woy,
             |  epoch_us(ts) AS us,
             |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
             |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
             |  CAST(ts AS DATE) + 7 AS next_week,
             |  last_day(CAST(ts AS DATE)) AS month_end,
             |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            col("ts").cast("date").as("d"),
            hour(col("ts")).cast("long").as("h"),
            minute(col("ts")).cast("long").as("mi"),
            second(col("ts")).cast("long").as("sec"),
            quarter(col("ts")).cast("long").as("q"),
            dayofyear(col("ts")).cast("long").as("doy"),
            weekofyear(col("ts")).cast("long").as("woy"),
            unix_micros(col("ts")).as("us"),
            date_trunc("day", col("ts")).as("day_start"),
            date_trunc("week", col("ts")).as("week_start"),
            date_add(col("ts").cast("date"), 7).as("next_week"),
            last_day(col("ts").cast("date")).as("month_end"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
              .cast("long").as("days_since"))
          .orderBy("event_id")),

    // VARIANT (Spark 4's semi-structured type): props parsed once to a
    // VARIANT value, fields then extracted TYPED via variant_get — the
    // shred-at-read shape that replaces per-access JSON re-parsing; a
    // missing path yields NULL (not an error). The oracle states the same
    // values through DuckDB's JSON functions.
    QDef(
      "v3_variant",
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
             |  json_extract_string(props, '$.k') AS k_str,
             |  coalesce(json_extract_string(props, '$.missing'), 'none') AS absent
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"), parse_json(col("props")).as("v"))
          .select(
            col("event_id"),
            expr("variant_get(v, '$.k', 'bigint')").as("k_num"),
            expr("variant_get(v, '$.k', 'string')").as("k_str"),
            coalesce(expr("variant_get(v, '$.missing', 'string')"), lit("none"))
              .as("absent"))
          .orderBy("event_id")),

    // Bucketed co-located join: both fact tables written bucketed+sorted on
    // the join key, so the join runs with ZERO shuffle exchanges (verified
    // in PlanSpec) — the layout investment that pays off when a key is
    // joined repeatedly at 100 TB. Buckets also pre-sort, so the SMJ skips
    // its sort.
    QDef(
      "b1_bucketed_join",
      Some(s"""SELECT o_orderkey, o_totalprice,
              |  ${dsumSql("l_extendedprice")} AS lineitem_total, COUNT(*) AS n_items
              |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
              |GROUP BY o_orderkey, o_totalprice
              |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        // bucketed-table build is fixture, not the operator under test (the
        // zero-shuffle join is) — memoized per sfDir, see QUtil.cachedFixture
        QUtil.cachedFixture(s, "b1", dir) { _ =>
          Seq("b1_orders", "b1_lineitem").foreach { tbl =>
            s.sql(s"DROP TABLE IF EXISTS $tbl")
            // a crashed earlier run can leave the managed location behind
            // with no catalog entry — remove it or CTAS refuses to create
            val loc = new org.apache.hadoop.fs.Path(
              s.conf.get("spark.sql.warehouse.dir"), tbl)
            val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
            if (fs.exists(loc)) fs.delete(loc, true)
          }
          t(s, dir, "orders")
            .write.mode("overwrite")
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable("b1_orders")
          t(s, dir, "lineitem")
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable("b1_lineitem")
        }
        // hint("merge") pins the sort-merge strategy: at fixture scale the
        // planner would broadcast the small side, which hides the property
        // under test — two bucketed facts joining with zero exchanges (at
        // 100 TB neither side is broadcastable and SMJ is the natural pick)
        s.table("b1_lineitem")
          .join(s.table("b1_orders").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderkey", "o_totalprice")
          .agg(dsum(col("l_extendedprice")).as("lineitem_total"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderkey")
      }),

    // The spark.sql surface: same engine, SQL text in — register temp views,
    // run a multi-table statement through the parser/analyzer path.
    QDef(
      "v1_sql_surface",
      Some("""SELECT n_name, COUNT(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("v1_customer")
        t(s, dir, "nation").createOrReplaceTempView("v1_nation")
        s.sql(
          """SELECT n_name, COUNT(*) AS n_customers
            |FROM v1_customer JOIN v1_nation ON c_nationkey = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin)
      }),

    // HLL sketch cardinality (approx_count_distinct): the constant-memory
    // alternative to a2 at 100 TB. Sketches merge associatively, so the agg
    // is map-side combinable with no distinct shuffle. Sketch ESTIMATES
    // differ across engines, so the oracle gates the error BOUND instead:
    // the query emits exact counts plus a within-tolerance flag (HLL at
    // rsd=0.02 against a 5x slack), and DuckDB states exact + literal true
    // — an estimate drifting out of tolerance flips the flag and fails the
    // hash compare. The approximate op is thereby oracle-gated without
    // pretending sketch internals are portable.
    QDef(
      "a3_hll_approx",
      Some("""SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
             |  true AS approx_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
            countDistinct("user_id").as("exact_users"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users"))
              .cast("double") / col("exact_users") <= 0.10).as("approx_ok"))
          .orderBy("event_type")),

    // Approximate quantiles (the t-digest/KLL-family sketch op), gated the
    // a3 way: approx_percentile guarantees RANK error <= 1/accuracy, so the
    // query verifies that bound in-query — the fraction of rows at or below
    // each approximate quantile must sit within epsilon of the target rank —
    // and the oracle states the deterministic half (exact per-group rows)
    // plus literal-true flags. One map-side-combinable pass at any scale;
    // the sketch merges associatively across partitions.
    QDef(
      "a4_approx_quantiles",
      Some("""SELECT event_type, COUNT(*) AS n, true AS p50_ok, true AS p95_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val ev = t(s, dir, "events")
        val approx = ev.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap50"),
          percentile_approx(col("value"), lit(0.95), lit(1000)).as("ap95"))
        // verify the rank-error contract against the data itself: rank of
        // the approximate quantile within its group vs the target rank
        val ranked = ev.join(approx, "event_type")
          .groupBy("event_type")
          .agg(
            first("n").as("n"),
            (sum(when(col("value") <= col("ap50"), 1L).otherwise(0L))
              .cast("double") / first("n")).as("r50"),
            (sum(when(col("value") <= col("ap95"), 1L).otherwise(0L))
              .cast("double") / first("n")).as("r95"))
        ranked.select(col("event_type"), col("n"),
          (abs(col("r50") - 0.5) <= 0.05).as("p50_ok"),
          (abs(col("r95") - 0.95) <= 0.05).as("p95_ok"))
          .orderBy("event_type")
      }),

    // UNPIVOT (melt): wide per-order measures back to (key, measure, value)
    // rows — the inverse of pv1's pivot, Spark's `unpivot`/`melt` API against
    // SQL-standard UNPIVOT in the oracle. Row-local at any scale.
    QDef(
      "pv2_unpivot",
      Some("""SELECT o_orderkey, measure, CAST(val AS DOUBLE) AS val
             |FROM (
             |  SELECT o_orderkey, o_totalprice AS price,
             |    CAST(o_custkey AS DOUBLE) AS cust_d,
             |    CAST(o_orderkey % 7 AS DOUBLE) AS key_mod
             |  FROM orders)
             |UNPIVOT (val FOR measure IN (price, cust_d, key_mod))
             |ORDER BY o_orderkey, measure""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            col("o_custkey").cast("double").as("cust_d"),
            (col("o_orderkey") % 7).cast("double").as("key_mod"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("price"), col("cust_d"), col("key_mod")),
            "measure", "val")
          .orderBy("o_orderkey", "measure"))
  )
}
