package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import QUtil._

/** Core relational operators: scan/projection/limit (reference S1/R1/R2,
  * `components/ex-iceberg/src/component.py:36-40`), type coercion (R4,
  * `ex/src/component.py:110-136`), union (R5), dedup-by-key (R6/K5 join),
  * insertion order (R7, `ex/src/component.py:106-107`) — plus the general
  * relational capabilities (agg/join/window/rollup/semi/anti/json) the engine
  * provides natively through Catalyst.
  *
  * Every query is deterministic: unique ORDER BY keys, and all float
  * reductions go through QUtil.dsum (exact decimal accumulation).
  */
object Relational {

  val defs: Seq[QDef] = Seq(

    // S1+R1+R2: projection + limit pushed into the parquet scan.
    QDef(
      "s1_scan_project_limit",
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
          .limit(1000)),

    // R2: the reference's 100k scan cap (ex/src/component.py:37), made explicit.
    QDef(
      "r2_limit_cap_100k",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_shipdate
             |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100000""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber")
          .limit(100000)),

    // R1 + filter pushdown: predicate reaches the parquet reader.
    QDef(
      "r1_filter_pushdown",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem
             |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber")),

    // R4: type coercion chain (the reference's base-type collapse, ex:110-136).
    QDef(
      "r4_type_cast",
      Some("""SELECT o_orderkey,
             |  CAST(o_orderkey AS VARCHAR) AS key_str,
             |  CAST(o_orderdate AS DATE) AS odate,
             |  CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_num,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec2,
             |  CAST(o_custkey AS INT) AS cust_int
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            col("o_orderkey"),
            col("o_orderkey").cast("string").as("key_str"),
            col("o_orderdate").cast("date").as("odate"),
            substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_num"),
            col("o_totalprice").cast(DecimalType(18, 2)).cast("double").as("price_dec2"),
            col("o_custkey").cast("int").as("cust_int"))
          .orderBy("o_orderkey")),

    // R5: union-all (the reference's multi-batch append accumulation, ex:42-48).
    QDef(
      "r5_union_all",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
             |UNION ALL
             |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .unionByName(
            o.filter(col("o_orderstatus") === "F")
              .select("o_orderkey", "o_orderstatus", "o_totalprice"))
          .orderBy("o_orderkey")
      }),

    // R6: dedup-by-key — keep latest order per customer (the upsert equi-join
    // semantics of wr/src/component.py:107-108, expressed standalone).
    QDef(
      "r6_dedup_by_key",
      Some("""SELECT * FROM orders
             |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
             |ORDER BY o_custkey""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
          .orderBy("o_custkey")
      }),

    // R7: strict insertion-order mode — explicit ingest ordinal
    // (preserve_insertion_order, ex/src/component.py:106-107).
    QDef(
      "r7_insertion_order",
      Some("""SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS ingest_ord
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            row_number().over(Window.orderBy("ts", "event_id")).as("ingest_ord"))
          .orderBy("event_id")),

    // DISTINCT (exact row dedup).
    QDef(
      "dist1_distinct",
      Some("""SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
             |ORDER BY c_mktsegment, c_nationkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .select("c_mktsegment", "c_nationkey")
          .distinct()
          .orderBy("c_mktsegment", "c_nationkey")),

    // TPC-H Q1-style aggregation: partial (map-side) agg + single shuffle on
    // a low-cardinality key — scales linearly with data size.
    QDef(
      "q1_agg_pricing",
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${dsumSql("l_quantity")} AS sum_qty,
              |  ${dsumSql("l_extendedprice")} AS sum_base_price,
              |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
              |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
              |  ${davgSql("l_quantity")} AS avg_qty,
              |  COUNT(*) AS count_order
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-style: fact-fact shuffle join + broadcast dim join + top-k.
    QDef(
      "q3_join_topk",
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
              |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY l_orderkey, o_orderdate, o_orderpriority
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      (s, dir) => {
        val cutoff = lit("1998-01-01 00:00:00").cast("timestamp")
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        // customer is the small side at any scale factor -> broadcast; the
        // orders<->lineitem join shuffles on the shared key.
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      }),

    // TPC-H Q5-style: star join over 6 tables, broadcast all dims.
    QDef(
      "q5_join_multi",
      Some(s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
              |FROM region
              |JOIN nation ON n_regionkey = r_regionkey
              |JOIN customer ON c_nationkey = n_nationkey
              |JOIN orders ON o_custkey = c_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY n_name
              |ORDER BY revenue DESC, n_name""".stripMargin),
      (s, dir) => {
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
            && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        val l = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey")
            && col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }),

    // Window: running aggregate + row numbering per key.
    QDef(
      "w1_window_running",
      Some("""SELECT event_id, user_id,
             |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             |  CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 1000000.0 AS running_value
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(
            col("event_id"),
            col("user_id"),
            row_number().over(w).as("rn"),
            // micro-unit quantization — see QUtil.dsum for why not a
            // decimal cast
            (sum(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double") / lit(1000000.0)).as("running_value"))
          .orderBy("event_id")
      }),

    // Window: top-k per group.
    QDef(
      "w2_topk_per_group",
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) WHERE rn <= 3
             |ORDER BY p_brand, rn""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        t(s, dir, "part")
          .select(
            col("p_brand"), col("p_partkey"), col("p_retailprice"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 3)
          .orderBy("p_brand", "rn")
      }),

    // ROLLUP grouping sets.
    QDef(
      "g1_rollup",
      Some("""SELECT coalesce(lang, 'ALL') AS lang_g, coalesce(source, 'ALL') AS source_g,
             |  COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars
             |FROM documents GROUP BY ROLLUP(lang, source)
             |ORDER BY lang_g, source_g""".stripMargin),
      (s, dir) =>
        t(s, dir, "documents")
          .rollup("lang", "source")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
          .select(
            coalesce(col("lang"), lit("ALL")).as("lang_g"),
            coalesce(col("source"), lit("ALL")).as("source_g"),
            col("n"), col("chars"))
          .orderBy("lang_g", "source_g")),

    // Semi join (EXISTS).
    QDef(
      "j1_semi_join",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")),

    // Anti join (NOT EXISTS).
    QDef(
      "j2_anti_join",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")),

    // Sessionization: gaps-and-islands via lag() over epoch micros.
    QDef(
      "e1_sessionize",
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
             |  FROM events)
             |SELECT user_id,
             |  CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
             |  COUNT(*) AS n_events
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .groupBy("user_id")
          .agg(
            sum(when(col("prev_us").isNull
              || col("us") - col("prev_us") > 3600L * 1000000L, 1).otherwise(0)).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      }),

    // JSON field extraction from the events.props column.
    QDef(
      "e2_json_extract",
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) =>
        t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy("event_id")),

    // Ordered funnel analysis (round 10): per user, the first click, the
    // first view AFTER that click, the first purchase AFTER that view —
    // the conversion-funnel report every product-analytics stack ships.
    // Spark shape: ONE shuffle on user_id, then three dependent window
    // minima over the same partitioning (no self-joins — the oracle's
    // 3-join formulation restates it relationally); the final per-user
    // groupBy reuses the window partitioning, so joins=0, shuffles=1.
    QDef(
      "e3_funnel",
      Some("""WITH c AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS click_us FROM events
             |  WHERE event_type = 'click' GROUP BY user_id),
             |v AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS view_us
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'view' AND epoch_us(e.ts) > c.click_us
             |  GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.view_us
             |  GROUP BY e.user_id)
             |SELECT c.user_id AS user_id, c.click_us, v.view_us, p.purchase_us,
             |  CASE WHEN p.purchase_us IS NOT NULL THEN 3
             |       WHEN v.view_us IS NOT NULL THEN 2 ELSE 1 END AS stage
             |FROM c LEFT JOIN v ON c.user_id = v.user_id
             |LEFT JOIN p ON c.user_id = p.user_id
             |ORDER BY c.user_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
          .withColumn("click_us",
            min(when(col("event_type") === "click", col("us"))).over(w))
          .withColumn("view_us",
            min(when(col("event_type") === "view"
              && col("us") > col("click_us"), col("us"))).over(w))
          .withColumn("purchase_us",
            min(when(col("event_type") === "purchase"
              && col("us") > col("view_us"), col("us"))).over(w))
          .filter(col("click_us").isNotNull)
          .groupBy("user_id")
          .agg(min("click_us").as("click_us"), min("view_us").as("view_us"),
            min("purchase_us").as("purchase_us"))
          .withColumn("stage",
            when(col("purchase_us").isNotNull, 3)
              .when(col("view_us").isNotNull, 2).otherwise(1))
          .orderBy("user_id")
      })
  )
}
