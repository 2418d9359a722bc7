package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Generic relational layer (SURVEY.md §B): the plain DataFrame/SQL surface
  * the jigsaw-equivalent operators are expressed in, exercised TPC-H-style on
  * the harness testdata. Each query is declarative end-to-end so Catalyst
  * pushes filters/projections into the parquet scan and picks join
  * strategies; small dimensions are broadcast explicitly.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  val all: Seq[Query] = Seq(

    // --- Q1-style pricing summary: single scan, hash agg (map-side partial).
    Query(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // --- Q3-style: 3-way join, agg, top-k. Customer dim is broadcast.
    Query(
      "q03_top_orders",
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // --- Q4-style: EXISTS → left-semi join, count by priority.
    Query(
      "q04_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |              AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1996-06-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey").as("o_orderkey"))
      ord.join(li, Seq("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // --- Q5-style: 6-way join; dims (region/nation/supplier/customer)
    //     broadcast, fact-fact join shuffles on orderkey only.
    Query(
      "q05_nation_revenue",
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val region = t(s, d, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, d, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      val supplier = t(s, d, "supplier")
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      t(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey")
            && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("n_name")
    },

    // --- Q6-style: pure scan-aggregate; filter fully pushed to parquet.
    Query(
      "q06_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp")
          && col("l_discount").between(0.03, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"), count(lit(1)).as("n"))
    },

    // --- Window: latest 3 orders per customer (row_number over a window).
    Query(
      "q07_latest_orders",
      """SELECT o_custkey, rn, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 AND o_custkey < 50
        |ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("o_custkey") < 50)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
        .orderBy("o_custkey", "rn")
    },

    // --- Distinct aggregation (A1 analog on the generic layer).
    Query(
      "q08_distinct_counts",
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    // --- J1 analog on the generic layer: union two subsets + dedup by key.
    Query(
      "q09_union_dedup",
      """SELECT o_orderkey, o_orderstatus FROM (
        |  SELECT DISTINCT o_orderkey, o_orderstatus FROM (
        |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 400000
        |    UNION ALL
        |    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        |  ))
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val ord = t(s, d, "orders")
      val a = ord.filter(col("o_totalprice") > 400000)
        .select("o_orderkey", "o_orderstatus")
      val b = ord.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderstatus")
      a.unionByName(b).dropDuplicates("o_orderkey").orderBy("o_orderkey")
    },

    // --- Anti-join: customers with no orders.
    Query(
      "q10_customers_no_orders",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // --- Top-k part demand: agg + deterministic top-20.
    Query(
      "q11_top_parts",
      """SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY total_qty DESC, l_partkey LIMIT 20""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(round(sum("l_quantity"), 2).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
        .limit(20)
    },

    // --- Events: hourly tumbling-window aggregation (batch form).
    Query(
      "q12_events_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-03 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour", "event_type")
    },

    // --- Events: JSON extraction from the props column.
    Query(
      "q13_events_json",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // --- Batch sessionization: gap-based session windows via lag + running
    //     sum — the batch twin of Streams.sessionize (30-min gap).
    Query(
      "q35_sessions",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessioned AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS INT)
        |      AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM sessioned WHERE user_id < 40
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .withColumn("new_session",
          when(unix_millis(col("ts")) - unix_millis(lag("ts", 1).over(w))
            > 1800000L, 1).otherwise(0))
        .withColumn("session_idx",
          sum("new_session").over(wRun).cast("int"))
        .filter(col("user_id") < 40)
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy("user_id", "session_idx")
    },

    // --- String-function surface (§2.8): split/concat/case/length/regex.
    Query(
      "q37_string_funcs",
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  upper(p_brand) AS brand_u,
        |  CAST(replace(p_brand, 'Brand#', '') AS INT) AS brand_num,
        |  concat(p_type, ':', p_name) AS tagged,
        |  length(p_name) AS name_len,
        |  CASE WHEN starts_with(p_name, 'small') THEN 1 ELSE 0 END AS is_small
        |FROM part WHERE p_partkey < 150
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_partkey") < 150)
        .select(col("p_partkey"),
          substring_index(col("p_name"), " ", 1).as("first_word"),
          upper(col("p_brand")).as("brand_u"),
          regexp_replace(col("p_brand"), "Brand#", "").cast("int")
            .as("brand_num"),
          concat(col("p_type"), lit(":"), col("p_name")).as("tagged"),
          length(col("p_name")).as("name_len"),
          when(col("p_name").startsWith("small"), 1).otherwise(0)
            .as("is_small"))
        .orderBy("p_partkey")
    },

    // --- Date-function surface (§2.8): extract/add/diff/truncate.
    Query(
      "q38_date_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
        |    o_orderdate) AS INT) AS days_since_epoch_start,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        |FROM orders WHERE o_orderkey < 120
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") < 120)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_format(date_add(col("o_orderdate").cast("date"), 30),
            "yyyy-MM-dd").as("due"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).as("days_since_epoch_start"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"))
        .orderBy("o_orderkey")
    },

    // --- Array/higher-order surface (§2.8): slice/sort/distinct/contains.
    Query(
      "q39_array_funcs",
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(lower(trim(text)), '\s+') AS tk
        |  FROM documents WHERE doc_id < 60)
        |SELECT doc_id,
        |  concat_ws('_', tk[1], tk[2], tk[3]) AS first3,
        |  CAST(len(list_distinct(tk)) AS INT) AS n_distinct,
        |  CASE WHEN list_contains(tk, 'the') THEN 1 ELSE 0 END AS has_the,
        |  list_sort(list_distinct(tk))[1] AS first_sorted
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tk = graft.operators.TextOps.tokens(col("text"))
      t(s, d, "documents")
        .filter(col("doc_id") < 60)
        .select(col("doc_id"),
          concat_ws("_", slice(tk, 1, 3)).as("first3"),
          size(array_distinct(tk)).as("n_distinct"),
          when(array_contains(tk, "the"), 1).otherwise(0).as("has_the"),
          sort_array(array_distinct(tk)).getItem(0).as("first_sorted"))
        .orderBy("doc_id")
    },

    // --- Rollup (grouping sets) with subtotals — A6 generic-layer surface.
    Query(
      "q36_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus")
    },

    // --- Cube: all grouping-set combinations (A6 companion to q36).
    Query(
      "q45_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority")
    },

    // --- Q17-style correlated scalar subquery, decorrelated by hand into a
    //     per-part aggregate re-joined to the fact table. Both sides shuffle
    //     on l_partkey; at scale AQE coalesces the agg side and can switch
    //     the join to broadcast when |parts| fits.
    Query(
      "q46_avg_yearly",
      """WITH lim AS (
        |  SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n
        |FROM lineitem l JOIN lim ON l.l_partkey = lim.l_partkey
        |WHERE l.l_quantity < lim.qlim""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val lim = li.groupBy("l_partkey")
        .agg((avg("l_quantity") * 0.2).as("qlim"))
      li.join(lim, "l_partkey")
        .filter(col("l_quantity") < col("qlim"))
        .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
          count(lit(1)).as("n"))
    },

    // --- Q19-style disjunction of conjunctive predicates over a broadcast
    //     dim join: the OR cannot prune the scan, but each branch's
    //     predicates evaluate codegen'd post-join.
    Query(
      "q47_disjunctive",
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 35)
        |   OR (p_type = 'PROMO' AND l_quantity >= 40)""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
      val part = t(s, d, "part")
      li.join(broadcast(part), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 20))
          || (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)
            && col("l_quantity").between(10, 35))
          || (col("p_type") === "PROMO" && col("l_quantity") >= 40))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n"))
    },

    // --- Exact interpolated percentiles per group (Spark `percentile` ≡
    //     DuckDB `quantile_cont`, both linear-interpolation type 7). Exact
    //     percentile is a sort-based aggregate — at 100 TB swap in
    //     approx_percentile (t-digest) and accept the error bound.
    Query(
      "q50_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 4).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // --- Conditional aggregation (CASE WHEN) + bucketing.
    Query(
      "q14_price_buckets",
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
          round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("bucket")
    }
  )
}
