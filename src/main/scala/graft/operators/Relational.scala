package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics layer: relational operators the engine inherits from Spark
  * (SURVEY.md §2.4-2.7). The reference has no general SQL surface — these
  * exercise the operators our engine exposes over extraction result rows.
  *
  * Scale notes (100 TB design point):
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast; only the fact tables (lineitem/orders/events) shuffle.
  *  - aggregations are partial (map-side combine) by construction —
  *    groupBy on declarative columns lets Catalyst plan HashAggregate
  *    partial/final pairs.
  *  - every predicate is a pushdown-able Column expression (shows up in
  *    parquet `PushedFilters`), never a UDF.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Net revenue expression shared by several queries. */
  private def netPrice: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // --- A-series: aggregations -------------------------------------------

  val q01PricingSummary: QueryDef = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(netPrice), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      round(avg(l_quantity), 4) AS avg_qty,
      round(avg(l_discount), 4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  val q02FilterProject: QueryDef = QueryDef(
    "q02_filter_project",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1997-01-01") && col("l_discount") > 0.08)
        .select(
          // raw IEEE multiply — bit-identical across engines; rounding a
          // per-row scalar would diverge at half-cent boundaries
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          netPrice.as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey,
      l_extendedprice * (1.0 - l_discount) AS net_price
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01' AND l_discount > 0.08
      ORDER BY l_orderkey, l_linenumber"""))

  val q03MarketRevenue: QueryDef = QueryDef(
    "q03_market_revenue",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
      round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    headline = true)

  val q04RegionalRevenue: QueryDef = QueryDef(
    "q04_regional_revenue",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // pre-aggregate the fact side by join key BEFORE the join chain:
      // 4x fewer rows enter the orders shuffle, and the final rollup adds
      // partial sums (sum of sums == sum, count via sum of counts)
      val liByOrder = li.groupBy(col("l_orderkey"))
        .agg(sum(netPrice).as("order_net"), count(lit(1)).as("order_items"))
      liByOrder.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("order_net")), 2).as("revenue"),
          sum(col("order_items")).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
      round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    headline = true)

  // --- W-series: windows / sorts / top-k --------------------------------

  val q05TopSuppliers: QueryDef = QueryDef(
    "q05_top_suppliers",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val rev = li.groupBy(col("l_suppkey"))
        .agg(round(sum(netPrice), 2).as("revenue"))
      rev.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
        .limit(10)
    },
    Some("""SELECT s_suppkey, s_name, revenue FROM (
      SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      FROM lineitem GROUP BY l_suppkey) r
      JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY revenue DESC, s_suppkey LIMIT 10"""),
    headline = true)

  val q06OrderPriority: QueryDef = QueryDef(
    "q06_order_priority",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders
      FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val q07TopPerNation: QueryDef = QueryDef(
    "q07_top_per_nation",
    (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("c_nationkey"), col("rk"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rk"))
    },
    Some("""SELECT c_nationkey, rk, c_custkey, c_name, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
        row_number() OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer) x WHERE rk <= 3
      ORDER BY c_nationkey, rk"""))

  val q08RunningTotal: QueryDef = QueryDef(
    "q08_running_total",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      FROM orders ORDER BY o_custkey, o_orderkey"""),
    headline = true)

  // --- J-series: join shapes (SURVEY §2.4) -------------------------------

  val q09AntiJoin: QueryDef = QueryDef(
    "q09_customers_no_f_orders",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  val q10SemiJoin: QueryDef = QueryDef(
    "q10_customers_with_f_orders",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      ORDER BY c_custkey"""))

  val q11LeftJoinCoalesce: QueryDef = QueryDef(
    "q11_left_join_coalesce",
    (s, dir) => {
      // J3 semantics: cached result (order count) supplied by history when
      // present, default otherwise.
      val c = t(s, dir, "customer")
      val cnt = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      c.join(cnt, c("c_custkey") === cnt("o_custkey"), "left_outer")
        .select(
          col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, coalesce(n.n, 0) AS n_orders
      FROM customer c LEFT JOIN (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) n
      ON c.c_custkey = n.o_custkey
      ORDER BY c_custkey"""))

  // --- SO-series: set operations -----------------------------------------

  val q12UnionDistinct: QueryDef = QueryDef(
    "q12_union_nationkeys",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sup).distinct().orderBy(col("nationkey"))
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  val q13Intersect: QueryDef = QueryDef(
    "q13_intersect_nationkeys",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersect(sup).orderBy(col("nationkey"))
    },
    Some("""SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"""))

  // --- grouping sets ------------------------------------------------------

  val q14Rollup: QueryDef = QueryDef(
    "q14_rollup_region_nation",
    (s, dir) => {
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val c = t(s, dir, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    },
    Some("""SELECT r_name, n_name, count(*) AS n_customers,
      round(sum(c_acctbal), 2) AS total_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""))

  // --- events: time + JSON -----------------------------------------------

  val q15EventsDaily: QueryDef = QueryDef(
    "q15_events_daily",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""SELECT CAST(ts AS DATE) AS day, event_type,
      count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""),
    headline = true)

  val q16EventsJson: QueryDef = QueryDef(
    "q16_events_json",
    (s, dir) => {
      val e = t(s, dir, "events")
      e.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02FilterProject, q03MarketRevenue, q04RegionalRevenue,
    q05TopSuppliers, q06OrderPriority, q07TopPerNation, q08RunningTotal,
    q09AntiJoin, q10SemiJoin, q11LeftJoinCoalesce, q12UnionDistinct,
    q13Intersect, q14Rollup, q15EventsDaily, q16EventsJson)
}
