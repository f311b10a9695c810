package graft.queries

import org.apache.spark.sql.functions._
import core._

/** Relational contract queries: scans, filter/project, joins, aggregations,
  * rollup, top-k (SURVEY.md §2.1–§2.6).
  *
  * All plans are declarative DataFrame compositions so Catalyst gets full
  * pushdown/pruning freedom: filters land in `PushedFilters` on the parquet
  * scan, dimension joins broadcast, aggregates run partial+final. At cluster
  * scale the join orders here are hand-written small→large so AQE's build-side
  * election and broadcast thresholds do the right thing without hints.
  */
object Relational {

  /** Column-pruned projection scan — verifies pushdown + pruned ReadSchema. */
  val scanLineitem: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q1-style pricing summary: 8 aggregates over 2 group flags. */
  val q01: QFn = (s, dir) => {
    val li = t(s, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-02"))
    val qty = dec(col("l_quantity"), 12, 2)
    val ep  = dec(col("l_extendedprice"), 18, 4)
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    val charge = rev * (lit(1) + dec(col("l_tax"), 9, 4))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(qty)).as("sum_qty"),
        dbl(sum(ep)).as("sum_base_price"),
        dbl(sum(rev)).as("sum_disc_price"),
        dbl(sum(charge)).as("sum_charge"),
        (dbl(sum(qty)) / count(lit(1))).as("avg_qty"),
        (dbl(sum(ep)) / count(lit(1))).as("avg_price"),
        (dbl(sum(dec(col("l_discount"), 9, 4))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3-style: 3-way join + agg + global top-10 (TakeOrderedAndProject). */
  val q03: QFn = (s, dir) => {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-06-30"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-06-30"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style 6-way join with a compound non-FK key (supplier nation =
    * customer nation), revenue per ASIA nation. */
  val q05: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
    t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(revenue(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style scan-filter-scalar-agg (pure pushdown exercise). */
  val q06: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(dbl(sum(dec(col("l_extendedprice"), 18, 4) *
        dec(col("l_discount"), 9, 4))).as("revenue"))

  /** ROLLUP over status × priority; NULL grouping slots surfaced as 'ALL'
    * so both engines order identically (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST — the sentinel sidesteps the divergence). */
  val rollupOrders: QFn = (s, dir) =>
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(dec(col("o_totalprice"), 18, 4))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val queries: Map[String, QFn] = Map(
    "scan_lineitem"       -> scanLineitem,
    "q01_pricing_summary" -> q01,
    "q03_topk_revenue"    -> q03,
    "q05_region_join"     -> q05,
    "q06_filter_agg"      -> q06,
    "qrollup_orders"      -> rollupOrders)

  val oracle: Map[String, String] = Map(
    "scan_lineitem" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($revenueSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum($revenueSql * (1 + CAST(l_tax AS DECIMAL(9,4)))) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
         |  CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_topk_revenue" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-06-30'
         |  AND l_shipdate > TIMESTAMP '1996-06-30'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q05_region_join" ->
      s"""SELECT n_name, CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q06_filter_agg" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |  CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "qrollup_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
}
