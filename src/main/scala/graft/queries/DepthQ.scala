package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import core._

/** Round-3 depth additions (SURVEY.md §2.13): map-typed columns (derived
  * from the event stream — closes §2.8's "no map data" gap), Spark-4
  * VARIANT extraction (the modern semi-structured scale path: parse once,
  * shred-friendly), mergeable HLL sketch columns (sketch-once /
  * union-cheap — THE 100 TB distinct-count pattern), ntile bucketing, and
  * two classic TPC-H decision-support shapes (Q4/Q18 adapted to this
  * schema: late-shipment priority audit, large-volume order report).
  *
  * Determinism: map iteration never surfaces raw (maps are reduced to
  * scalar/plain columns before output); every output carries a unique
  * total ORDER BY; quantity sums are integer-valued doubles (exact in any
  * order); HLL estimates are deterministic for a fixed lgConfigK but not
  * cross-engine → ⊘ no-oracle, error-bounded vs exact in OperatorSpec.
  */
object DepthQ {

  /** Map-typed columns, end to end: build a per-user event_type→count map
    * with map_from_entries (sorted entries — map column itself stays
    * order-deterministic), then consume it with map_keys / map_values /
    * element_at / map_filter / transform_values. The map is reduced to
    * plain columns so the oracle can mirror the semantics with a GROUP BY
    * (DuckDB map functions differ in shape; the *operator contract* here
    * is Spark's map family, verified by value equality of everything
    * computed THROUGH the maps). */
  val mapFuncs: QFn = (s, dir) => {
    val m = col("m")
    t(s, dir, "events")
      .filter(col("user_id") < 200)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(
        array_sort(collect_list(struct(col("event_type"), col("cnt")))))
        .as("m"))
      .select(
        col("user_id"),
        size(map_keys(m)).cast("long").as("n_types"),
        aggregate(map_values(m), lit(0L), (acc, x) => acc + x).as("total"),
        size(map_keys(map_filter(m, (_, v) => v >= 3))).cast("long")
          .as("n_heavy"),
        coalesce(element_at(m, "purchase"), lit(0L)).as("purchases"),
        coalesce(element_at(transform_values(m, (_, v) => v * 2), "view"),
          lit(0L)).as("views_x2"))
      .orderBy(col("user_id"))
  }

  /** Spark-4 VARIANT: parse the JSON props column once into a variant,
    * extract a typed path (variant_get) and a missing path
    * (try_variant_get → NULL, coalesced for cross-engine stability).
    * At 100 TB this is the shredded semi-structured read path — one parse,
    * typed access, no per-extraction JSON re-walk (contrast
    * get_json_object in qjson_props, which re-parses per call). */
  val variantExtract: QFn = (s, dir) =>
    t(s, dir, "events")
      .select(
        col("event_id"),
        col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        coalesce(
          expr("try_variant_get(parse_json(props), '$.missing', 'string')"),
          lit("absent")).as("miss"))
      .orderBy(col("event_id"))

  /** Mergeable HLL sketches (Datasketches HllSketch, Spark 3.5+): one
    * sketch per event_type (partial+final merge inside the agg), then the
    * per-type BINARY sketches are unioned with hll_union_agg — the
    * re-aggregation NEVER touches the raw data. This is the pattern that
    * matters at 100 TB: sketch columns are stored per partition/day and
    * any rollup (global, weekly, per-cohort) is a cheap union of KB-sized
    * sketches. ⊘ no oracle (estimate is engine-specific); rel-error vs
    * exact count_distinct bounded in OperatorSpec. */
  val hllSketchUnion: QFn = (s, dir) => {
    val perType = t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    perType
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("approx_users"))
      .unionAll(perType
        .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
          .as("approx_users"))
        .select(lit("ALL").as("event_type"), col("approx_users")))
      .orderBy(col("event_type"))
  }

  /** ntile(4) equi-height bucketing of customers by balance within each
    * nation (unique ORDER BY pins tie assignment), aggregated per bucket —
    * the quantile-bucketing primitive behind training-mix stratification. */
  val winNtile: QFn = (s, dir) => {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("bucket"))
      .groupBy(col("c_nationkey"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"))
      .orderBy(col("c_nationkey"), col("bucket"))
  }

  /** TPC-H Q4 shape (late-shipment priority audit): orders from 1995 H1
    * with at least one line item shipped more than 60 days after the
    * order date — EXISTS decorrelates to a left-semi join (equi key +
    * range residual), then a tiny group-by on priority. */
  val q04OrderPriority: QFn = (s, dir) => {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz")
        && col("o_orderdate") < lit("1995-07-01").cast("timestamp_ntz"))
    val l = t(s, dir, "lineitem")
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q18 shape (large-volume orders): orders whose total line-item
    * quantity exceeds 150, joined back to orders + customer for the
    * report, top-100 by total price. The heavy group-by runs FIRST on the
    * narrow (l_orderkey, l_quantity) projection; the join fans the small
    * survivor set out to the dimension tables (quantities are
    * integer-valued doubles — exact in any aggregation order). */
  val q18LargeOrders: QFn = (s, dir) => {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    t(s, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val queries: Map[String, QFn] = Map(
    "map_funcs"          -> mapFuncs,
    "variant_extract"    -> variantExtract,
    "hll_sketch_union"   -> hllSketchUnion,
    "win_ntile"          -> winNtile,
    "q04_order_priority" -> q04OrderPriority,
    "q18_large_orders"   -> q18LargeOrders)

  val oracle: Map[String, String] = Map(
    "map_funcs" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS cnt
        |  FROM events WHERE user_id < 200
        |  GROUP BY user_id, event_type)
        |SELECT user_id,
        |  count(*) AS n_types,
        |  sum(cnt) AS total,
        |  sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS n_heavy,
        |  coalesce(sum(CASE WHEN event_type = 'purchase' THEN cnt END), 0)
        |    AS purchases,
        |  coalesce(sum(CASE WHEN event_type = 'view' THEN cnt * 2 END), 0)
        |    AS views_x2
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,
    "variant_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  coalesce(json_extract_string(props, '$.missing'), 'absent')
        |    AS miss
        |FROM events ORDER BY event_id""".stripMargin,
    "win_ntile" ->
      """SELECT c_nationkey, bucket, count(*) AS n,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM (
        |  SELECT c_nationkey, c_acctbal,
        |    CAST(ntile(4) OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bucket
        |  FROM customer)
        |GROUP BY c_nationkey, bucket
        |ORDER BY c_nationkey, bucket""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) b
        |JOIN orders ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin)
}
