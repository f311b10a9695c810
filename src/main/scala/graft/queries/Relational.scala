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
        moneySum(ep).as("sum_base_price"),
        moneySum(rev).as("sum_disc_price"),
        moneySum(charge).as("sum_charge"),
        (dbl(sum(qty)) / count(lit(1))).as("avg_qty"),
        (moneySum(ep) / count(lit(1))).as("avg_price"),
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
      .agg(moneySum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
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
      .agg(moneySum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q6-style scan-filter-scalar-agg (pure pushdown exercise). */
  val q06: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(moneySum(dec(col("l_extendedprice"), 18, 4) *
        dec(col("l_discount"), 9, 4)).as("revenue"))

  /** ROLLUP over status × priority; NULL grouping slots surfaced as 'ALL'
    * so both engines order identically (Spark sorts NULLS FIRST, DuckDB
    * NULLS LAST — the sentinel sidesteps the divergence). */
  val rollupOrders: QFn = (s, dir) =>
    t(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(dec(col("o_totalprice"), 18, 4)).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Predicate-combination filter over a lineitem⋈part join: range, IN,
    * LIKE, conjunction — all land in the parquet scan's PushedFilters. */
  val filterPredCombo: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_discount").between(0.03, 0.07) &&
        col("p_type").isin("PROMO", "ECONOMY") &&
        col("p_name").like("%red%") && col("l_quantity") < 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
        col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Computed projections: decimal arithmetic, CASE WHEN, date part. */
  val projExpr: QFn = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      dbl(dec(col("o_totalprice"), 18, 4) *
        lit(new java.math.BigDecimal("0.1"))).as("fee"),
      when(col("o_totalprice") > 300000, "BIG")
        .when(col("o_totalprice") > 100000, "MED")
        .otherwise("SMALL").as("bucket"),
      year(col("o_orderdate")).cast("long").as("oyear"))
      .orderBy(col("o_orderkey"))

  /** Left outer join with null extension: customers vs their big orders. */
  val joinLeftOuter: QFn = (s, dir) => {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_big"),
        coalesce(moneySum(dec(col("o_totalprice"), 18, 4)), lit(0.0))
          .as("sum_big"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join (EXISTS): customers with ≥1 urgent order. */
  val joinSemi: QFn = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti join (NOT EXISTS): customers with no F-status order. */
  val joinAnti: QFn = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Non-equi (theta/range) join: size-1 part pairs within a +5 price band.
    * Both sides are filtered small before the BroadcastNestedLoopJoin, which
    * is the only sane physical shape for a pure inequality join. */
  val joinThetaRange: QFn = (s, dir) => {
    val a = t(s, dir, "part").filter(col("p_size") === 1)
      .select(col("p_partkey").as("a_key"), col("p_retailprice").as("a_price"))
    val b = t(s, dir, "part").filter(col("p_size") === 1)
      .select(col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"))
    a.join(b,
      col("b_price") > col("a_price") &&
        col("b_price") <= col("a_price") + 5 && col("a_key") =!= col("b_key"))
      .select(col("a_key"), col("b_key"))
      .orderBy(col("a_key"), col("b_key"))
  }

  /** CUBE over the lineitem flags. */
  val cubeAgg: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dec(col("l_quantity"), 12, 2))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Explicit GROUPING SETS through the SQL surface (parquet.`path` scan). */
  val groupingSets: QFn = (s, dir) => s.sql(
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       |  count(1) AS n_orders
       |FROM parquet.`$dir/orders.parquet`
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |  (o_orderstatus), ())
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)

  /** min/max plus argmax (max_by with a unique struct tiebreaker) per type. */
  val aggMinMaxArgmax: QFn = (s, dir) =>
    t(s, dir, "part")
      .groupBy(col("p_type"))
      .agg(max(col("p_retailprice")).as("max_price"),
        min(col("p_retailprice")).as("min_price"),
        count(lit(1)).as("n_parts"),
        max_by(col("p_name"),
          struct(col("p_retailprice"), col("p_partkey"))).as("top_part"))
      .orderBy(col("p_type"))

  /** Pivot: order-status columns per priority (explicit pivot values keep
    * the output schema static — the only sane form at scale, since
    * value-discovery pivots need an extra pass over 100 TB). */
  val pivotStatus: QFn = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(moneySum(dec(col("o_totalprice"), 18, 4)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0.0)).as("sum_f"),
        coalesce(col("O"), lit(0.0)).as("sum_o"),
        coalesce(col("P"), lit(0.0)).as("sum_p"))
      .orderBy(col("o_orderpriority"))

  /** Exact percentiles (linear interpolation — same definition as DuckDB's
    * quantile_cont; identical sorted doubles → identical result, r6-rounded
    * for the interpolation arithmetic). */
  val aggPercentiles: QFn = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(r6(expr("percentile(o_totalprice, 0.5)")).as("median_price"),
        r6(expr("percentile(o_totalprice, 0.9)")).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Multi-key sort incl. a nullable key with explicit NULLS LAST. */
  val sortMultiKey: QFn = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        nullif(col("o_orderpriority"), lit("5-LOW")).as("prio_nn"))
      .orderBy(col("o_orderstatus").asc, col("prio_nn").asc_nulls_last,
        col("o_totalprice").desc, col("o_orderkey").asc)

  /** Hive-partitioned at-rest layout, end to end: write orders partitioned
    * by `o_orderstatus` to a scratch dir, read it back through partition
    * discovery with a partition predicate, and aggregate. The read plan
    * prunes to a single partition directory (`PartitionFilters`, asserted
    * in PlanSpec) and the partition column is directory metadata, not file
    * data. The oracle runs the same filter+agg on the raw table — layout
    * is an access-path property, not a semantic one. At 100 TB partition
    * pruning is the dominant scan optimization, so the contract exercises
    * the full write → discover → prune loop rather than leaving it to a
    * demo spec. */
  val partitionedScan: QFn = (s, dir) => {
    val scratch = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_scratch/orders_by_status_" + core.dirKey(dir))
      .getAbsolutePath
    t(s, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(scratch)
    s.read.parquet(scratch)
      .filter(col("o_orderstatus") === "O")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(dec(col("o_totalprice"), 18, 4)).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Zero-exchange fact-fact join via co-bucketed at-rest layout, end to
    * end: write orders and lineitem bucketed (8 buckets, sorted) on the
    * join key, join the two bucketed tables, and aggregate revenue per
    * order. Both sides arrive hash-distributed AND sorted on the key, so
    * the merge join runs with NO Exchange and NO Sort, and the per-order
    * aggregate reuses the same partitioning (grouping on a superset of
    * the bucket key) — asserted in PlanSpec. This is the 100 TB
    * big-table⋈big-table pattern: co-bucketing replaces the two largest
    * shuffles of the whole pipeline with a one-time layout cost amortized
    * over every downstream join. The `merge` hint pins the SMJ so the
    * plan shape is stable across sf (a broadcast would also be
    * exchange-free but demonstrates nothing about layout). Layout is an
    * access-path property, not a semantic one — the oracle runs the same
    * join+agg on the raw tables. */
  val bucketedJoin: QFn = (s, dir) => {
    val tag = core.dirKey(dir)
    val (ot, lt) = (s"orders_zb_$tag", s"lineitem_zb_$tag")
    // Layout is built ONCE per (session, fixture dir) and reused on every
    // subsequent invocation — the steady-state pattern this key exists to
    // demonstrate (a one-time bucketed write amortized over every
    // downstream join), and the honest bench accounting: the timed query
    // measures the exchange-free join, not a per-run rebuild. The tables
    // are external on a per-JVM scratch path (core.scratch), so a stale
    // path from a previous JVM can never alias into this catalog.
    if (!(s.catalog.tableExists(ot) && s.catalog.tableExists(lt))) {
      val root = scratch(dir, "bucketed")
      s.sql(s"DROP TABLE IF EXISTS $ot")
      s.sql(s"DROP TABLE IF EXISTS $lt")
      // Bucket only the columns the downstream join+agg consumes — the
      // materialized-join-view layout. At 100 TB you bucket a projected
      // fact subset, not the 16-column raw table; in the bench it cuts the
      // one-time write cost to the bytes that actually matter.
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite")
        .option("path", s"$root/orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite")
        .option("path", s"$root/lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
    }
    s.table(ot).hint("merge")
      .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        moneySum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Skew-mitigated big-join demonstration as a CONTRACT key — at 100 TB
    * a heavy-tailed join key is the #1 production incident class
    * (straggler tasks, executor OOM on one partition). A synthetic hot
    * key concentrates ~90% of lineitem onto k=0; the join runs through
    * operators/SkewJoin.saltedInner: the hot side scatters across 8 salt
    * buckets (deterministic per-row hash), the dim side replicates 8×,
    * and the join keys on (k, _salt) — per-task input is bounded by
    * |hot key| / 8 regardless of skew. The `merge` hint pins the
    * sort-merge path (a broadcast would sidestep the skew and
    * demonstrate nothing; the real use case is big⋈big where broadcast
    * is impossible). Salting is access path, not semantics: the oracle
    * runs the same join UNSALTED, and the salt column never escapes.
    * SkewJoinSpec asserts the plan shape (salted SMJ keys, replicated
    * dim, no broadcast). */
  val skewJoinSalted: QFn = (s, dir) => {
    val hot = when(pmod(col("l_orderkey"), lit(10)) < 9, 0L)
      .otherwise(pmod(col("l_orderkey"), lit(1000)) + 1)
    val left = t(s, dir, "lineitem")
      .select(hot.as("k"),
        revenue(col("l_extendedprice"), col("l_discount")).as("rev"))
    val dim = t(s, dir, "orders")
      .select((pmod(col("o_orderkey"), lit(1000)) + 1).as("k")).distinct()
      .union(s.range(1).select(lit(0L).as("k")))
      .withColumn("grp", pmod(col("k"), lit(7)))
      .hint("merge")
    graft.operators.SkewJoin.saltedInner(left, dim, "k", 8)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), moneySum(col("rev")).as("revenue"))
      .orderBy(col("grp"))
  }

  /** Bloom-prefiltered shuffle join — the runtime-filter / semi-join
    * reduction pattern, built from this library's own mergeable
    * Bloom aggregate (operators/BloomBitset) instead of relying on the
    * optimizer to inject one.
    *
    * The dim side (PROMO parts, ~20% of the part table) folds to an 8 KB
    * bitset via a partial+final ObjectHashAggregate; the bitset rides a
    * 1-row broadcast and the probe predicate — pure codegen'd built-ins
    * (pmod/shiftright/bitwiseAND over xxhash64) — drops non-matching fact
    * rows BEFORE the fact side's exchange, so at 100 TB the shuffle
    * volume tracks the ~20% match rate, not the fact size. The `merge`
    * hint pins the real join to SMJ precisely because a broadcastable dim
    * would hide what the bloom buys: with a broadcast join there is no
    * fact exchange to protect. False positives (≈0.4% at 3 hashes,
    * 16 bits/key) are swept out by the exact join, so the result — and
    * the oracle — is the plain join. */
  val bloomPrefilterJoin: QFn = (s, dir) => {
    val bits = 65536
    val dim = t(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_brand"))
    val bloom = dim.agg(
      graft.operators.BloomBitset.agg(bits)(col("p_partkey")).as("bf"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .crossJoin(broadcast(bloom))
      .filter(graft.operators.BloomBitset.mightContain(
        col("bf"), col("l_partkey"), bits))
      .drop("bf")
      .join(dim.hint("merge"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** Two-stage salted aggregation (r9) — skew_join_salted's sibling for
    * AGGREGATION hot keys. For plain algebraic aggregates Spark's
    * hash-aggregate already partial-combines map-side, so a hot group
    * never floods one reducer — but the moment a query needs a
    * non-combining per-group step (collect/exact-distinct state, an
    * ObjectHashAggregate past its fallback, a window over the hot key),
    * the production rewrite is: stage 1 groups on (key, salt) where salt
    * = hash(row-unique id) mod 16 — per-task state is bounded by
    * |hot group| / 16 — stage 2 re-reduces the 16 partials per key.
    * The rewrite is semantics-free exactly when the aggregate is
    * decomposable (count→sum, sum→sum, max→max, and the exact DECIMAL
    * money path is order-free by construction); this key certifies that
    * equivalence against the oracle's DIRECT single-stage groupBy, so
    * the pattern is pre-proven for when a 100 TB hot key forces it.
    * event_type is the deliberately skewed key (5 values over the whole
    * corpus — every group is a hot group). */
  val skewAggSalted: QFn = (s, dir) => {
    val partial = t(s, dir, "events")
      .select(col("event_type"), col("value"),
        pmod(xxhash64(col("event_id")), lit(16)).as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(dec(col("value"), 14, 4)).as("pv"),
        max(col("value")).as("pm"))
    partial.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"),
        dbl(sum(col("pv"))).as("sum_value"),
        max(col("pm")).as("max_value"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, QFn] = Map(
    "skew_agg_salted"     -> skewAggSalted,
    "bloom_prefilter_join" -> bloomPrefilterJoin,
    "skew_join_salted"    -> skewJoinSalted,
    "bucketed_join"       -> bucketedJoin,
    "partitioned_scan"    -> partitionedScan,
    "scan_lineitem"       -> scanLineitem,
    "q01_pricing_summary" -> q01,
    "q03_topk_revenue"    -> q03,
    "q05_region_join"     -> q05,
    "q06_filter_agg"      -> q06,
    "qrollup_orders"      -> rollupOrders,
    "filter_pred_combo"   -> filterPredCombo,
    "proj_expr"           -> projExpr,
    "join_left_outer"     -> joinLeftOuter,
    "join_semi"           -> joinSemi,
    "join_anti"           -> joinAnti,
    "join_theta_range"    -> joinThetaRange,
    "cube_agg"            -> cubeAgg,
    "grouping_sets"       -> groupingSets,
    "agg_minmax_argmax"   -> aggMinMaxArgmax,
    "pivot_status"        -> pivotStatus,
    "agg_percentiles"     -> aggPercentiles,
    "sort_multi_key"      -> sortMultiKey)

  val oracle: Map[String, String] = Map(
    // The DIRECT single-stage groupBy — salting is access path, not
    // semantics, so the oracle never sees a salt column.
    "skew_agg_salted" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The bloom prefilter is access path, not semantics: false positives
    // are removed by the exact join, so the oracle is the plain join.
    "bloom_prefilter_join" ->
      s"""SELECT p_brand, count(*) AS n_items,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_type = 'PROMO'
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    // Salting is access path, not semantics: the oracle joins UNSALTED.
    "skew_join_salted" ->
      s"""WITH l AS (
         |  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
         |              ELSE l_orderkey % 1000 + 1 END AS k,
         |    $revenueSql AS rev
         |  FROM lineitem),
         |d AS (
         |  SELECT DISTINCT o_orderkey % 1000 + 1 AS k FROM orders
         |  UNION SELECT 0),
         |g AS (SELECT k, k % 7 AS grp FROM d)
         |SELECT grp, count(*) AS n,
         |  CAST(round(sum(rev), 2) AS DOUBLE) AS revenue
         |FROM l JOIN g USING (k)
         |GROUP BY grp ORDER BY grp""".stripMargin,
    "bucketed_join" ->
      s"""SELECT o_orderkey, o_orderpriority, count(*) AS n_lines,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderkey, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "partitioned_scan" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |    AS total_price
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "scan_lineitem" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(sum($revenueSql * (1 + CAST(l_tax AS DECIMAL(9,4)))), 2) AS DOUBLE) AS sum_charge,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
         |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) / count(*) AS avg_price,
         |  CAST(sum(CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) / count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_topk_revenue" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-06-30'
         |  AND l_shipdate > TIMESTAMP '1996-06-30'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q05_region_join" ->
      s"""SELECT n_name, CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
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
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |  CAST(l_discount AS DECIMAL(9,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "qrollup_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "filter_pred_combo" ->
      """SELECT l_orderkey, l_linenumber, p_name, l_discount
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_discount BETWEEN 0.03 AND 0.07
        |  AND p_type IN ('PROMO', 'ECONOMY')
        |  AND p_name LIKE '%red%' AND l_quantity < 30
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "proj_expr" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 0.1 AS DOUBLE) AS fee,
        |  CASE WHEN o_totalprice > 300000 THEN 'BIG'
        |       WHEN o_totalprice > 100000 THEN 'MED'
        |       ELSE 'SMALL' END AS bucket,
        |  CAST(year(o_orderdate) AS BIGINT) AS oyear
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big,
        |  coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE),
        |    0.0) AS sum_big
        |FROM customer LEFT JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "join_theta_range" ->
      """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key
        |FROM part a JOIN part b
        |  ON b.p_retailprice > a.p_retailprice
        | AND b.p_retailprice <= a.p_retailprice + 5
        | AND a.p_partkey <> b.p_partkey
        |WHERE a.p_size = 1 AND b.p_size = 1
        |ORDER BY a_key, b_key""".stripMargin,
    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |  coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(1) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "agg_minmax_argmax" ->
      """SELECT a.p_type, a.max_price, a.min_price, a.n_parts,
        |  r.p_name AS top_part
        |FROM (SELECT p_type, max(p_retailprice) AS max_price,
        |        min(p_retailprice) AS min_price, count(*) AS n_parts
        |      FROM part GROUP BY p_type) a
        |JOIN (SELECT p_type, p_name FROM
        |        (SELECT p_type, p_name, row_number() OVER (
        |           PARTITION BY p_type
        |           ORDER BY p_retailprice DESC, p_partkey DESC) AS rn
        |         FROM part) WHERE rn = 1) r
        |  USING (p_type)
        |ORDER BY p_type""".stripMargin,
    "pivot_status" ->
      """SELECT o_orderpriority,
        |  coalesce(CAST(round(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE),
        |    0.0) AS sum_f,
        |  coalesce(CAST(round(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE),
        |    0.0) AS sum_o,
        |  coalesce(CAST(round(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(18,4)) END), 2) AS DOUBLE),
        |    0.0) AS sum_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_percentiles" ->
      """SELECT o_orderstatus,
        |  floor((quantile_cont(o_totalprice, 0.5)) * 1000000 + 0.5)
        |    / 1000000 AS median_price,
        |  floor((quantile_cont(o_totalprice, 0.9)) * 1000000 + 0.5)
        |    / 1000000 AS p90_price,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "sort_multi_key" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  nullif(o_orderpriority, '5-LOW') AS prio_nn
        |FROM orders
        |ORDER BY o_orderstatus ASC, prio_nn ASC NULLS LAST,
        |  o_totalprice DESC, o_orderkey ASC""".stripMargin)
}
