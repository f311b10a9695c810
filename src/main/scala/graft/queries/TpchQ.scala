package graft.queries

import org.apache.spark.sql.functions._
import core._

/** The wide-TPC-H family (SURVEY.md §2.14): the analytical join/agg shapes
  * the earlier q01/q03/q04/q05/q06/q18/q21 set did not cover, each picked
  * for the DISTINCT optimizer pattern it exercises at 100 TB:
  *
  *   - q07: fact ⋈ two independent dimension chains + cross-nation
  *     disjunction — dims broadcast, ONE fact shuffle, per-year split.
  *   - q10: returned-item revenue — selective fact filter, mid-size
  *     customer join, global top-20 (TakeOrderedAndProject, no full sort).
  *   - q14: promo revenue share — both conditional decimal sums in ONE
  *     pass over the join (no numerator/denominator self-join).
  *   - q15: top supplier by quarterly revenue — the per-supplier aggregate
  *     reused as both the ranking input and the max side, equality-joined
  *     on the exact cents-rounded revenue.
  *   - q17: small-quantity parts — the per-part avg is a decorrelated
  *     aggregate joined back to the same filtered fact (TPC-H's correlated
  *     scalar subquery, in the shape Catalyst actually executes), with the
  *     tiny part filter broadcast to both sides.
  *   - q19: disjunctive brand/size/quantity predicates — an OR of
  *     conjunctions as the residual filter of a broadcast hash join, with
  *     the common quantity range conjunct pushed to the parquet scan.
  *   - q22: customers above the positive-balance average with no orders —
  *     broadcast scalar threshold + LEFT ANTI join against the fact.
  *
  *   - q08: national market share — the deepest join tree in the suite
  *     (fact ⋈ part ⋈ orders ⋈ customer→nation→region ⋈ supplier→nation),
  *     every dimension chain pre-collapsed and broadcast so the fact
  *     still shuffles ONCE, share as two conditional sums in one pass.
  *   - q13: customer order-count distribution — LEFT OUTER with an
  *     ON-clause filter (zero-order customers must survive), then a
  *     re-aggregation of the aggregate; the per-customer count reuses
  *     the join's hash partitioning (one exchange total).
  *
  * The corpus lacks partsupp/shipmode/container/phone, so q02/q09/q11/
  * q12/q16/q20 cannot be reproduced verbatim; since round 9 they exist
  * as ADAPTED variants (suffixed names below) that substitute a
  * lineitem-derived supply relation / p_retailprice cost / ship-order
  * date lag for the missing partsupp columns while preserving each
  * query's DISTINCTIVE optimizer pattern — correlated-min join-back
  * (q02), widest profit-expression join tree (q09), HAVING-vs-scalar-
  * subquery double aggregate (q11), conditional class counts on a
  * computed column (q12), distinct-count with an exclusion anti-join
  * (q16), nested-aggregate semi-join chain (q20). q17/q22/q13
  * substitute p_type / c_nationkey / o_orderpriority for container /
  * phone-prefix / the o_comment NOT-LIKE predicate. The plan shapes
  * (and what they prove about the optimizer) are unchanged.
  * Determinism follows core.scala: decimal-before-sum, moneySum cents
  * rounding, r6 on computed doubles, total ORDER BY with unique
  * tiebreakers.
  */
object TpchQ {

  /** Q7 volume shipping: revenue between NATION_1 and NATION_2 (both
    * directions) by ship year. supplier/customer arrive pre-joined to
    * their broadcast nation names; lineitem shuffles once on l_orderkey. */
  val q07: QFn = (s, dir) => {
    val sn = t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cn = t(s, dir, "customer")
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cn), col("o_custkey") === col("c_custkey"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(moneySum(revenue(col("l_extendedprice"), col("l_discount")))
        .as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8 national market share: NATION_1's share of STANDARD-part revenue
    * delivered into ASIA customers, by order year. Every dimension chain
    * (part filter; supplier→nation names; customer→nation→region filter)
    * collapses to a narrow broadcast side BEFORE touching the fact, so
    * lineitem shuffles exactly once (on l_orderkey for the orders join);
    * numerator and denominator are conditional decimal sums in the same
    * single aggregation pass — no share self-join. */
  val q08: QFn = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"))
    val sn = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cr = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("c_custkey"))
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cr), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_1", rev).otherwise(lit(0)))
          .as("num"),
        sum(rev).as("den"))
      .select(col("o_year"),
        r6(dbl(col("num")) / dbl(col("den"))).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q13 customer order-count distribution: LEFT OUTER join with the
    * filter in the ON clause (customers with zero qualifying orders must
    * appear with c_count = 0 — a WHERE would drop them), per-customer
    * count(o_orderkey) ignoring the null-extended rows, then the
    * distribution of those counts. The per-customer aggregate groups on
    * the join key, so it reuses the join's hash partitioning — one
    * exchange over orders total; the second aggregate runs on ≤|distinct
    * counts| rows. o_orderpriority stands in for the reference's
    * o_comment NOT-LIKE predicate (no o_comment in the corpus). */
  val q13: QFn = (s, dir) => {
    t(s, dir, "customer").select(col("c_custkey"))
      .join(t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q10 returned items: revenue lost to returns per customer in one
    * quarter, global top 20 — TakeOrderedAndProject, not a full sort. */
  val q10: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1996-04-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(moneySum(revenue(col("l_extendedprice"), col("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Q14 promo revenue share for one month: numerator and denominator as
    * two conditional sums of the SAME exact-decimal term in one pass. */
  val q14: QFn = (s, dir) => {
    val rev = revenue(col("l_extendedprice"), col("l_discount"))
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-03-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).as("num"),
        sum(rev).as("den"))
      .select(r6(lit(100) * dbl(col("num")) / dbl(col("den")))
        .as("promo_revenue"))
  }

  /** Q15 top supplier: quarterly revenue per supplier, keep the max.
    * The aggregate is computed once and self-joined on its exact
    * cents-rounded revenue — the equality is on identical doubles by
    * construction, so the "ties allowed" TPC-H semantics carry over. */
  val q15: QFn = (s, dir) => {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(moneySum(revenue(col("l_extendedprice"), col("l_discount")))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("total_revenue"))
    t(s, dir, "supplier")
      .join(rev.join(broadcast(mx), Seq("total_revenue")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 small-quantity revenue: lineitems under 20% of their part's
    * average quantity, for one brand+type slice — the correlated scalar
    * subquery in decorrelated form (per-part agg joined back), part
    * filter broadcast to both the fact scan and the agg. */
  val q17: QFn = (s, dir) => {
    val p = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val lp = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val av = lp.groupBy(col("l_partkey"))
      .agg((dbl(sum(dec(col("l_quantity"), 12, 2))) / count(lit(1)))
        .as("avg_qty"))
    lp.join(av, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(coalesce(moneySum(dec(col("l_extendedprice"), 18, 4)), lit(0.0))
        .as("loss"))
      .select(r6(col("loss") / lit(7.0)).as("avg_yearly"))
  }

  /** Q19 discounted revenue under an OR of brand/size/quantity
    * conjunctions: the disjunction rides the broadcast hash join as a
    * residual filter; the common `l_quantity <= 30` bound is a separate
    * conjunct Catalyst pushes into the parquet scan. */
  val q19: QFn = (s, dir) => {
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(coalesce(moneySum(revenue(col("l_extendedprice"), col("l_discount"))),
        lit(0.0)).as("revenue"))
  }

  /** Q22 global sales opportunity: customers in 5 nations with balance
    * above the positive-balance average of those nations AND no orders —
    * broadcast one-row threshold, then LEFT ANTI against orders (the
    * NOT-EXISTS plan), grouped per nation. */
  val q22: QFn = (s, dir) => {
    val nats = Seq(1, 3, 5, 7, 9).map(_.toLong)
    val c = t(s, dir, "customer").filter(col("c_nationkey").isin(nats: _*))
    val thr = c.filter(col("c_acctbal") > 0)
      .agg((dbl(sum(dec(col("c_acctbal"), 14, 2))) / count(lit(1))).as("thr"))
    c.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(t(s, dir, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        moneySum(dec(col("c_acctbal"), 14, 2)).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Q2 adapted — min-cost supplier per part in a region. The missing
    * partsupp relation is DERIVED: per (part, supplier) the minimum
    * observed unit price from lineitem (double division is
    * IEEE-identical on both engines; min is order-free, so the derived
    * cost is bit-exact). The signature Q2 pattern survives intact: the
    * per-part MIN computed over the region-filtered supply and
    * equality-joined back to the same relation (the correlated scalar
    * subquery, decorrelated), with supplier→nation→region collapsed to
    * a broadcast before touching the fact-derived supply. Top-100 by
    * account balance is TakeOrderedAndProject, not a full sort. */
  val q02: QFn = (s, dir) => {
    val eu = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val p = t(s, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size").between(1, 10))
      .select(col("p_partkey"))
    // Both key filters are BELOW the aggregation (they cut on grouping
    // keys, so the per-group min is unchanged): at 100 TB this
    // aggregates the ~0.4% qualifying slice of the fact, not all of it.
    val sup2 = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val mc = sup2.groupBy(col("l_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
    sup2.join(mc, Seq("l_partkey"))
      .filter(col("unit_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }

  /** Q9 adapted — product-line profit by supplier nation and order
    * year. ps_supplycost·qty is replaced by 0.5·p_retailprice·qty (an
    * exact DECIMAL product chain, so the profit sum stays
    * order-independent); the defining Q9 shape is untouched: the
    * widest profit expression in the suite (lineitem ⋈ part[name LIKE]
    * ⋈ supplier→nation ⋈ orders), every dimension broadcast, ONE fact
    * shuffle (the orders join), nation×year rollup ordered year-desc. */
  val q09: QFn = (s, dir) => {
    val amount = revenue(col("l_extendedprice"), col("l_discount")) -
      dec(col("p_retailprice"), 12, 2) * dec(col("l_quantity"), 12, 2) *
        dec(lit(0.5), 2, 1)
    val p = t(s, dir, "part").filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(moneySum(amount).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 adapted — part-value concentration: parts whose revenue
    * through one nation's suppliers exceeds TWICE THE MEAN per-part
    * value (TPC-H's fixed 0.0001/SF fraction has no analogue without a
    * known SF, and a fixed fraction of total goes empty as the part
    * count grows — 2×mean is scale-free: ~1% of parts at every tier).
    * partsupp value is replaced by lineitem revenue through NATION_3
    * suppliers; the Q11 signature — the SAME relation aggregated
    * twice, once per-part and once globally, with the global scalar
    * broadcast into a HAVING-style filter — is intact. The comparison
    * value·n > 2·total runs entirely in bounded exact DECIMAL (never
    * double, never a division), so the cut is engine-identical; the
    * (24,2)/(12,0) casts hold to 10²² money units / 10¹² parts. */
  val q11: QFn = (s, dir) => {
    val sn = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .select(col("s_suppkey"))
    val lv = t(s, dir, "lineitem")
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"),
        revenue(col("l_extendedprice"), col("l_discount")).as("v"))
    val pv = lv.groupBy(col("l_partkey"))
      .agg(dec(round(sum(col("v")), 2), 18, 2).as("vr"))
    val thr = pv.agg(dec(sum(col("vr")), 24, 2).as("tot"),
      dec(count(lit(1)), 12, 0).as("np"))
    pv.crossJoin(broadcast(thr))
      .filter(col("vr") * col("np") > col("tot") * dec(lit(2), 1, 0))
      .select(col("l_partkey").as("p_partkey"), dbl(col("vr")).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** Q12 adapted — shipping-delay class vs order priority. l_shipmode
    * and the commit/receipt dates don't exist, so the class is the
    * computed ship−order day lag (fast ≤30 < medium ≤90 < slow) over
    * one ship year, and the two conditional counts (URGENT/HIGH vs
    * rest) ride the single orders join exactly as Q12's
    * high/low_line_count do. The lag is integer day arithmetic —
    * engine-identical by construction. */
  val q12: QFn = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("lag_days",
        datediff(col("l_shipdate"), col("o_orderdate")))
      .withColumn("delay_class",
        when(col("lag_days") <= 30, "fast")
          .when(col("lag_days") <= 90, "medium")
          .otherwise("slow"))
      .groupBy(col("delay_class"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("delay_class"))

  /** Q16 adapted — supplier variety per part attribute triple:
    * distinct suppliers observed shipping each (brand, type, size)
    * combo, excluding one brand, one type, a size whitelist, and a
    * supplier denylist (negative balance stands in for the
    * complaints-comment NOT IN). The Q16 essentials — a distinct-count
    * over a many-to-many pair relation with a broadcast ANTI join
    * doing the NOT IN — are intact; the pair relation is derived from
    * lineitem instead of partsupp. */
  val q16: QFn = (s, dir) => {
    val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20 adapted — suppliers with concentrated recent shipments:
    * Asian suppliers for whom some small-part's 1996 shipped quantity
    * exceeds half their all-time shipments of that part (availqty >
    * 0.5·shipped becomes qty96 > 0.5·qty_all, both exact DECIMAL sums
    * from ONE aggregation pass — doubling the left side keeps the
    * comparison integer-exact). The Q20 chain shape survives: inner
    * nested aggregate → qualifying-pair set → LEFT SEMI into supplier
    * ⋈ broadcast nation/region filter. */
  val q20: QFn = (s, dir) => {
    val p = t(s, dir, "part").filter(col("p_name").like("small%"))
      .select(col("p_partkey"))
    val qual = t(s, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1996,
          dec(col("l_quantity"), 12, 2)).otherwise(lit(0)))
          .as("qty96"),
        sum(dec(col("l_quantity"), 12, 2)).as("qty_all"))
      .filter(col("qty96") * lit(2) > col("qty_all"))
      .select(col("l_suppkey"))
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, QFn] = Map(
    "q02_min_cost_supp"   -> q02,
    "q09_profit_nation"   -> q09,
    "q11_part_value_conc" -> q11,
    "q12_ship_delay_prio" -> q12,
    "q16_supplier_variety" -> q16,
    "q20_excess_shippers" -> q20,
    "q07_volume_shipping" -> q07,
    "q08_market_share"    -> q08,
    "q13_cust_distribution" -> q13,
    "q10_returned_items"  -> q10,
    "q14_promo_share"     -> q14,
    "q15_top_supplier"    -> q15,
    "q17_small_qty"       -> q17,
    "q19_disjunct_rev"    -> q19,
    "q22_no_order_cust"   -> q22)

  val oracle: Map[String, String] = Map(
    "q02_min_cost_supp" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |sup2 AS (
        |  SELECT l_partkey, unit_cost, s_suppkey, s_name, s_acctbal, n_name
        |  FROM supply
        |  JOIN eu ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'LARGE' AND p_size BETWEEN 1 AND 10),
        |mc AS (
        |  SELECT l_partkey, min(unit_cost) AS min_cost
        |  FROM sup2 GROUP BY l_partkey)
        |SELECT s_acctbal, s_name, n_name, sup2.l_partkey AS p_partkey,
        |  unit_cost
        |FROM sup2 JOIN mc ON sup2.l_partkey = mc.l_partkey
        |WHERE unit_cost = min_cost
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q09_profit_nation" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(round(sum($revenueSql
         |    - CAST(p_retailprice AS DECIMAL(12,2))
         |      * CAST(l_quantity AS DECIMAL(12,2))
         |      * CAST(0.5 AS DECIMAL(2,1))), 2) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN orders ON l_orderkey = o_orderkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q11_part_value_conc" ->
      s"""WITH lv AS (
         |  SELECT l_partkey, $revenueSql AS v
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'),
         |pv AS (
         |  SELECT l_partkey, CAST(round(sum(v), 2) AS DECIMAL(18,2)) AS vr
         |  FROM lv GROUP BY l_partkey),
         |thr AS (
         |  SELECT CAST(sum(vr) AS DECIMAL(24,2)) AS tot,
         |    CAST(count(*) AS DECIMAL(12,0)) AS np
         |  FROM pv)
         |SELECT l_partkey AS p_partkey, CAST(vr AS DOUBLE) AS value
         |FROM pv, thr
         |WHERE vr * np > tot * CAST(2 AS DECIMAL(1,0))
         |ORDER BY value DESC, p_partkey""".stripMargin,
    "q12_ship_delay_prio" ->
      """WITH l AS (
        |  SELECT datediff('day', o_orderdate, l_shipdate) AS lag_days,
        |    o_orderpriority
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01')
        |SELECT CASE WHEN lag_days <= 30 THEN 'fast'
        |            WHEN lag_days <= 90 THEN 'medium'
        |            ELSE 'slow' END AS delay_class,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM l GROUP BY delay_class ORDER BY delay_class""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess_shippers" ->
      """WITH qual AS (
        |  SELECT l_suppkey
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_partkey, l_suppkey
        |  HAVING sum(CASE WHEN year(l_shipdate) = 1996
        |      THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END) * 2
        |    > sum(CAST(l_quantity AS DECIMAL(12,2))))
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN (SELECT l_suppkey FROM qual)
        |ORDER BY s_suppkey""".stripMargin,
    "q07_volume_shipping" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q08_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${r6Sql(
             s"CAST(sum(CASE WHEN sn.n_name = 'NATION_1' THEN $revenueSql" +
             s" ELSE 0 END) AS DOUBLE) / CAST(sum($revenueSql) AS DOUBLE)")}
         |    AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_cust_distribution" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
         |  CAST(round(sum($revenueSql), 2) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      s"""SELECT ${r6Sql(
           s"100 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueSql ELSE 0 END) AS DOUBLE)" +
           s" / CAST(sum($revenueSql) AS DOUBLE)")} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    CAST(round(sum($revenueSql), 2) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty" ->
      """WITH lp AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
        |av AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |      / count(*) AS avg_qty
        |  FROM lp GROUP BY l_partkey)
        |SELECT floor((coalesce(CAST(round(sum(
        |    CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE), 0.0)
        |  / 7.0) * 1000000 + 0.5) / 1000000 AS avg_yearly
        |FROM lp JOIN av USING (l_partkey)
        |WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,
    "q19_disjunct_rev" ->
      s"""SELECT coalesce(CAST(round(sum($revenueSql), 2) AS DOUBLE), 0.0)
         |  AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
         |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q22_no_order_cust" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
        |      / count(*)
        |    FROM customer
        |    WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
}
