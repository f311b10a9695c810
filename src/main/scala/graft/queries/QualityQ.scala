package graft.queries

import org.apache.spark.sql.functions._
import core._

/** Data-quality expectation operators (SURVEY.md §2.18) — the
  * constraint-checking layer a production pipeline runs before
  * publishing a 100 TB table (the Deequ/dbt-test shape, expressed as
  * plain aggregates):
  *
  *   - `dq_profile`: per-column completeness + cardinality profile of
  *     orders in ONE scan — null counts and exact distinct counts per
  *     column plus numeric min/max. Multiple COUNT(DISTINCT)s plan via
  *     Expand + partial aggregation (one shuffle); at 100 TB the exact
  *     distincts swap for approx_count_distinct with the same plan
  *     shape (the `approx_distinct` key covers that tier).
  *   - `dq_referential`: foreign-key orphan counts via LEFT ANTI joins
  *     (lineitem→orders, orders→customer) — each anti join is one
  *     keyed shuffle; a healthy corpus yields zeros, and the key
  *     reports the COUNT so a violation is a number, not a crash.
  *   - `dq_uniqueness`: candidate-key duplicate audit across three
  *     tables (orders.o_orderkey, events.event_id, documents.doc_id):
  *     rows vs distinct keys vs rows-in-duplicate-groups, unioned into
  *     one report.
  */
object QualityQ {

  val dqProfile: QFn = (s, dir) => {
    // count(CASE WHEN … THEN 1 END) rather than sum(1/0): DuckDB's
    // integer sum returns HUGEINT (pandas object), count stays BIGINT.
    def nulls(c: String) = count(when(col(c).isNull, 1))
    t(s, dir, "orders").agg(
      count(lit(1)).as("n_rows"),
      nulls("o_orderkey").as("key_nulls"),
      countDistinct(col("o_orderkey")).as("key_distinct"),
      nulls("o_custkey").as("cust_nulls"),
      countDistinct(col("o_custkey")).as("cust_distinct"),
      nulls("o_orderpriority").as("prio_nulls"),
      countDistinct(col("o_orderpriority")).as("prio_distinct"),
      min(col("o_totalprice")).as("price_min"),
      max(col("o_totalprice")).as("price_max"),
      nulls("o_totalprice").as("price_nulls"))
  }

  val dqReferential: QFn = (s, dir) => {
    val orphanLines = t(s, dir, "lineitem").select(col("l_orderkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_lineitem"))
    val orphanOrders = t(s, dir, "orders").select(col("o_custkey"))
      .join(t(s, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_order"))
    orphanLines.crossJoin(orphanOrders)
  }

  val dqUniqueness: QFn = (s, dir) => {
    def audit(table: String, key: String) =
      t(s, dir, table).groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_rows"))
        .select(lit(table).as("tbl"), col("n_rows"), col("n_keys"),
          col("n_dup_rows"))
    audit("orders", "o_orderkey")
      .unionAll(audit("events", "event_id"))
      .unionAll(audit("documents", "doc_id"))
      .orderBy(col("tbl"))
  }

  val queries: Map[String, QFn] = Map(
    "dq_profile"     -> dqProfile,
    "dq_referential" -> dqReferential,
    "dq_uniqueness"  -> dqUniqueness)

  val oracle: Map[String, String] = Map(
    "dq_profile" ->
      """SELECT count(*) AS n_rows,
        |  count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS key_nulls,
        |  count(DISTINCT o_orderkey) AS key_distinct,
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END) AS cust_nulls,
        |  count(DISTINCT o_custkey) AS cust_distinct,
        |  count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS prio_nulls,
        |  count(DISTINCT o_orderpriority) AS prio_distinct,
        |  min(o_totalprice) AS price_min, max(o_totalprice) AS price_max,
        |  count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS price_nulls
        |FROM orders""".stripMargin,
    "dq_referential" ->
      // NOT EXISTS (correlated equality), not NOT IN: on data with NULL FK
      // values — exactly what a referential check exists to catch — NOT IN
      // returns UNKNOWN and silently drops the row, while the Spark side's
      // LEFT ANTI join counts null-key rows as orphans. NOT EXISTS matches
      // the anti-join semantics on both engines unconditionally.
      """SELECT
        |  (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_orphan_lineitem,
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey))
        |    AS n_orphan_order""".stripMargin,
    "dq_uniqueness" ->
      """SELECT * FROM (
        |  SELECT 'orders' AS tbl, CAST(sum(c) AS BIGINT) AS n_rows,
        |    count(*) AS n_keys,
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |      AS n_dup_rows
        |  FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'events', CAST(sum(c) AS BIGINT), count(*),
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |  FROM (SELECT event_id, count(*) AS c FROM events GROUP BY 1)
        |  UNION ALL
        |  SELECT 'documents', CAST(sum(c) AS BIGINT), count(*),
        |    CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |  FROM (SELECT doc_id, count(*) AS c FROM documents GROUP BY 1))
        |ORDER BY tbl""".stripMargin)
}
