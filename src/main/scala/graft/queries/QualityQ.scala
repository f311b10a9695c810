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

  /** Embedding-table expectations (r5) — the DQ layer for the vector
    * side: per label, dimension uniformity (min = max = the model's
    * output width), zero-vector and NaN/null-element counts, and the
    * mean L2 norm (collapsed or exploded norms flag a bad encoder run).
    *
    * Determinism: each norm is sqrt (correctly rounded IEEE) of a
    * SEQUENTIAL array fold (both engines left-fold — the quantize_embed
    * precedent), then pinned to an exact nano-scaled LONG via the r6
    * floor formula at 9 digits; the cross-row mean sums those integers
    * exactly and divides once under r6. No decimal casts anywhere.
    * One label-keyed groupBy — a single shuffle at any scale. */
  val dqEmbeddings: QFn = (s, dir) => {
    val x = transform(col("embedding"), e => e.cast("double"))
    val sq = aggregate(transform(col("x"), e => e * e),
      lit(0.0), (a, b) => a + b)
    t(s, dir, "embeddings")
      .select(col("label"), x.as("x"))
      .withColumn("dim", size(col("x")).cast("long"))
      .withColumn("norm", sqrt(sq))
      .withColumn("norm_nano", floor(col("norm") * 1e9 + 0.5).cast("long"))
      .withColumn("has_bad",
        exists(col("x"), e => e.isNull || isnan(e)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dim")).as("dim_min"), max(col("dim")).as("dim_max"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("has_bad"), 1L).otherwise(0L)).as("n_bad"),
        r6(dbl(sum(col("norm_nano"))) / (lit(1e9) * count(lit(1))))
          .as("mean_norm"))
      .orderBy(col("label"))
  }

  /** k-anonymity re-identification audit (r9) — the privacy gate a
    * curated release runs AFTER pii_scrub: even with direct
    * identifiers gone, a record whose quasi-identifier combination
    * (here event_type × day × value decade band) is unique or
    * near-unique re-identifies its subject by linkage (Sweeney 2002,
    * public model). The audit groups records into QI equivalence
    * classes and reports, per class-size band (1 = unique, 2-4 = below
    * the classic k=5, 5-9, 10+), the class and record counts plus the
    * record share — the release decision is "suppress or generalize
    * every band below k". NULL value is its own band (-1) — nulls
    * linker-match each other. Two aggregations, both keyed (QI, then
    * band); the banding is a codegen'd CASE chain; floor(value/10) is
    * IEEE-identical double arithmetic on both engines. At 100 TB the
    * QI groupBy is one shuffle and the band rollup runs on ≤|classes|
    * rows. */
  val dqKAnonymity: QFn = (s, dir) => {
    val classes = t(s, dir, "events")
      .select(col("event_type"),
        expr("ts_us div 86400000000").as("day"),
        when(col("value").isNull, lit(-1L))
          .otherwise(floor(col("value") / 10.0).cast("long")).as("band"))
      .groupBy(col("event_type"), col("day"), col("band"))
      .agg(count(lit(1)).as("k"))
    classes
      .select(col("k"),
        when(col("k") === 1, "1_unique")
          .when(col("k") <= 4, "2_k_lt5")
          .when(col("k") <= 9, "3_k_5_9")
          .otherwise("4_k_10plus").as("size_band"))
      .groupBy(col("size_band"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_records"))
      .withColumn("record_share",
        r6(dbl(col("n_records")) /
          dbl(sum(col("n_records")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()))))
      .orderBy(col("size_band"))
  }

  /** Benford first-digit audit (r9) — the forensic fabricated-data test
    * (Benford 1938, public law): the leading significant digit of
    * organically-grown magnitudes follows P(d) = log10(1 + 1/d), and a
    * flat or spiked digit histogram flags synthetic, truncated, or
    * hand-entered numbers (the fraud-audit staple). Run over
    * l_extendedprice: per digit 1-9, observed count/share vs the Benford
    * expectation and the absolute deviation — the release decision reads
    * the deviation column (this synthetic corpus deviates, which is
    * exactly what the audit should say about it).
    *
    * Determinism: the digit comes from exact integer cents
    * (floor(price·100 + 0.5), plain double ops, identical on both
    * engines) rendered as a string — no logs, no float compares; the
    * expected shares are pinned 12-digit literals (identical parses),
    * and share/deviation are single mirrored double expressions over
    * exact ints. One digit-keyed groupBy shuffle (9 groups) at any
    * corpus size; the share window runs over the 9-row aggregate. */
  val benfordAudit: QFn = (s, dir) => {
    val expected = Seq(
      1 -> 0.301029995664, 2 -> 0.176091259056, 3 -> 0.124938736608,
      4 -> 0.096910013008, 5 -> 0.079181246048, 6 -> 0.066946789631,
      7 -> 0.057991946978, 8 -> 0.051152522447, 9 -> 0.045757490561)
    val exp = expected.foldLeft(lit(0.0)) { case (acc, (d, p)) =>
      when(col("digit") === d, lit(p)).otherwise(acc) }
    t(s, dir, "lineitem")
      .select(substring(floor(col("l_extendedprice") * 100 + 0.5)
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", dbl(col("n")) /
        dbl(sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy())))
      .select(col("digit"), col("n"), r6(col("share")).as("share"),
        exp.as("expected"),
        r6(abs(col("share") - exp)).as("abs_dev"))
      .orderBy(col("digit"))
  }

  /** Freshness / staleness audit (r9) — the SLA check a table's consumers
    * run before trusting it (the "is yesterday's partition here yet"
    * gate): per event type, row count, the latest event's epoch-µs, the
    * whole-hour lag behind the globally freshest event (exact integer
    * division — no float time math), the row count inside the last 24 h
    * of stream time, and a stale flag at the classic 24 h threshold.
    * The global high-water mark is a 1-row aggregate broadcast
    * (PlanSweep-allowlisted) crossed back into the scan, so the audit is
    * one pass + one type-keyed shuffle at any corpus size. */
  val dqFreshness: QFn = (s, dir) => {
    val g = t(s, dir, "events").agg(max(col("ts_us")).as("g"))
    t(s, dir, "events")
      .select(col("event_type"), col("ts_us"))
      .crossJoin(broadcast(g))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        max(col("ts_us")).as("max_ts_us"),
        max(col("g")).as("g"),
        sum(when(col("ts_us") > col("g") - 86400000000L, 1L).otherwise(0L))
          .as("n_last24h"))
      // exact whole-hour lag: integer µs division, no float time math
      .withColumn("lag_hours",
        expr("(g - max_ts_us) div 3600000000"))
      .withColumn("stale",
        when(col("lag_hours") >= 24, 1L).otherwise(0L))
      .select(col("event_type"), col("n_rows"), col("max_ts_us"),
        col("lag_hours"), col("n_last24h"), col("stale"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, QFn] = Map(
    "benford_audit"  -> benfordAudit,
    "dq_freshness"   -> dqFreshness,
    "dq_k_anonymity" -> dqKAnonymity,
    "dq_embeddings"  -> dqEmbeddings,
    "dq_profile"     -> dqProfile,
    "dq_referential" -> dqReferential,
    "dq_uniqueness"  -> dqUniqueness)

  private def benfordSql: String = {
    val expCase = Seq(
      1 -> "0.301029995664", 2 -> "0.176091259056", 3 -> "0.124938736608",
      4 -> "0.096910013008", 5 -> "0.079181246048", 6 -> "0.066946789631",
      7 -> "0.057991946978", 8 -> "0.051152522447", 9 -> "0.045757490561")
      .map { case (d, p) => s"WHEN digit = $d THEN $p" }
      .mkString("CASE ", " ", " ELSE 0.0 END")
    s"""WITH digits AS (
       |  SELECT CAST(left(CAST(CAST(floor(l_extendedprice * 100 + 0.5)
       |    AS BIGINT) AS VARCHAR), 1) AS BIGINT) AS digit
       |  FROM lineitem),
       |g AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
       |sh AS (SELECT digit, n,
       |    CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share,
       |    CAST($expCase AS DOUBLE) AS expected
       |  FROM g)
       |SELECT digit, n, ${r6Sql("share")} AS share, expected,
       |  ${r6Sql("abs(share - expected)")} AS abs_dev
       |FROM sh ORDER BY digit""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "benford_audit" -> benfordSql,
    "dq_freshness" ->
      """WITH g AS (SELECT max(epoch_us(ts)) AS g FROM events),
        |agg AS (
        |  SELECT event_type, count(*) AS n_rows,
        |    max(epoch_us(ts)) AS max_ts_us, max(g.g) AS g,
        |    CAST(sum(CASE WHEN epoch_us(ts) > g.g - 86400000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_last24h
        |  FROM events, g GROUP BY event_type)
        |SELECT event_type, n_rows, max_ts_us,
        |  (g - max_ts_us) // 3600000000 AS lag_hours, n_last24h,
        |  CAST(CASE WHEN (g - max_ts_us) // 3600000000 >= 24
        |    THEN 1 ELSE 0 END AS BIGINT) AS stale
        |FROM agg ORDER BY event_type""".stripMargin,
    "dq_k_anonymity" ->
      s"""WITH classes AS (
         |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         |    CASE WHEN value IS NULL THEN -1
         |      ELSE CAST(floor(value / 10.0) AS BIGINT) END AS band,
         |    count(*) AS k
         |  FROM events GROUP BY event_type, day, band),
         |banded AS (
         |  SELECT CASE WHEN k = 1 THEN '1_unique'
         |    WHEN k <= 4 THEN '2_k_lt5'
         |    WHEN k <= 9 THEN '3_k_5_9'
         |    ELSE '4_k_10plus' END AS size_band, k
         |  FROM classes),
         |rolled AS (
         |  SELECT size_band, count(*) AS n_classes,
         |    CAST(sum(k) AS BIGINT) AS n_records
         |  FROM banded GROUP BY size_band)
         |SELECT size_band, n_classes, n_records,
         |  ${r6Sql("CAST(n_records AS DOUBLE) / " +
             "CAST(sum(n_records) OVER () AS DOUBLE)")} AS record_share
         |FROM rolled ORDER BY size_band""".stripMargin,
    "dq_embeddings" ->
      """WITH v AS (
        |  SELECT label,
        |    list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
        |  FROM embeddings),
        |f AS (
        |  SELECT label, CAST(len(x) AS BIGINT) AS dim,
        |    sqrt(list_reduce(list_transform(x, e -> e * e),
        |      (a, b) -> a + b)) AS norm,
        |    len(list_filter(x, e -> e IS NULL OR isnan(e))) > 0 AS has_bad
        |  FROM v),
        |g AS (
        |  SELECT label, dim, has_bad, norm,
        |    floor(norm * 1000000000 + 0.5) AS norm_nano
        |  FROM f)
        |SELECT label, count(*) AS n_vecs,
        |  min(dim) AS dim_min, max(dim) AS dim_max,
        |  CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_zero,
        |  CAST(sum(CASE WHEN has_bad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bad,
        |  floor(sum(norm_nano) / (1000000000.0 * count(*)) * 1000000 + 0.5)
        |    / 1000000 AS mean_norm
        |FROM g GROUP BY label ORDER BY label""".stripMargin,
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
