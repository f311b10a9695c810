package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import core._

/** Window-function queries (SURVEY.md §2.5). Every window ORDER BY carries a
  * unique tiebreaker (`o_orderkey`) so ranking is total — the determinism
  * rule that makes these hash-matchable cross-engine. Partitions are keyed on
  * `o_custkey` (high cardinality) so window state shards across executors.
  */
object WindowsQ {

  /** Top-3 orders per customer by total price (row_number ranking). */
  val rankPerCust: QFn = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank / dense_rank / ntile within p_type by price (unique tiebreaker).
    * Scale shape (r13): the ORDER BY is unique, so rank = dense_rank =
    * row_number, and ntile(4) is a pure function of (rank, n) — the
    * TRUE ntile remainder rule (first n mod 4 buckets get the extra
    * row), never evaluated on a zero divisor (the q = 0 branch is
    * short-circuited by the CASE). Ranks ride the two-phase device
    * (negated floor(price) buckets preserve the DESC order), so no task
    * sorts a whole p_type shard — the bounded-key weak class on the
    * part axis, eliminated. */
  val rankDense: QFn = (s, dir) => {
    val base = t(s, dir, "part")
      .select(col("p_partkey"), col("p_type"), col("p_retailprice"))
    val ranked = graft.queries.core.bucketedRowNumber(base, Seq("p_type"),
      (-floor(col("p_retailprice"))).cast("long"),
      Seq(col("p_retailprice").desc, col("p_partkey")), "rk", Some("n"))
    val q = expr("n div 4")
    val r = expr("n % 4")
    val tile = when(col("rk") <= (q + lit(1L)) * r,
      expr("(rk - 1) div (n div 4 + 1)") + lit(1L))
      .otherwise(r + expr("(rk - 1 - (n div 4 + 1) * (n % 4)) div (n div 4)")
        + lit(1L))
    ranked
      .select(col("p_partkey"), col("p_type"),
        col("rk").as("rnk"), col("rk").as("drnk"), tile.as("tile"))
      .orderBy(col("p_partkey"))
  }

  /** Cumulative revenue per customer (ROWS unbounded-preceding frame);
    * decimal running sum so every prefix is exact on both engines. */
  val runningSum: QFn = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        dbl(sum(dec(col("o_totalprice"), 18, 4)).over(w)).as("running"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lag/lead: days since previous order and next order's price. */
  val lagLead: QFn = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("gap_days"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** 7-row moving average over the daily event-value series. The average is
    * emitted as round(sum/count, 6) — the one formulation both engines
    * compute bit-identically from the exact decimal window sum. */
  val movingAvg: QFn = (s, dir) => {
    val daily = t(s, dir, "events")
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(sum(dec(col("value"), 14, 4)).as("v"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    daily
      .select(col("day"), col("n"),
        r6(dbl(sum(col("v")).over(w)) / sum(col("n")).over(w))
          .as("mavg7"))
      .orderBy(col("day"))
  }

  /** Rolling 7-row MEDIAN of the daily event-count series per type (r8)
    * — the robust complement to win_moving_avg: a traffic baseline a
    * single spike day cannot drag (the anomaly-detection reason rolling
    * medians exist). Exact `percentile(…, 0.5)` as a true WINDOW
    * aggregate over a ROWS frame; inputs are integer counts, so the
    * even-frame midpoint average is an exact x.0/x.5 double on both
    * engines — no rounding needed anywhere. The frame runs over the
    * per-day aggregate (≤ days·types rows at any corpus size) under an
    * event_type partition; the one data-sized shuffle is the daily
    * groupBy. At 100 TB the exact frame median yields to a sliding
    * sketch; the plan shape is unchanged. */
  val rollingMedian: QFn = (s, dir) => {
    t(s, dir, "events")
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
      .selectExpr("event_type", "day", "c",
        """percentile(c, 0.5) OVER (PARTITION BY event_type ORDER BY day
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7""")
      .orderBy(col("event_type"), col("day"))
  }

  /** Time-interval RANGE frame (r9) — the third frame kind (§2.5 has
    * ROWS frames and an integer RANGE frame; this is RANGE over a
    * TIMESTAMP ordering with an INTERVAL bound): per event, how many
    * events and how much exact value the type saw in the trailing hour —
    * the per-event rate-limiter / burst-detector shape, and the batch
    * twin of the streaming sliding window. RANGE frames are value-based,
    * so timestamp TIES are all peers of one frame on both engines —
    * deterministic with no tiebreaker needed (the reason this key can
    * ship a per-event output at all); count is exact and the sum rides
    * the DECIMAL pin.
    * Scale shape (r13): the partition key IS (type, day-bucket) now —
    * the r12 docstring's promised fix, implemented with the standard
    * GHOST-OVERLAP device: a trailing 1 h frame can only reach back
    * across one midnight, so every event in a day's LAST hour is
    * duplicated into the NEXT day's partition as a frame-feeding ghost
    * (counted by frames, emits no output row). Per-task input is one
    * (type, day) shard + ≤1 h of ghosts at any corpus size; outputs are
    * bit-identical to the one-window-per-type plan. */
  val winRangeInterval: QFn = (s, dir) => {
    val base = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("ts"), col("ts_us"),
        dec(col("value"), 14, 4).as("v"))
    val real = base
      .withColumn("bkt", expr("ts_us div 86400000000"))
      .withColumn("ghost", lit(false))
    val ghosts = base
      .filter(expr("ts_us % 86400000000 >= 86400000000 - 3600000000"))
      .withColumn("bkt", expr("ts_us div 86400000000 + 1"))
      .withColumn("ghost", lit(true))
    real.unionByName(ghosts)
      .selectExpr("event_id", "event_type", "ghost",
        """count(*) OVER (PARTITION BY event_type, bkt ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS n_1h""",
        """CAST(sum(v) OVER (PARTITION BY event_type, bkt ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS sum_1h""")
      .filter(!col("ghost"))
      .select(col("event_id"), col("event_type"), col("n_1h"),
        col("sum_1h"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, QFn] = Map(
    "win_range_interval" -> winRangeInterval,
    "qwin_rank_per_cust" -> rankPerCust,
    "win_rank_dense"     -> rankDense,
    "win_running_sum"    -> runningSum,
    "win_lag_lead"       -> lagLead,
    "win_rolling_median" -> rollingMedian,
    "win_moving_avg"     -> movingAvg)

  val oracle: Map[String, String] = Map(
    "win_range_interval" ->
      """SELECT event_id, event_type,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE)
        |    AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY event_type, day)
        |SELECT event_type, day, c,
        |  quantile_cont(CAST(c AS DOUBLE), 0.5) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "win_rank_dense" ->
      """SELECT p_partkey, p_type,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  ntile(4) OVER w AS tile
        |FROM part
        |WINDOW w AS (PARTITION BY p_type
        |  ORDER BY p_retailprice DESC, p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate)
        |    AS gap_days,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_moving_avg" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |    sum(CAST(value AS DECIMAL(14,4))) AS v, count(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT day, n,
        |  floor((CAST(sum(v) OVER w AS DOUBLE) /
        |        CAST(sum(n) OVER w AS BIGINT)) * 1000000 + 0.5) / 1000000 AS mavg7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,
    "qwin_rank_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)
}
