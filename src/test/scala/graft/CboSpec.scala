package graft

import org.scalatest.BeforeAndAfterAll

/** Cost-based-optimizer robustness (VERDICT r6 next-steps #6).
  *
  * The contract queries pin their join trees with explicit `broadcast()`
  * hints where the right plan is known a priori. A 100 TB deployment
  * cannot hint every query — it relies on table/column statistics
  * (`ANALYZE TABLE … COMPUTE STATISTICS`) feeding the cost-based
  * optimizer. This suite proves the two deepest join trees in the suite
  * (q08's 7-way star, q18's agg-then-join) are STATS-ROBUST:
  *
  *   - the tables are registered in the catalog and fully analyzed
  *     (row counts + column stats — the inputs CBO join-reorder uses);
  *   - the queries are written HINT-FREE in SQL over those tables, so
  *     whatever plan appears is the optimizer's own choice;
  *   - with CBO off (size-only estimation) and CBO+joinReorder on
  *     (stats-driven), the physical shape must be the same good plan the
  *     hinted DataFrame version pins — every dimension broadcast, the
  *     fact never sort-merge-joined, top-k fused — and the rows must
  *     equal the contract query's output exactly.
  *
  * A regression here means a stats change (or a Spark upgrade's CBO
  * behavior change) would silently degrade the unhinted production plan
  * — exactly the drift this suite exists to catch.
  */
class CboSpec extends SparkSpec with BeforeAndAfterAll {

  private val db = "graft_cbo"
  /** Same tables analyzed WITH equi-height histograms (round-8 verdict
    * task #6): r7 proved stats-robustness on row counts + basic column
    * stats only; this db feeds FilterEstimation/JoinEstimation the
    * per-bin distributions that drive selectivity on skewed and
    * disjunctive predicates. */
  private val dbH = "graft_cbo_h"
  private val tables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem")

  private def analyzeInto(targetDb: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $targetDb")
    for (t <- tables) {
      spark.sql(s"""CREATE TABLE IF NOT EXISTS $targetDb.$t
                   |USING parquet LOCATION '$sf/$t.parquet'""".stripMargin)
      // FOR ALL COLUMNS would also collect stats on the timestamp-NTZ
      // date columns — and Spark's FilterEstimation.evaluateBinary has no
      // case for TimestampNTZType, so a CBO-on date-range filter over a
      // column WITH stats throws MatchError (hit here, Spark 4.1.2).
      // Collecting stats for every non-NTZ column keeps the join-reorder
      // inputs (keys, filter strings, numerics) while the date filters
      // fall back to default selectivity.
      val cols = spark.table(s"$targetDb.$t").schema.fields
        .filterNot(_.dataType.typeName.startsWith("timestamp"))
        .map(_.name).mkString(", ")
      spark.sql(
        s"ANALYZE TABLE $targetDb.$t COMPUTE STATISTICS FOR COLUMNS $cols")
    }
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    graft.Tables.prepareSession(spark)
    analyzeInto(db)
    withConfs("spark.sql.statistics.histogram.enabled" -> "true") {
      analyzeInto(dbH)
    }
  }

  override def afterAll(): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"DROP DATABASE IF EXISTS $dbH CASCADE")
    super.afterAll()
  }

  /** Hint-free q08: the optimizer must discover the star shape itself. */
  private val q08Sql =
    s"""SELECT o_year,
       |  floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000000 + 0.5)
       |    / 1000000 AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    SUM(CASE WHEN n2.n_name = 'NATION_1'
       |        THEN CAST(l_extendedprice AS DECIMAL(18,4))
       |             * (1 - CAST(l_discount AS DECIMAL(9,4)))
       |        ELSE 0 END) AS num,
       |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))
       |        * (1 - CAST(l_discount AS DECIMAL(9,4)))) AS den
       |  FROM $db.lineitem
       |  JOIN $db.part ON l_partkey = p_partkey AND p_type = 'STANDARD'
       |  JOIN $db.orders ON l_orderkey = o_orderkey
       |  JOIN $db.customer ON o_custkey = c_custkey
       |  JOIN $db.nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN $db.region ON n1.n_regionkey = r_regionkey
       |    AND r_name = 'ASIA'
       |  JOIN $db.supplier ON l_suppkey = s_suppkey
       |  JOIN $db.nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
       |  GROUP BY year(o_orderdate))
       |ORDER BY o_year""".stripMargin

  /** Hint-free q18: pre-aggregate feeding two joins, fused top-k. */
  private val q18Sql =
    s"""SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM $db.orders
       |JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
       |      FROM $db.lineitem GROUP BY l_orderkey
       |      HAVING SUM(l_quantity) > 150) big
       |  ON o_orderkey = l_orderkey
       |JOIN $db.customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  private def withCbo[T](on: Boolean)(body: => T): T =
    withConfs("spark.sql.cbo.enabled" -> on.toString,
      "spark.sql.cbo.joinReorder.enabled" -> on.toString)(body)

  private def plan(sql: String): String =
    spark.sql(sql).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("analyzed tables carry row counts and column stats") {
    val stats = spark.sql(
      s"DESCRIBE EXTENDED $db.lineitem l_orderkey").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(stats.get("distinct_count").exists(_ != "NULL"),
      s"column stats missing after ANALYZE: $stats")
    // rowCount only surfaces through the stats visitor when CBO is on
    // (the size-only visitor reports None by design)
    withCbo(true) {
      val rc = spark.table(s"$db.lineitem").queryExecution.optimizedPlan
        .stats.rowCount
      assert(rc.exists(_.toLong > 0), s"rowCount stat missing: $rc")
    }
  }

  /** Hint-free q19 (disjunctive brand/size/quantity) over a given db —
    * histogram bins are exactly what a CBO needs to see through an OR of
    * narrow range conjunctions. */
  private def q19Sql(d: String) =
    s"""SELECT coalesce(CAST(round(sum(
       |    CAST(l_extendedprice AS DECIMAL(18,4))
       |    * (1 - CAST(l_discount AS DECIMAL(9,4)))), 2) AS DOUBLE), 0.0)
       |  AS revenue
       |FROM $d.lineitem JOIN $d.part ON l_partkey = p_partkey
       |WHERE l_quantity >= 1 AND l_quantity <= 30 AND (
       |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       |    AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       |    AND l_quantity BETWEEN 20 AND 30))""".stripMargin

  /** Hint-free q21 (sole late supplier): the l_orderkey fact self-agg is
    * the skewed-key join-estimation path histograms inform. */
  private def q21Sql(d: String) =
    s"""WITH late AS (
       |  SELECT l_orderkey, l_suppkey,
       |    l_shipdate > o_orderdate + INTERVAL 60 DAYS AS is_late
       |  FROM $d.lineitem JOIN $d.orders ON o_orderkey = l_orderkey),
       |per_supp AS (
       |  SELECT l_orderkey, l_suppkey, max(is_late) AS sup_late
       |  FROM late GROUP BY 1, 2),
       |per_order AS (
       |  SELECT l_orderkey, count(*) AS n_supp,
       |    sum(CASE WHEN sup_late THEN 1L ELSE 0L END) AS n_late_supp,
       |    max(CASE WHEN sup_late THEN l_suppkey END) AS sole_late_supp
       |  FROM per_supp GROUP BY 1
       |  HAVING count(*) >= 2
       |    AND sum(CASE WHEN sup_late THEN 1L ELSE 0L END) = 1)
       |SELECT s_name, count(*) AS numwait
       |FROM per_order JOIN $d.supplier ON s_suppkey = sole_late_supp
       |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 50""".stripMargin

  test("histogram-analyzed tables carry equi-height histograms") {
    val stats = spark.sql(
      s"DESCRIBE EXTENDED $dbH.lineitem l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(stats.get("histogram").exists(h => h != null && h != "NULL"),
      s"ANALYZE under histogram.enabled must persist a histogram: $stats")
    // ...and the plain db must NOT have one (the axes stay distinct)
    val plain = spark.sql(
      s"DESCRIBE EXTENDED $db.lineitem l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(plain.get("histogram").forall(h => h == null || h == "NULL"),
      s"plain db unexpectedly has histograms: $plain")
  }

  test("q19 hint-free under CBO + histograms: part broadcasts through " +
    "the disjunctive filter, quantity bound pushes to scan, rows match") {
    withCbo(true) {
      val p = plan(q19Sql(dbH))
      assert(p.contains("BroadcastHashJoin"), p.take(1500))
      assert(!p.contains("SortMergeJoin"),
        "q19's dim join must stay broadcast under histogram stats:\n" +
          p.take(2000))
      // the common quantity conjunct reaches the parquet scan
      assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") ||
        p.contains("PushedFilters: [IsNotNull(l_quantity)"), p.take(3000))
      val rows = spark.sql(q19Sql(dbH)).collect().toSeq
      val contract = SparkEntry.queries("q19_disjunct_rev")(spark, sf)
        .collect().toSeq
      assert(rows == contract, s"q19 rows diverge under histograms: " +
        s"$rows vs $contract")
    }
  }

  test("q21 hint-free under CBO + histograms: supplier dim broadcasts, " +
    "no cartesian, rows match contract") {
    withCbo(true) {
      val p = plan(q21Sql(dbH))
      assert(!p.contains("CartesianProduct"), p.take(2000))
      assert(p.contains("BroadcastHashJoin"),
        "supplier (tiny, fully analyzed) must broadcast:\n" + p.take(2000))
      val rows = spark.sql(q21Sql(dbH)).collect().toSeq
      val contract = SparkEntry.queries("q21_sole_late")(spark, sf)
        .collect().toSeq
      assert(rows == contract, s"q21 rows diverge under histograms")
    }
  }

  test("q08/q18 plan shape is stable across the histogram axis") {
    // the same assertions the plain-db tests pin, re-run with histogram
    // stats feeding the estimators: richer stats must not flip the plan
    withCbo(true) {
      val p08 = plan(q08Sql.replace(s"$db.", s"$dbH."))
      assert(!p08.contains("SortMergeJoin"), p08.take(2000))
      assert("BroadcastHashJoin".r.findAllIn(p08).size >= 4, p08.take(2000))
      val p18 = plan(q18Sql.replace(s"$db.", s"$dbH."))
      assert(p18.contains("TakeOrderedAndProject"), p18.take(1500))
      assert(p18.contains(
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
        p18.take(2000))
    }
  }

  for (cbo <- Seq(false, true)) {
    val label = if (cbo) "CBO+joinReorder on" else "CBO off"

    test(s"q08 hint-free over analyzed tables [$label]: all dims " +
      "broadcast, fact never sort-merge-joins, rows match contract") {
      withCbo(cbo) {
        val p = plan(q08Sql)
        assert(!p.contains("SortMergeJoin"),
          s"q08 unhinted must stay all-broadcast under $label:\n" +
            p.take(2000))
        assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
        val rows = spark.sql(q08Sql).collect().toSeq
        val contract = SparkEntry.queries("q08_market_share")(spark, sf)
          .collect().toSeq
        assert(rows == contract, s"q08 rows diverge under $label")
      }
    }

    test(s"q18 hint-free over analyzed tables [$label]: top-k fuses, " +
      "lineitem scan stays narrow, rows match contract") {
      withCbo(cbo) {
        val p = plan(q18Sql)
        assert(p.contains("TakeOrderedAndProject"), p.take(1500))
        assert(p.contains(
          "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
          "pre-agg must prune the lineitem scan to 2 columns:\n" +
            p.take(2000))
        val rows = spark.sql(q18Sql).collect().toSeq
        val contract = SparkEntry.queries("q18_large_orders")(spark, sf)
          .collect().toSeq
        assert(rows == contract, s"q18 rows diverge under $label")
      }
    }
  }
}
