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

  val queries: Map[String, QFn] = Map(
    "qwin_rank_per_cust" -> rankPerCust)

  val oracle: Map[String, String] = Map(
    "qwin_rank_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)
}
