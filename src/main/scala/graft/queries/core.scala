package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for contract queries.
  *
  * Determinism conventions (SURVEY.md §7.4 — load-bearing for the DuckDB
  * hash-match):
  *   - Money/float aggregation happens in DECIMAL on both engines (exact,
  *     order-independent), and the *final* aggregate is cast to DOUBLE —
  *     casting identical exact decimals gives bit-identical doubles.
  *   - Every query output ends in a total deterministic ORDER BY with a
  *     unique tiebreaker; every window ORDER BY carries a tiebreaker.
  *   - Integer-ish outputs are BIGINT on both sides (DuckDB rank/row_number
  *     return BIGINT; Spark's Int row_number is cast up).
  */
object core {
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** Cast to an exact decimal before aggregating (both engines). */
  def dec(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")

  def dbl(c: Column): Column = c.cast("double")

  /** lineitem revenue term, decimal-exact: extprice * (1 - discount). */
  def revenue(ep: Column, disc: Column): Column =
    dec(ep, 18, 4) * (org.apache.spark.sql.functions.lit(1) - dec(disc, 9, 4))

  /** The same revenue term in DuckDB SQL. */
  val revenueSql: String =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(9,4)))"
}
