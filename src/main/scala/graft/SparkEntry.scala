package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): each key is one
  * contract operator, each value builds its DataFrame plan against the
  * parquet tables under `sfDir`. `oracleSql` carries the DuckDB-equivalent
  * SQL for every SQL-expressible key — the driver hash-compares the two.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q1 pricing summary: scan → filter → 8-aggregate group-by → sort. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ WindowsQ.queries ++ EventsQ.queries ++
      TextQ.queries ++ VectorQ.queries ++ FunctionsQ.queries ++
      MultimodalQ.queries ++ StatsQ.queries ++ SqlQ.queries ++
      DepthQ.queries ++ GraphQ.queries ++ TpchQ.queries ++ ModernQ.queries ++
      CurationQ.queries ++ FormatsQ.queries ++ QualityQ.queries ++
      StreamQ.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ WindowsQ.oracle ++ EventsQ.oracle ++
      TextQ.oracle ++ VectorQ.oracle ++ FunctionsQ.oracle ++
      MultimodalQ.oracle ++ StatsQ.oracle ++ SqlQ.oracle ++
      DepthQ.oracle ++ GraphQ.oracle ++ TpchQ.oracle ++ ModernQ.oracle ++
      CurationQ.oracle ++ FormatsQ.oracle ++ QualityQ.oracle ++
      StreamQ.oracle
}
