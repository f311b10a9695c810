package graft.queries

import org.apache.spark.sql.functions._
import core._

/** Scalar-function surface (SURVEY.md §2.8): string / date / math / array
  * higher-order functions, exercised as whole queries so the oracle checks
  * each function's cross-engine semantics.
  *
  * Cross-engine notes baked in:
  *   - ln/pow go through libm vs java.lang.Math — last-ulp divergence is
  *     possible, so transcendental outputs are rounded to 6 decimals on both
  *     sides. sqrt is IEEE-exact and stays raw.
  *   - Spark floor()/length()/size() return LONG/INT where DuckDB returns
  *     BIGINT — everything integer-ish is BIGINT on both sides.
  *   - Array outputs stay scalar (fold/length/element) — list-typed output
  *     columns compare awkwardly across parquet readers.
  */
object FunctionsQ {

  val strFuncs: QFn = (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      upper(substring(col("text"), 1, 20)).as("head_up"),
      length(col("text")).cast("long").as("len"),
      regexp_replace(substring(col("text"), 1, 50), " ", "_").as("underscored"),
      concat(col("lang"), lit(":"), col("source")).as("tag"),
      trim(lit("  pad  ")).as("trimmed"))
      .orderBy(col("doc_id"))

  val dateFuncs: QFn = (s, dir) =>
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("oyear"),
      month(col("o_orderdate")).cast("long").as("omonth"),
      dayofmonth(col("o_orderdate")).cast("long").as("oday"),
      to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01")).cast("long")
        .as("days_since"),
      date_add(col("o_orderdate"), 30).as("due_date"))
      .orderBy(col("o_orderkey"))

  val mathFuncs: QFn = (s, dir) =>
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      rd(col("l_extendedprice"), 1).as("price_r1"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      r6(log(col("l_extendedprice"))).as("price_ln"),
      r6(pow(col("l_tax") + 1, 2)).as("tax_sq"),
      floor(col("l_extendedprice") / 100).cast("long").as("price_c"),
      ceil(col("l_quantity") / 7).cast("long").as("qty_bucket"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Higher-order array functions over the embedding column: fold, map,
    * filter, element access — all codegen'd, no UDF. */
  val arrayFuncs: QFn = (s, dir) => {
    val v = transform(col("embedding"), x => x.cast("double"))
    t(s, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      element_at(v, 1).as("first_val"),
      r6(sqrt(aggregate(transform(v, x => x * x), lit(0.0),
        (acc, x) => acc + x))).as("l2norm"),
      r6(aggregate(transform(v, x => abs(x)), lit(0.0),
        (acc, x) => acc + x)).as("sum_abs"),
      size(filter(v, x => x > 0)).cast("long").as("n_pos"))
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, QFn] = Map(
    "str_funcs"   -> strFuncs,
    "date_funcs"  -> dateFuncs,
    "math_funcs"  -> mathFuncs,
    "array_funcs" -> arrayFuncs)

  val oracle: Map[String, String] = Map(
    "str_funcs" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 20)) AS head_up,
        |  CAST(length(text) AS BIGINT) AS len,
        |  regexp_replace(substring(text, 1, 50), ' ', '_', 'g')
        |    AS underscored,
        |  concat(lang, ':', source) AS tag,
        |  trim('  pad  ') AS trimmed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS oyear,
        |  CAST(month(o_orderdate) AS BIGINT) AS omonth,
        |  CAST(day(o_orderdate) AS BIGINT) AS oday,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor((l_extendedprice) * 10 + 0.5) / 10 AS price_r1,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  floor((ln(l_extendedprice)) * 1000000 + 0.5) / 1000000 AS price_ln,
        |  floor((pow(l_tax + 1, 2)) * 1000000 + 0.5) / 1000000 AS tax_sq,
        |  CAST(floor(l_extendedprice / 100) AS BIGINT) AS price_c,
        |  CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  floor((sqrt(list_reduce(
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
        |    (a, b) -> a + b))) * 1000000 + 0.5) / 1000000 AS l2norm,
        |  floor((list_reduce(
        |    list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)),
        |    (a, b) -> a + b)) * 1000000 + 0.5) / 1000000 AS sum_abs,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin)
}
