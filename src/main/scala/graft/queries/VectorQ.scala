package graft.queries

import org.apache.spark.sql.{Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import core._

/** Embedding / similarity-search queries over `embeddings` (SURVEY.md §2.10).
  *
  * Vector math is pure higher-order-function composition
  * (`zip_with` + `aggregate`) over `array<float>` cast to double — stays
  * inside codegen, no UDF, no JVM-boundary cost. Similarities are rounded to
  * 6 decimals *before* ranking on both engines, so rank order is identical
  * even though the two engines accumulate dot products in different orders.
  *
  * Scale path: brute-force top-k here is O(|Q|·|N|) with a bounded query set
  * (50 vectors) — at 100 TB the same plan shape holds by broadcasting the
  * query set and mapping over base partitions; the LSH-bucketed variant
  * (graft.operators) bounds candidates when |Q| grows.
  */
object VectorQ {

  /** Sequential-fold dot product over two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Brute-force cosine top-5 neighbours for the 50 query vectors
    * (vec_id < 50 — present at every scale factor). */
  val knnTop5: QFn = (s, dir) => {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    q.crossJoin(e)
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("v")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vec_id"), col("cos_sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  val queries: Map[String, QFn] = Map(
    "qknn_cosine_top5" -> knnTop5)

  val oracle: Map[String, String] = Map(
    "qknn_cosine_top5" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 50),
        |p AS (SELECT qid, vec_id,
        |        round(list_cosine_similarity(qv, v), 6) AS cos_sim
        |      FROM q, e WHERE vec_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_sim DESC, vec_id) AS rn FROM p)
        |SELECT qid, vec_id, cos_sim, rn FROM r
        |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin)
}
