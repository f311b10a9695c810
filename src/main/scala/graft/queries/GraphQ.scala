package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import core._

/** Graph analytics over the word-adjacency graph (SURVEY.md §2.13): nodes
  * are the corpus vocabulary, directed edges are distinct consecutive
  * token pairs. Complements the iterative-computation family —
  * ConnectedComponents (operators/) walks an undirected graph to a
  * fixpoint; PageRank here runs the canonical damped power iteration with
  * a fixed budget (3 rounds, how production rank jobs are scheduled).
  *
  * Determinism (the kmeans_embed pattern, proven cross-engine): each
  * iteration's per-edge contribution rank/out_degree is a double computed
  * from identical inputs (IEEE-identical on both engines), then cast to
  * DECIMAL(16,12) (identical rounding of identical doubles) and summed
  * exactly (order-independent), so the next rank vector is bit-identical
  * on both engines; r6 rounding is applied once, on the final vector.
  *
  * Scale shape: rank updates are one shuffle per iteration keyed on the
  * edge source (join ranks→edges) plus one keyed on destination (the
  * contribution sum) — the standard distributed power-iteration layout.
  * The only unkeyed join is the 1-row node-count aggregate broadcast into
  * the teleport term 0.15/n (PlanSweepSpec allowlist). Dangling mass is
  * dropped (nodes with no out-edges re-inject nothing), the common
  * simplification; the oracle mirrors it.
  */
object GraphQ {

  /** Distinct directed word-adjacency edges; self-loops dropped. */
  private def edgesOf(s: SparkSession, dir: String): DataFrame = {
    val ws = TextOps.tokens(col("text"))
    t(s, dir, "documents")
      .select(when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("src"),
            element_at(ws, i + 1).as("dst"))))
        .otherwise(array().cast("array<struct<src:string,dst:string>>"))
        .as("es"))
      .select(explode(col("es")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** PageRank (d = 0.85, 3 iterations, uniform init) over the word graph. */
  val pagerankWords: QFn = (s, dir) => {
    val edges = edgesOf(s, dir)
    val words = t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .distinct()
    val cnt = words.agg(count(lit(1)).cast("double").as("nn"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    var ranks = words.crossJoin(broadcast(cnt))
      .select(col("word"), (lit(1.0) / col("nn")).as("rank"))
    for (_ <- 1 to 3) {
      val contrib = edges
        .join(ranks.select(col("word").as("src"), col("rank")), "src")
        .join(outdeg, "src")
        .select(col("dst"), dec(col("rank") / col("od"), 16, 12).as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      ranks = words
        .join(sums.select(col("dst").as("word"), col("sc")), Seq("word"), "left")
        .crossJoin(broadcast(cnt))
        .select(col("word"),
          (lit(0.15) / col("nn") +
            lit(0.85) * dbl(coalesce(col("sc"), lit(0).cast("decimal(16,12)"))))
            .as("rank"))
    }
    ranks.select(col("word"), r6(col("rank")).as("pagerank"))
      .orderBy(col("word"))
  }

  val queries: Map[String, QFn] = Map(
    "pagerank_words" -> pagerankWords)

  /** The identical power iteration unrolled as a DuckDB CTE chain. */
  private def pagerankSql: String = {
    def iter(k: Int, prev: String): String =
      s"""c$k AS (SELECT e.dst, CAST(r.rank / o.od AS DECIMAL(16,12)) AS c
         |  FROM edges e JOIN $prev r ON e.src = r.word
         |    JOIN od o ON o.src = e.src),
         |s$k AS (SELECT dst, sum(c) AS sc FROM c$k GROUP BY dst),
         |r$k AS (SELECT w.word,
         |    0.15 / (SELECT nn FROM nn)
         |      + 0.85 * CAST(coalesce(s.sc, 0) AS DOUBLE) AS rank
         |  FROM words w LEFT JOIN s$k s ON s.dst = w.word)""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |    w -> w <> '') AS ws FROM documents),
       |words AS (SELECT DISTINCT unnest(ws) AS word FROM toks),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM words),
       |edges AS (
       |  SELECT DISTINCT ws[i] AS src, ws[i+1] AS dst
       |  FROM toks,
       |    (SELECT unnest(range(1, (SELECT max(len(ws)) FROM toks))) AS i)
       |  WHERE i + 1 <= len(ws) AND ws[i] <> ws[i+1]),
       |od AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
       |r0 AS (SELECT word, 1.0 / (SELECT nn FROM nn) AS rank FROM words),
       |${iter(1, "r0")},
       |${iter(2, "r1")},
       |${iter(3, "r2")}
       |SELECT word, floor(rank * 1000000 + 0.5) / 1000000 AS pagerank
       |FROM r3 ORDER BY word""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "pagerank_words" -> pagerankSql)
}
