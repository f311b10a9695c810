package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import core._

/** Text / document-pipeline queries over `documents` (SURVEY.md §2.10):
  * the dedup + tokenization slice of the LLM-data operators. All are pure
  * built-in compositions (explode/split/regexp/window) — codegen-friendly,
  * shuffle-partitioned on high-cardinality keys (norm-text, word), so they
  * scale by adding executors; no driver-side loops.
  */
object TextQ {

  /** Exact dedup after lowercase + whitespace-collapse normalization,
    * keeping the lowest doc_id of each duplicate group. */
  val dedupDocs: QFn = (s, dir) => {
    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val w = Window.partitionBy(col("norm")).orderBy(col("doc_id"))
    t(s, dir, "documents")
      .withColumn("norm", norm)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Tokenize + global top-20 word count (Generator/explode path). */
  val wordCount: QFn = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(20)

  val queries: Map[String, QFn] = Map(
    "qdedup_docs"     -> dedupDocs,
    "qtext_wordcount" -> wordCount)

  val oracle: Map[String, String] = Map(
    "qdedup_docs" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (
        |      PARTITION BY regexp_replace(lower(text), '\s+', ' ', 'g')
        |      ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "qtext_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word LIMIT 20""".stripMargin)
}
