package graft.queries

import org.apache.spark.sql.functions._
import core._

/** Multimodal-column plumbing (builder mandate): media payloads travel as
  * opaque `binary` columns with typed metadata beside them. The corpus has
  * no real media, so the payload is the UTF-8 encoding of `text` and the
  * "decode" step is a clearly-stubbed deterministic feature extractor —
  * byte length, md5 fingerprint, fake width/height/frame-index derived
  * arithmetically from the bytes. The Spark-side plumbing (binary schema,
  * per-row extraction, partition-parallel execution) is real; swapping the
  * stub for an actual image/audio decoder changes only the expressions
  * (or, for native libs, a mapPartitions over the same schema —
  * graft.operators.Multimodal holds that variant).
  */
object MultimodalQ {

  val features: QFn = (s, dir) => {
    val bin = encode(col("text"), "UTF-8")
    t(s, dir, "documents")
      .withColumn("payload", bin)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        substring(md5(col("payload")), 1, 8).as("fp8"),
        (length(col("payload")) % 64 + 1).cast("long").as("fake_width"),
        (length(col("payload")) % 48 + 1).cast("long").as("fake_height"),
        (col("n_chars") % 10).cast("long").as("frame_idx"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, QFn] = Map(
    "multimodal_features" -> features)

  val oracle: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substring(md5(text), 1, 8) AS fp8,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS fake_width,
        |  CAST(octet_length(encode(text)) % 48 + 1 AS BIGINT) AS fake_height,
        |  CAST(n_chars % 10 AS BIGINT) AS frame_idx
        |FROM documents ORDER BY doc_id""".stripMargin)
}
