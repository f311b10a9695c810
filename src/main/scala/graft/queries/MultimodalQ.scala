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

  /** Frame sampling + resize plumbing over the stubbed payloads: fake
    * per-doc frame counts from the byte length, uniform stride sampling of
    * ≤ ~4 frames via sequence(), and an aspect-preserving integer resize to
    * fit 32×32 — all integer arithmetic, so engine-exact. A real video
    * decoder changes only the metadata source, not the sampling shape:
    * explode of a bounded per-row index list, embarrassingly parallel. */
  val frameSample: QFn = (s, dir) => {
    val nb = length(encode(col("text"), "UTF-8"))
    t(s, dir, "documents")
      .select(col("doc_id"), nb.as("nb"),
        (nb % 100 + 1).as("n_frames"),
        (nb % 64 + 1).as("w"), (nb % 48 + 1).as("h"))
      .withColumn("stride", greatest(lit(1), expr("n_frames div 4")))
      .withColumn("out_w", expr("(w * 32) div greatest(w, h)").cast("long"))
      .withColumn("out_h", expr("(h * 32) div greatest(w, h)").cast("long"))
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        col("out_w"), col("out_h"),
        explode(sequence(lit(0), col("n_frames") - 1, col("stride")))
          .as("fn"))
      .select(col("doc_id"), col("n_frames"), col("out_w"), col("out_h"),
        col("fn").cast("long").as("frame_no"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** REAL binary-payload codec pipeline (r8) — the decode seam exercised
    * end to end instead of stubbed: each doc's UTF-8 text is
    * DEFLATE-compressed into a genuinely opaque parquet BINARY column
    * (staged to scratch — the "media lake" at rest), read back, and
    * decoded by `operators.Multimodal.decodePayloads` (one Inflater per
    * partition, reset per row — the decoder-amortization lifecycle an
    * image/audio codec swap reuses unchanged); features come from the
    * DECODED bytes. Correctness is bit-exact by construction: the
    * oracle computes the same features from the ORIGINAL text, so one
    * corrupted byte anywhere in encode → binary column → decode breaks
    * the md5 fingerprint. Scale shape: encode and decode are
    * partition-parallel row maps (no shuffle); the only exchange is the
    * final sort. */
  val codecExec: QFn = (s, dir) => {
    val path = scratch(dir, "mm_payloads")
    graft.operators.Multimodal.encodePayloads(
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(path)
    graft.operators.Multimodal.decodePayloads(s.read.parquet(path))
      .select(col("doc_id"),
        length(encode(col("decoded"), "UTF-8")).cast("long").as("n_bytes"),
        substring(md5(col("decoded")), 1, 8).as("fp8"),
        size(graft.operators.TextOps.tokens(col("decoded"))).cast("long")
          .as("n_toks"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, QFn] = Map(
    "multimodal_codec_exec" -> codecExec,
    "multimodal_features" -> features,
    "multimodal_framesample" -> frameSample)

  val oracle: Map[String, String] = Map(
    // Same features from the ORIGINAL text — a hash-match proves the
    // DEFLATE round-trip through the binary column bit-lossless.
    "multimodal_codec_exec" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substring(md5(text), 1, 8) AS fp8,
        |  CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    w -> w <> '')) AS BIGINT) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  substring(md5(text), 1, 8) AS fp8,
        |  CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS fake_width,
        |  CAST(octet_length(encode(text)) % 48 + 1 AS BIGINT) AS fake_height,
        |  CAST(n_chars % 10 AS BIGINT) AS frame_idx
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_framesample" ->
      """WITH m AS (
        |  SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
        |d AS (
        |  SELECT doc_id, nb % 100 + 1 AS n_frames,
        |    nb % 64 + 1 AS w, nb % 48 + 1 AS h
        |  FROM m),
        |p AS (
        |  SELECT doc_id, n_frames, w, h,
        |    greatest(1, n_frames // 4) AS stride,
        |    (w * 32) // greatest(w, h) AS out_w,
        |    (h * 32) // greatest(w, h) AS out_h
        |  FROM d)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(out_w AS BIGINT) AS out_w, CAST(out_h AS BIGINT) AS out_h,
        |  CAST(unnest(range(0, n_frames, stride)) AS BIGINT) AS frame_no
        |FROM p ORDER BY doc_id, frame_no""".stripMargin)
}
