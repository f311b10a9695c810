package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10× corpus expansion — the third decade for the
  * candidate-growth gates (round-8 verdict task #2).
  *
  * ScalingSpec's sub-quadratic claims were previously fit across two
  * decades of real fixture data (sf0.01 → sf0.1); extrapolating "holds at
  * 100 TB" from two points is weak evidence. This synthesizer expands the
  * sf0.1 `documents`/`embeddings` tables 10× into a scratch sf1-equivalent
  * so the exponent fits get a third decade. Everything is a pure function
  * of (source row, replica index) via xxhash64 — no RNG, no clock — so
  * every JVM synthesizes the identical corpus and the gates are
  * reproducible:
  *
  *   - **documents**: replica r ∈ [1, 9] of each doc gets
  *     `doc_id + r·ID_STRIDE` and a text mutation that rewrites ~1/4 of
  *     its words (token → token + hash suffix), destroying shingle/
  *     MinHash/SimHash similarity with the original — replicas are
  *     corpus GROWTH, not duplication. A deterministic ~2% of replicas
  *     keep the text verbatim (exact duplicates), so the duplicate
  *     density stays non-trivial at the new tier and the dedup gates
  *     have true pairs to track.
  *   - **embeddings**: replica r of each vector adds per-dimension
  *     pseudo-noise (hash-derived, zero-mean) at amplitude 0.4 —
  *     decorrelating it from the original under cosine — except the same
  *     ~2% near-dup fraction at amplitude 0.01. Labels persist, so
  *     centroid/cluster keys keep their cardinality profile.
  *
  * Output layout matches a fixture dir (`<target>/documents.parquet`,
  * `<target>/embeddings.parquet` as parquet directories), so
  * `Tables(spark, target, …)` and every dedup/ANN query function work on
  * it unchanged. Synthesis is idempotent per target dir (completion
  * marker) and one-time: ~10 s of write for ~50 k docs / 20 k vectors.
  *
  * At REAL 100 TB nothing here runs — production data brings its own
  * third decade; this exists so the repo's scaling gates measure three
  * decades instead of asserting from two. */
object ScaleSynth {

  /** Replica id spacing: far above any fixture id, so replica ids never
    * collide with originals or each other. */
  private val ID_STRIDE = 10000000L

  /** 1-in-50 of replicas are kept as duplicates (exact text / near-dup
    * vector) — a controlled density for the dedup gates to track. */
  private val DUP_MOD = 50

  /** Expand `srcDir`'s documents+embeddings 10× into `targetDir`
    * (idempotent; returns targetDir). */
  def synth10x(spark: SparkSession, srcDir: String,
      targetDir: String): String = synchronized {
    val root = new java.io.File(targetDir)
    // v2: r10 added events + lineitem synthesis (graph/spatial exponent
    // gates); a v1 marker must not short-circuit the new tables.
    val marker = new java.io.File(root, "_synth_complete_v2")
    if (marker.exists()) return targetDir
    root.mkdirs()

    val reps = spark.range(0, 10).toDF("rep") // bounded 10-row side

    val docs = Tables(spark, srcDir, "documents")
      .crossJoin(broadcast(reps))
      .withColumn("doc_id", col("doc_id") + col("rep") * ID_STRIDE)
      .withColumn("keep_dup",
        pmod(xxhash64(col("doc_id"), lit("dup")), lit(DUP_MOD)) === 0)
      .withColumn("text",
        when(col("rep") === 0 || col("keep_dup"), col("text"))
          .otherwise(
            // rewrite ~1/4 of words: token -> token + per-position hash
            // suffix. Enough to push shingle Jaccard far below any
            // near-dup threshold while keeping realistic word statistics.
            array_join(
              transform(split(col("text"), " "), (w, j) =>
                when(pmod(xxhash64(w, col("doc_id"), j), lit(4)) === 0,
                  concat(w, lit("q"),
                    pmod(xxhash64(col("doc_id"), j), lit(97))))
                  .otherwise(w)),
              " ")))
      .withColumn("n_chars", length(col("text")))
      .drop("rep", "keep_dup")

    val emb = Tables(spark, srcDir, "embeddings")
      .crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("rep") * ID_STRIDE)
      .withColumn("amp",
        when(col("rep") === 0, lit(0.0))
          .when(pmod(xxhash64(col("vec_id"), lit("dup")), lit(DUP_MOD)) === 0,
            lit(0.01))
          .otherwise(lit(0.4)))
      .withColumn("embedding",
        transform(col("embedding"), (x, d) =>
          (x + (pmod(xxhash64(col("vec_id"), d), lit(2001)) - 1000)
            .cast("double") / 1000.0 * col("amp")).cast("float")))
      .drop("rep", "amp")

    // events (r10): replica users are NEW users (user domain grows 10×,
    // the node domain spatial_grid_join hashes); temporal pattern repeats
    // per replica, which the spatial key never reads.
    val ev = Tables(spark, srcDir, "events")
      .crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("rep") * ID_STRIDE)
      .withColumn("user_id", col("user_id") + col("rep") * 100000L)
      .drop("rep")

    // lineitem (r10): replica orders are disjoint; ~1/3 of replica line
    // items keep their ORIGINAL part key (hash-selected), so the
    // co-purchase graph's hub parts densify across replicas instead of
    // splitting into 10 disconnected copies — the realistic growth mode
    // for the label_propagation / kcore_peel exponent gates.
    val li = Tables(spark, srcDir, "lineitem")
      .crossJoin(broadcast(reps))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * ID_STRIDE)
      .withColumn("l_partkey",
        when(pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(3))
          === 0, col("l_partkey"))
          .otherwise(col("l_partkey") + col("rep") * 1000000L))
      .drop("rep")

    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$targetDir/documents.parquet")
    emb.repartition(8).write.mode("overwrite")
      .parquet(s"$targetDir/embeddings.parquet")
    ev.repartition(8).write.mode("overwrite")
      .parquet(s"$targetDir/events.parquet")
    li.repartition(8).write.mode("overwrite")
      .parquet(s"$targetDir/lineitem.parquet")
    java.nio.file.Files.createFile(marker.toPath)
    targetDir
  }
}
