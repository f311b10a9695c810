package graft

import org.apache.spark.sql.functions._

/** ANN quality gates, measured honestly for this corpus: the embeddings
  * are isotropic random vectors (measured: mean pairwise cosine ≈ 4e-4,
  * top-3 neighbors share the label at chance rate) — the hardest case for
  * ANN, where high absolute recall requires scanning a large candidate
  * fraction (curse of dimensionality). The meaningful metric is therefore
  * **enrichment**: recall@k divided by the fraction of candidates
  * examined. A working index concentrates true neighbors into its
  * candidate set well above chance; a broken one doesn't. Absolute recall
  * on clustered real-world embeddings would be far higher at the same
  * candidate fraction, and both variants expose the standard knobs
  * (bits/bands, probes) to trade candidates for recall.
  *
  * Also demos the mergeable count_min_sketch aggregate (the
  * TypedImperativeAggregate surface, via the built-in sketch).
  */
class AnnQualitySpec extends SparkSpec {

  private def knnPairs(name: String, k: Int): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).filter(col("rn") <= k).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet

  private lazy val exactTop3: Set[(Long, Long)] =
    knnPairs("qknn_cosine_top5", 3)

  private lazy val nVecs: Long =
    Tables(spark, sf, "embeddings").count()

  test("LSH kNN enrichment: recall@3 beats its candidate fraction >= 2x") {
    val lsh = knnPairs("ann_lsh_knn", 3)
    val recall = (lsh intersect exactTop3).size.toDouble / exactTop3.size
    // candidate fraction = sum over queries of (bucket size - 1) / (N-1)
    val e = Tables(spark, sf, "embeddings")
    val bucket = graft.queries.VectorQ.lshBucket(col("embedding"))
    val sizes = e.select(col("vec_id"), bucket.as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
    val q = e.filter(col("vec_id") < 50).select(bucket.as("b"))
    val cands = q.join(sizes, "b").agg(sum(col("n") - 1)).collect()(0).getLong(0)
    val frac = cands.toDouble / (50.0 * (nVecs - 1))
    val enrichment = recall / frac
    assert(enrichment >= 2.0,
      f"LSH recall@3=$recall%.3f at candidate fraction $frac%.4f " +
        f"(enrichment $enrichment%.1f) — index not concentrating signal")
  }

  test("IVF kNN enrichment: recall@3 beats its candidate fraction >= 1.3x") {
    val ivf = knnPairs("ann_ivf_knn", 3)
    val recall = (ivf intersect exactTop3).size.toDouble / exactTop3.size
    // 2 probed cells of 10 ≈ 20% candidate fraction by construction
    val frac = 0.2
    val enrichment = recall / frac
    assert(enrichment >= 1.3,
      f"IVF recall@3=$recall%.3f at ~$frac%.2f candidates " +
        f"(enrichment $enrichment%.1f)")
  }

  test("count_min_sketch aggregate estimates within epsilon of exact") {
    val ev = Tables(spark, sf, "events")
    val sketchBytes = ev.agg(
      expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("cms"))
      .collect()(0).getAs[Array[Byte]]("cms")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = ev.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    exact.foreach { case (k, n) =>
      val est = cms.estimateCount(k)
      // CMS never under-counts; over-count bounded by eps * total stream
      assert(est >= n, s"$k: est $est < exact $n")
      assert(est <= n + (0.001 * total).ceil.toLong + 1,
        s"$k: est $est too far above exact $n")
    }
  }
}
