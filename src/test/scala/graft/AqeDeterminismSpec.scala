package graft

/** Fourth determinism axis (r6): Adaptive Query Execution toggle.
  *
  * DeterminismSpec proves shuffle-count and input-split invariance; on a
  * real cluster the bigger planning delta is AQE itself — runtime
  * coalescing, build-side re-election, skew-join splitting — which local
  * bench runs exercise only in whatever state the session default left
  * it. A contract result that depends on whether AQE re-planned is
  * exactly the local-green/cluster-red hazard, so the join/agg-heaviest
  * keys must produce identical ordered rows with AQE on and off.
  *
  * Scope: the keys whose plans AQE actually rewrites (broadcast-vs-SMJ
  * elections, multi-join trees, skew splitting, runtime coalescing of
  * high-partition aggregations). Streaming-exec keys are excluded — the
  * engine disables AQE in stateful workloads. Cost: one extra run per
  * listed key at sf0.001.
  */
class AqeDeterminismSpec extends SparkSpec {

  private val keys = Seq(
    // multi-join trees + broadcast elections
    "q03_topk_revenue", "q05_region_join", "q07_volume_shipping",
    "q08_market_share", "q10_returned_items", "q21_sole_late",
    "q18_large_orders", "q22_no_order_cust",
    // skew / layout / filter-pushing joins
    "skew_join_salted", "bucketed_join", "bloom_prefilter_join",
    "join_theta_range", "lateral_topn",
    // heavy aggregation / dedup pipelines
    "dedup_pipeline_e2e", "curation_pipeline_e2e", "topk_per_group_agg",
    "qdedup_docs", "neardup_pairs", "minhash_lsh_pairs",
    // iterative / recursive plans under runtime re-planning
    "recursive_org_depth", "bfs_distance", "neardup_clusters",
    // r7: host-keyed canonicalization agg + DSv2 sink round-trip agg
    "url_canonical_dedup", "v2_sink_roundtrip")

  for (name <- keys) {
    test(s"$name is AQE-toggle invariant") {
      spark.sparkContext.setLogLevel("WARN")
      val fn = SparkEntry.queries(name)
      val prior = spark.conf.get("spark.sql.adaptive.enabled")
      // Drop memoized inputs so BOTH runs execute the full build path —
      // a frozen checkpoint replayed under the second setting would make
      // the invariance trivially true instead of proven.
      def reset(): Unit = graft.queries.ModernQ.clearEdgeCache()
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        reset()
        val on = fn(spark, sf).collect().toSeq
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        reset()
        val off = fn(spark, sf).collect().toSeq
        assert(on.size == off.size,
          s"row counts differ under AQE toggle: ${on.size} vs ${off.size}")
        assert(on == off, "rows differ between AQE on and off")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
    }
  }
}
