package graft

/** The §5.5 determinism canary: every contract query must produce the
  * identical ordered result under different shuffle partitioning — the
  * cheap local proxy for "will it hash-match an independent engine".
  * Catches float-order aggregation, undefined tie-breaks, and LIMIT under
  * partial orders.
  */
class DeterminismSpec extends SparkSpec {

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name is partition-count invariant") {
      spark.sparkContext.setLogLevel("WARN")
      // Memoized inputs would replay one frozen checkpoint under every
      // perturbation, making the axes vacuous for those keys — rebuild.
      def reset(): Unit = graft.queries.ModernQ.clearEdgeCache()
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      reset()
      val a = fn(spark, sf).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      reset()
      val b = fn(spark, sf).collect().toSeq
      // third axis: input-split perturbation — a tiny maxPartitionBytes
      // multiplies scan partitions, stressing map-side partials, object
      // aggregates, and iterative loops under a different input layout
      // (the speculative-retry / cluster-vs-local hazard the shuffle
      // axis alone can't reach). try/finally: a throwing collect must
      // not leak the 64 KiB split size into every later test.
      val priorSplit = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val c = try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        reset()
        fn(spark, sf).collect().toSeq
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", priorSplit)
        spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
      assert(a.size == b.size, s"row counts differ: ${a.size} vs ${b.size}")
      assert(a == b, "rows differ between shuffle partition counts")
      assert(a == c, "rows differ under input-split perturbation")
    }
  }
}
