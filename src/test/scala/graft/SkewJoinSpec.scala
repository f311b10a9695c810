package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join under extreme key skew") {
    import spark.implicits._
    // 50k rows on ONE key + a tail — the shape that stalls a plain shuffle
    val left = spark.range(50000).select(lit(42L).as("k"), col("id").as("lv"))
      .union(spark.range(100).select(col("id").as("k"), col("id").as("lv")))
    val right = Seq((42L, "hot"), (7L, "cold"), (8L, "cold")).toDF("k", "rv")
    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedInner(left, right, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k", "rv").count().orderBy("k").collect().toSeq
    val b = plain.groupBy("k", "rv").count().orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("skew_join_salted plan: salted SMJ keys, replicated dim, no broadcast") {
    val p = SparkEntry.queries("skew_join_salted")(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // the join must key on (k, _salt) — bounded per-task input by salt —
    // through the pinned sort-merge path, with the dim side replicated by
    // the explode Generate; a broadcast would sidestep the skew entirely
    assert(p.contains("SortMergeJoin"), p.take(1200))
    assert(p.contains("_salt"), p.take(1200))
    assert(p.contains("Generate"), p.take(1200))
    assert(!p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("AQE splits the skewed partition at runtime (the conf-driven " +
      "complement to manual salting)") {
    import spark.implicits._
    // Same hot-key shape as the salted test. Thresholds are shrunk so the
    // ~50k-row hot partition qualifies at test scale; in production only
    // adaptive.skewJoin.enabled matters — the defaults (256 MB / 5×
    // median) encode the same rule at cluster scale.
    val left = spark.range(50000).select(lit(42L).as("k"), col("id").as("lv"))
      .union(spark.range(100).select(col("id").as("k"), col("id").as("lv")))
    val right = Seq((42L, "hot"), (7L, "cold"), (8L, "cold")).toDF("k", "rv")
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = left.join(right, "k")
      // collect() executes THIS queryExecution (count() would plan a
      // separate job and leave this adaptive plan unfinalized); matches:
      // 50000 hot + tail ids 42/7/8.
      assert(j.collect().length == 50003)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE must mark the hot-key join skew-handled:\n" + p.take(2000))
    }
  }

  test("AQE coalesces small post-shuffle partitions at runtime") {
    import spark.implicits._
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32") {
      // 5 groups over 32 shuffle partitions: 27+ partitions are empty —
      // the runtime must read them back coalesced instead of launching
      // 32 reducers (the small-stage tax at any scale).
      val df = spark.range(1000).groupBy((col("id") % 5).as("g")).count()
      assert(df.collect().length == 5)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
        "post-shuffle read must be a coalesced AQEShuffleRead:\n" +
          p.take(2000))
    }
  }

  test("salt scatters the hot key across buckets") {
    import spark.implicits._
    val hot = spark.range(10000).select(lit(1L).as("k"), col("id").as("v"))
    val buckets = hot.withColumn("_salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
      .groupBy("_salt").count().collect()
    assert(buckets.length == 8)
    // even-ish: no bucket holds more than 2x the fair share
    assert(buckets.forall(_.getAs[Long]("count") < 2 * 10000 / 8))
  }
}
