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
