package graft

import org.apache.spark.sql.functions._

/** DSv2 connector conformance: graft.sources.RangeSource implements the
  * full read lifecycle — filter pushdown must shrink the planned ranges,
  * column pruning must reach the reader, partition planning must split. */
class RangeSourceSpec extends SparkSpec {

  private def ranged(rows: Long, parts: Int = 4) =
    spark.read.format("graft.sources.RangeSource")
      .option("rows", rows).option("partitions", parts).load()

  test("reads the declared row count across partitions") {
    val df = ranged(1000, 4)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 4)
  }

  test("values are the deterministic (id, sq, hex) triple") {
    val r = ranged(300).filter(col("id") === 255).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("sq") == 255L * 255)
    assert(r(0).getAs[String]("hex") == "ff")
  }

  test("id-range filters push into the source and shrink partitions") {
    val df = ranged(1000000, 8).filter(col("id") >= 10 && col("id") < 20)
    val plan = df.queryExecution.executedPlan.toString
    // the source consumed the bounds: the scan advertises the shrunk
    // range and no post-scan Filter node survives
    assert(plan.contains("lo=10 hi=20"), plan.take(800))
    assert(!plan.contains("Filter ("), plan.take(800))
    assert(!plan.contains("+- Filter"), plan.take(800))
    assert(df.count() == 10)
    val rows = df.agg(min("id"), max("id")).collect()(0)
    assert(rows.getLong(0) == 10 && rows.getLong(1) == 19)
  }

  test("column pruning reaches the reader (scan output shrinks)") {
    val df = ranged(100).select(col("sq"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=[sq]"), plan.take(800))
    assert(df.agg(sum("sq")).collect()(0).getLong(0) ==
      (0L until 100L).map(i => i * i).sum)
  }

  test("limit pushes into the source after filters (prefix range read)") {
    // Filters land first (lo=100), then the limit caps the range: the scan
    // itself reads only [100, 105) — at scale this is LIMIT-exploration on
    // a huge table touching one partition instead of all of them.
    val df = ranged(1000000, 8).filter(col("id") >= 100).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=100 hi=105"), plan.take(800))
    assert(df.count() == 5)
    val rows = df.agg(min("id"), max("id")).collect()(0)
    assert(rows.getLong(0) == 100 && rows.getLong(1) == 104)
  }

  test("count/min/max push into the source completely (no aggregate node)") {
    val df = ranged(5000000, 8).filter(col("id") >= 1000)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeScan agg"), plan.take(800))
    assert(!plan.contains("HashAggregate"), plan.take(800))
    val r = df.collect()(0)
    assert(r.getLong(0) == 4999000 && r.getLong(1) == 1000 &&
      r.getLong(2) == 4999999)
  }

  test("aggregate pushdown on an empty range yields count 0 and null min/max") {
    val df = ranged(100).filter(col("id") >= 500)
      .agg(count(lit(1)), min("id"), max("id"))
    val r = df.collect()(0)
    assert(r.getLong(0) == 0 && r.isNullAt(1) && r.isNullAt(2))
  }

  test("unsupported aggregates fall back to a normal scan (sum, avg)") {
    val df = ranged(1000).agg(sum("id").as("s"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("RangeScan agg"), plan.take(800))
    val r = df.collect()(0)
    assert(r.getLong(0) == 499500L && r.getLong(1) == 1000L)
  }

  test("joins against parquet tables like any other relation") {
    val n = ranged(25).select(col("id").cast("int").as("n_nationkey"),
      col("hex"))
    val joined = Tables(spark, sf, "nation").join(n, "n_nationkey")
    assert(joined.count() == 25)
  }
}
