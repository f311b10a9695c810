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

  test("runtime filtering: a join-derived DPP filter shrinks the " +
    "generated ranges before any reader runs") {
    // The V2 analogue of SourcesSpec's file-source DPP proof: the dim
    // side's selective filter becomes a dynamic-pruning subquery whose
    // key set reaches RangeScan.filter() as an In filter at execution
    // start; planInputPartitions() then regenerates ONLY the surviving id
    // runs. Without runtime filtering, the scan would emit all 100k rows
    // into the join; the scan's own numOutputRows metric proves it read
    // the 3 dim keys instead — corpus-size-independent fact I/O.
    val dimDir =
      java.nio.file.Files.createTempDirectory("graft_rt_dim").toString
    spark.range(0, 1000).selectExpr("id AS k",
        "CASE WHEN id IN (7, 4242, 99999) OR id IN (17, 23) " +
          "THEN 'hit' ELSE 'miss' END AS cat")
      .union(spark.createDataFrame(Seq((4242L, "hit"), (99999L, "hit")))
        .toDF("k", "cat"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.format("graft.sources.RangeSource")
      .option("rows", 100000).option("partitions", 8).load()
    val dim = spark.read.parquet(dimDir).filter(col("cat") === "hit")
    val joined = fact.join(dim, col("id") === col("k"))
      .select(col("id"), col("sq"))
    val rows = joined.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(7L, 17L, 23L, 4242L,
      99999L), rows.mkString(","))
    val exec = joined.queryExecution.executedPlan
    // AQE wraps stages in leaf nodes; unwrap to reach the physical scan.
    def findScan(p: org.apache.spark.sql.execution.SparkPlan)
        : Option[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScan(q.plan)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.RangeScan] => Some(b)
        case other => other.children.iterator.map(findScan)
          .collectFirst { case Some(s) => s }
      }
    val scan = findScan(exec)
      .getOrElse(fail("no RangeScan BatchScanExec in:\n" + exec))
    assert(scan.runtimeFilters.nonEmpty,
      "no runtime filter was planned on the range scan:\n" + exec)
    val out = scan.metrics("numOutputRows").value
    assert(out == 5,
      s"scan emitted $out rows — runtime filter did not shrink the ranges")
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

  // ---- micro-batch streaming half (MicroBatchStream) -----------------

  private def streamRanged(rows: Long, perBatch: Long, parts: Int = 4) =
    spark.readStream.format("graft.sources.RangeSource")
      .option("rows", rows).option("rowsPerBatch", perBatch)
      .option("partitions", parts).load()

  test("streaming read drains the range across multiple micro-batches") {
    val name = "range_stream_conf"
    val q = streamRanged(1000, 256)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // all rows exactly once, values intact
    val got = spark.table(name)
    assert(got.count() == 1000)
    assert(got.agg(min("id"), max("id"), sum("sq")).collect()(0) match {
      case r => r.getLong(0) == 0 && r.getLong(1) == 999 &&
        r.getLong(2) == (0L until 1000L).map(i => i * i).sum
    })
    // AvailableNow drained in ceil(1000/256) = 4 data batches — the
    // native SupportsTriggerAvailableNow path, not a one-shot snapshot
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 4, q.recentProgress.map(_.numInputRows).mkString(","))
  }

  test("streaming restart resumes from the checkpointed offset (no replay)") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("range_restart_out").toString
    val ckpt = Files.createTempDirectory("range_restart_ckpt").toString
    def run(): Unit = {
      val q = streamRanged(900, 300)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run() // drains fully
    run() // restart against the same checkpoint: offsets say "done"
    val got = spark.read.parquet(out)
    assert(got.count() == 900, "restart must not re-deliver committed offsets")
    assert(got.select(countDistinct("id")).collect()(0).getLong(0) == 900)
  }

  test("streaming offsets are the id-domain longs in the checkpoint log") {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("range_offsets_ckpt").toString
    val q = streamRanged(500, 200)
      .writeStream.format("memory").queryName("range_offsets")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // last committed offset file carries the bare long 500 (= hi)
    val offsets = new java.io.File(s"$ckpt/offsets").listFiles()
      .filter(!_.getName.startsWith(".")).sortBy(_.getName.toInt)
    val last = new String(Files.readAllBytes(offsets.last.toPath))
    assert(last.linesIterator.toSeq.last.trim == "500", last)
  }
}
