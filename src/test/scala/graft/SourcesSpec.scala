package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the contract's parquet tables: CSV and JSON
  * round-trips with explicit schemas, and hive-style partitioned parquet
  * writes whose reads prune partitions (the 100 TB layout pattern — date /
  * key partition dirs so scans touch only matching directories). */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV round-trip preserves rows and schema (header + explicit schema)") {
    val dir = tmp("graft_csv")
    val src = Tables(spark, sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("JSON round-trip preserves rows") {
    val dir = tmp("graft_json")
    val src = Tables(spark, sf, "region")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("ORC round-trip preserves rows; filters push to the ORC scan") {
    val dir = tmp("graft_orc")
    val src = Tables(spark, sf, "supplier")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("s_suppkey").collect().toSeq ==
      src.orderBy("s_suppkey").collect().toSeq)
    val filtered = back.filter(col("s_suppkey") < 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(s_suppkey), " +
      "LessThan(s_suppkey,10)"), plan.take(800))
  }

  test("native XML: from_xml parses typed fields out of an xml column") {
    // Spark 4 ships the donated spark-xml as a built-in expression family.
    val xml = Tables(spark, sf, "region").select(
      col("r_regionkey"),
      concat(lit("<row><k>"), col("r_regionkey"),
        lit("</k><n>"), col("r_name"), lit("</n></row>")).as("x"))
    val parsed = xml.select(col("r_regionkey"),
      from_xml(col("x"), lit("STRUCT<k: BIGINT, n: STRING>")).as("p"))
      .select(col("r_regionkey"), col("p.k"), col("p.n"))
    val rows = parsed.orderBy("r_regionkey").collect()
    assert(rows.map(_.getLong(1)).toSeq ==
      rows.map(_.getAs[Number](0).longValue).toSeq)
    assert(rows.forall(r => r.getString(2).nonEmpty))
  }

  test("partitioned parquet write → partition-pruned read") {
    val dir = tmp("graft_part")
    Tables(spark, sf, "orders")
      .withColumn("oyear", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("oyear").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("oyear") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(oyear"),
      s"expected partition filters in plan:\n$plan")
    val expected = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() == expected)
  }

  test("statsRowCount is a footer-statistics read (pushed COUNT) and " +
    "matches the scan count") {
    val n = Tables.statsRowCount(spark, sf, "embeddings")
    assert(n == Tables(spark, sf, "embeddings").count())
    // plan proof that the v2 path answers count(*) from row-group stats
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val pv = spark.conf.get(v1Key)
    val pa = spark.conf.get(aggKey)
    try {
      spark.conf.set(v1Key, "")
      spark.conf.set(aggKey, "true")
      val plan = spark.read.parquet(s"$sf/embeddings.parquet")
        .groupBy().count().queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)]"),
        "count(*) was not answered from parquet footers:\n" +
          plan.take(800))
    } finally {
      spark.conf.set(v1Key, pv)
      spark.conf.set(aggKey, pa)
    }
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // The 100 TB star-join pattern: the fact table is partitioned on the
    // join key, the dimension filter is only known at plan time on the DIM
    // side — DPP injects the dim's key set as a runtime partition filter
    // into the fact scan, so only matching partitions are read.
    val dir = tmp("graft_dpp")
    Tables(spark, sf, "orders")
      .withColumn("oyear", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("oyear").parquet(dir)
    val fact = spark.read.parquet(dir)
    // The dim filter is on a NON-key column, so it cannot be transitively
    // inferred as a static partition filter (Catalyst does that for a
    // direct key predicate) — the fact-side partition set is only known
    // once the dim is evaluated, which is exactly what DPP handles.
    import spark.implicits._
    val dimDir = tmp("graft_dpp_dim")
    (1994 to 2002).map(y => (y, if (y == 1996) "target" else "other"))
      .toDF("oyear", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "target")
    val joined = fact.join(dim, "oyear")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n${plan.take(1500)}")
    val expected = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(joined.count() == expected)
  }

  test("bucketed table write co-locates the join (no shuffle on bucketed side)") {
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_bucketed")
    val joined = spark.table("orders_bucketed")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // aggregation on the bucket key needs no exchange
    assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
      s"bucketed agg should not shuffle:\n$plan")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
  }

  test("fact-fact join on co-bucketed tables plans with no exchange at all") {
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_bo")
    Tables(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_bo")
    val j = spark.table("orders_bo").join(spark.table("lineitem_bo"),
      col("o_orderkey") === col("l_orderkey"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = j.queryExecution.executedPlan.toString
      // both sides pre-bucketed on the join key: the big-table⋈big-table
      // pattern runs with zero shuffle — the 100 TB co-location payoff
      assert(!plan.contains("Exchange"), s"co-bucketed join shuffled:\n$plan")
      assert(j.count() == Tables(spark, sf, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bo")
      spark.sql("DROP TABLE IF EXISTS lineitem_bo")
    }
  }

  test("storage-partitioned join: V2-reported partitioning, no Exchange " +
      "on either side, and the downstream groupBy rides it too") {
    // r15 verdict #3: both scans REPORT KeyGroupedPartitioning(bkt) with
    // HasPartitionKey splits; under v2.bucketing the join aligns the
    // reported partition values instead of shuffling, and the bkt
    // aggregate is satisfied by the same clustering — a fully
    // exchange-free join + aggregate with zero pre-materialized layout.
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // join keys (bkt, id) ⊃ partition keys (bkt): relax the guard
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graft.sources.RangeSource")
        .option("rows", 5000).option("buckets", 8).load()
      val b = spark.read.format("graft.sources.RangeSource")
        .option("rows", 3000).option("buckets", 8).load()
      val j = a.as("a").join(b.as("b"),
          col("a.bkt") === col("b.bkt") && col("a.id") === col("b.id"))
        .groupBy(col("a.bkt").as("bkt"))
        .agg(count(lit(1)).as("n"), sum(col("a.sq")).as("sum_sq_a"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join shuffled:\n$plan")
      // and the result is right: ids 0..2999 match 1:1
      val rows = j.orderBy(col("bkt")).collect()
      assert(rows.map(_.getLong(1)).sum == 3000L)
    }
  }

  test("without the v2.bucketing flag the same join shuffles — the SPJ " +
      "plan is the reported-partitioning payoff, not an accident") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.read.format("graft.sources.RangeSource")
        .option("rows", 5000).option("buckets", 8).load()
      val b = spark.read.format("graft.sources.RangeSource")
        .option("rows", 3000).option("buckets", 8).load()
      val j = a.as("a").join(b.as("b"),
          col("a.bkt") === col("b.bkt") && col("a.id") === col("b.id"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        "control: expected a shuffle with SPJ disabled")
    }
  }

  test("small-file compaction actually reduces the file count") {
    graft.queries.FormatsQ.compactSmallFiles(spark, sf).collect()
    def nParquet(p: String): Int = {
      val fs = Option(new java.io.File(p).listFiles()).getOrElse(Array())
      fs.count(_.getName.endsWith(".parquet"))
    }
    val small  = nParquet(graft.queries.core.scratch(sf, "orders_small"))
    val packed = nParquet(graft.queries.core.scratch(sf, "orders_packed"))
    assert(small > 16, s"fragmented layout expected >16 files, got $small")
    assert(packed <= 2, s"compacted layout expected <=2 files, got $packed")
  }
}
