package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The r13 two-phase prefix-sum device must be OUTPUT-IDENTICAL to the
  * single bounded-key window it replaces — on adversarial inputs:
  * duplicate order keys across buckets, empty parts, bucket-edge ids,
  * values of zero. The re-planned contract keys are hash-gated by
  * golden/oracle; this spec pins the device itself so a future caller
  * can't misuse it silently. */
class TwoPhaseSpec extends SparkSpec {

  private lazy val rows = {
    import spark.implicits._
    // deterministic pseudo-random rows: parts of very different sizes,
    // ids straddling idBucket edges for domainMax = 1000
    (0 until 700).map { i =>
      val part = if (i % 7 == 0) "a" else if (i % 3 == 0) "b" else "c"
      val id = (i * 37 + (i % 5) * 211) % 1000
      (part, id.toLong, (i % 4).toLong)
    }.toDF("part", "id", "v")
      // duplicate ids within a part collapse to one row so the order key
      // is unique (the device's callers all order by a unique key)
      .groupBy(col("part"), col("id")).agg(max(col("v")).as("v"))
  }

  test("bucketedPrefixSum over idBucket == plain window prefix sum") {
    val w = Window.partitionBy(col("part")).orderBy(col("id"))
    val expected = rows
      .withColumn("cum", sum(col("v")).over(w))
      .select(col("part"), col("id"), col("cum"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val got = graft.queries.core.bucketedPrefixSum(rows, Seq("part"),
      graft.queries.core.idBucket(col("id"), 1000L), Seq(col("id")),
      col("v"), "cum")
      .select(col("part"), col("id"), col("cum"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == expected)
  }

  test("bucketedRowNumber over md5Bucket == row_number, totals exact") {
    val keyed = rows.withColumn("pri", md5(col("id").cast("string")))
    val w = Window.partitionBy(col("part"))
    val expected = keyed
      .withColumn("rk",
        row_number().over(w.orderBy(col("pri"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .select(col("part"), col("id"), col("rk"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val got = graft.queries.core.bucketedRowNumber(keyed, Seq("part"),
      graft.queries.core.md5Bucket(col("pri")),
      Seq(col("pri"), col("id")), "rk", Some("n"))
      .select(col("part"), col("id"), col("rk"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
  }

  test("idBucket is order-preserving and bounded") {
    val ids = (0L to 1000L).toSeq
    import spark.implicits._
    val b = ids.toDF("id")
      .select(col("id"), graft.queries.core.idBucket(col("id"), 1000L)
        .as("bkt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(b.sortBy(_._1).map(_._2).sliding(2).forall(
      p => p.head <= p.last), "bucket not monotone in id")
    assert(b.map(_._2).distinct.length <= graft.queries.core.PrefixBuckets)
  }
}
