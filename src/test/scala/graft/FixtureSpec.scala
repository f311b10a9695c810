package graft

import org.apache.spark.sql.types._

/** Fixture-contract regression gate (round-6, after the silent 2026-08-13
  * regeneration flipped `events.ts` from TIMESTAMP(NANOS) to timestamp[us]
  * and broke 46 keys in 46 confusing places). One spec, three jobs:
  *
  *   1. Pin the LOGICAL schema every query compiles against, per table, at
  *      every sf tier — a regenerated fixture that drifts fails loudly here
  *      first, naming the table and tier.
  *   2. Allow BOTH known physical vintages of `events.ts` (Long nanos under
  *      `nanosAsLong`, or timestamp[us]/NTZ) — the loader normalizes either
  *      to the same `ts: timestamp` + `ts_us: bigint` surface, and this
  *      spec is what certifies that normalization instead of a vintage.
  *   3. Sanity-pin the VALUE range of `ts_us` (2024 epoch-micros) so a unit
  *      slip (ms vs µs vs ns — the exact class of bug a vintage flip can
  *      smuggle in) cannot pass as a schema match.
  */
class FixtureSpec extends SparkSpec {

  private val tiers =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for (tier <- tiers; (name, fields) <- expected.toSeq.sortBy(_._1)) {
    test(s"$name schema pinned at $tier") {
      val got = Tables(spark, tier, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == fields, s"$name@$tier drifted: $got")
    }
  }

  for (tier <- tiers) {
    test(s"events physical vintage is known and normalizes at $tier") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawTs = spark.read.parquet(s"$tier/events.parquet").schema("ts")
      assert(
        rawTs.dataType == LongType ||
          rawTs.dataType == TimestampNTZType ||
          rawTs.dataType == TimestampType,
        s"unknown events.ts vintage at $tier: ${rawTs.dataType} — " +
          "teach Tables.scala the new vintage before any query touches it")

      val e = Tables(spark, tier, "events")
      val norm = e.schema.map(f => f.name -> f.dataType).toMap
      assert(norm("ts") == TimestampType, s"ts not normalized: ${norm("ts")}")
      assert(norm("ts_us") == LongType, s"ts_us not long: ${norm("ts_us")}")
      assert(norm("event_id") == LongType && norm("user_id") == LongType &&
        norm("event_type") == StringType && norm("value") == DoubleType &&
        norm("props") == StringType, s"events cols drifted: $norm")
    }
  }

  test("ts_us unit is epoch MICROseconds in 2024 (no ms/ns slip)") {
    import org.apache.spark.sql.functions._
    val r = Tables(spark, sf, "events")
      .agg(min("ts_us"), max("ts_us"), count(lit(1))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    // 2024-01-01T00:00Z .. 2025-01-01T00:00Z in epoch-micros.
    assert(lo >= 1704067200000000L && hi < 1735689600000000L,
      s"ts_us out of 2024 µs range: [$lo, $hi] — unit slip or data drift")
    assert(r.getLong(2) > 0)
  }

  test("ts and ts_us agree (ts is exactly timestamp_micros(ts_us))") {
    import org.apache.spark.sql.functions._
    val bad = Tables(spark, sf, "events")
      .filter(unix_micros(col("ts")) =!= col("ts_us")).count()
    assert(bad == 0, s"$bad rows where ts != timestamp_micros(ts_us)")
  }
}
