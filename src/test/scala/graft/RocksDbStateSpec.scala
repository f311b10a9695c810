package graft

import scala.io.Source

/** §2.19 under the RocksDB state store (VERDICT r6 next-steps #5).
  *
  * The default HDFS-backed state store keeps every key's state on the JVM
  * heap — fine at test scale, but a 100 TB/day streaming deployment runs
  * RocksDB, where state lives off-heap/on-disk and is bounded by local
  * storage instead of executor memory. The provider is a pluggable
  * PHYSICAL layer under the same logical operators, so swapping it must
  * not change one output row. This suite proves that for every §2.19
  * streaming-execution key by re-running the real engine (file source →
  * micro-batches → stateful operator → sink) with
  * `spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider`
  * and hash-matching the SAME sf0.001 goldens the default-store runs (and
  * the DuckDB oracles) certify. Each StreamQ invocation creates a fresh
  * checkpoint, so the provider choice genuinely applies to the run — a
  * checkpoint never mixes providers.
  *
  * Covers the whole state-store surface area: windowed aggregation
  * (tumble), session windows, dropDuplicates state, symmetric-hash join
  * state, watermark late-drop, dropDuplicatesWithinWatermark eviction,
  * and flatMapGroupsWithState user state.
  */
class RocksDbStateSpec extends SparkSpec {

  private val golden: Map[String, (Int, String)] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/golden_sf0.001.tsv"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val Array(n, c, h) = l.split("\t")
      n -> (c.toInt, h)
    }.toMap finally src.close()
  }

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  for ((name, fn) <- graft.queries.StreamQ.queries.toSeq.sortBy(_._1)) {
    test(s"$name produces the golden result under RocksDB state store") {
      withConfs(providerKey -> rocksDb) {
        val rows = fn(spark, sf).collect()
        val (expN, expH) = golden(name)
        assert(rows.length == expN,
          s"row count ${rows.length} != golden $expN under RocksDB")
        assert(GoldenGen.digest(rows) == expH,
          "content hash != golden under RocksDB state store")
      }
    }
  }

  test("changelog checkpointing axis: session windows under RocksDB " +
      "with per-batch changelog commits match the golden") {
    // Changelog checkpointing is the production RocksDB configuration —
    // each commit uploads the batch's delta instead of a full snapshot,
    // turning per-batch commit cost from O(state) to O(changed keys).
    // Like the provider itself it is a physical-layer choice, so the
    // result must be bit-identical.
    val clKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    withConfs(providerKey -> rocksDb, clKey -> "true") {
      val rows = graft.queries.StreamQ
        .queries("stream_session_exec")(spark, sf).collect()
      val (expN, expH) = golden("stream_session_exec")
      assert(rows.length == expN && GoldenGen.digest(rows) == expH,
        "changelog-checkpointed run must match the golden")
    }
  }
}
