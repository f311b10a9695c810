package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Boundary-TIE pin for the watermark protocol the three §2.19 goldens
  * (`late_data_exec`, `stream_dedup_wm_exec`, `stream_state_exec` — see
  * StreamQ.oracle) encode: the fixture corpora never place a window end
  * EXACTLY on a watermark, so the oracles' inclusive/exclusive boundary
  * choices were calibrated but not tie-exercised. This spec manufactures
  * the tie with a synthetic hour-aligned max event time and asserts the
  * engine's rule at each boundary:
  *
  *   - EMISSION tie: a window whose end == the advanced watermark IS
  *     emitted (and its state evicted) — the oracle's inclusive
  *     `we <= gmax − delay` filter is the engine's rule, not an
  *     approximation;
  *   - LATE-INPUT tie: a row whose window closed exactly AT the starting
  *     watermark is DROPPED (oracle keeps rows via strict
  *     `we > prevmax − delay`), and is not merged into already-emitted
  *     state;
  *   - EVENT-TIME tie: a row timestamped exactly AT the watermark is
  *     KEPT (the late filter is strict `ts < watermark`).
  *
  * Spark-version coupling: these rules (and the two-watermark micro-batch
  * protocol the goldens replay) are Spark ≥3.4 behavior, verified on the
  * 4.1 line this repo builds against. If this spec fails after a Spark
  * upgrade, the engine's boundary protocol changed — recalibrate the three
  * StreamQ.oracle goldens BEFORE trusting any §2.19 hash. */
class WatermarkTieSpec extends SparkSpec {

  private def hts(h: Int, m: Int = 0, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$sec%02d")

  test("exact watermark/window-end ties: emit-inclusive, drop-inclusive, " +
      "event-time-exclusive (protocol pin for the §2.19 goldens)") {
    assert(spark.version.startsWith("4."),
      s"goldens calibrated on Spark 4.x; running ${spark.version} — " +
        "recalibrate StreamQ.oracle before trusting §2.19 hashes")
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = graft.streaming.StreamingDemo.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tie_pin")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def rows() = spark.table("tie_pin")
      .select("bucket", "n", "sum_value").as[(Timestamp, Long, Double)]
      .collect().sortBy(_._1.getTime).toList
    // Batch 1: 08:30 plus a max event at EXACTLY 10:00:00 → the advanced
    // watermark is 09:00:00.000, the exact end of window [08:00, 09:00).
    mem.addData(Ev(hts(8, 30), 1, "view", 1.0), Ev(hts(10), 1, "view", 1.0))
    q.processAllAvailable()
    // EMISSION tie: [08:00,09:00) end == watermark → already emitted.
    assert(rows() == List((hts(8), 1L, 1.0)),
      s"window end == watermark must emit (inclusive); got ${rows()}")
    // Batch 2 under starting watermark 09:00: a late row whose window end
    // ties the watermark, and an on-time row exactly AT the watermark.
    mem.addData(Ev(hts(8, 45), 2, "view", 100.0), Ev(hts(9), 3, "view", 7.0))
    q.processAllAvailable()
    // LATE tie dropped: hour-8 stays (n=1, sum=1.0) — the 100.0 never lands.
    assert(rows() == List((hts(8), 1L, 1.0)),
      s"late row with window end == starting watermark must drop; got ${rows()}")
    // Batch 3: advance far enough to close every remaining window.
    mem.addData(Ev(hts(23), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    // EVENT-TIME tie kept: the 09:00:00 row aggregated into [09:00,10:00).
    assert(rows() == List(
      (hts(8), 1L, 1.0), (hts(9), 1L, 7.0), (hts(10), 1L, 1.0)),
      s"row at ts == watermark must be kept; got ${rows()}")
  }
}
