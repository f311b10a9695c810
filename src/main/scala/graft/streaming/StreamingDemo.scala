package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupStateTimeout, ListState, MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.queries.core.{dbl, dec}

/** Mutable per-user state for the custom stateful operator. */
case class UserState(n: Long, sum: Double)

/** Spark-4 StatefulProcessor: per-user running totals in a named typed
  * ValueState handle (no TTL — totals are cumulative by design; pass a
  * TTLConfig duration to age state out instead). */
class UserTotalsProcessor
  extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
  @transient private var totals: ValueState[UserState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserState](
      "totals", Encoders.product[UserState], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var s = if (totals.exists()) totals.get() else UserState(0L, 0.0)
    rows.foreach(r => s = UserState(s.n + 1, s.sum + r._2))
    totals.update(s)
    Iterator((key, s.n, s.sum))
  }
}

/** Warm-start variant of UserTotalsProcessor: per-key state is SEEDED
  * from a batch-computed dataset before the first micro-batch — the
  * migration path from an existing batch job's output into a live
  * stream without reprocessing history (at 100 TB, reprocessing is not
  * an option; the initial-state feed is how cutover works). */
class UserTotalsWithInitProcessor
  extends StatefulProcessorWithInitialState[
    Long, (Long, Double), (Long, Long, Double), UserState] {
  @transient private var totals: ValueState[UserState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserState](
      "totals", Encoders.product[UserState], TTLConfig.NONE)

  override def handleInitialState(
      key: Long, initial: UserState, timerValues: TimerValues): Unit =
    totals.update(initial)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var s = if (totals.exists()) totals.get() else UserState(0L, 0.0)
    rows.foreach(r => s = UserState(s.n + 1, s.sum + r._2))
    totals.update(s)
    Iterator((key, s.n, s.sum))
  }
}

/** The remaining transformWithState state primitives in one processor —
  * ListState (ordered per-key event log), MapState (per-key sub-keyed
  * counters), and an EVENT-TIME TIMER: the first row for a key arms a
  * timer at first-event-time + 1 h; when the watermark passes it, the
  * session summary (event count from the list, distinct types from the
  * map) is emitted and ALL state cleared — the arm/expire/clear cycle
  * behind TTL-style session emission at scale, where state must not
  * outlive its horizon. Emission happens ONLY from the timer path, so
  * output timing is a pure function of event times and watermark — no
  * wall clock anywhere. */
class SessionAuditProcessor
  extends StatefulProcessor[Long, (Long, String, Long), (Long, Long, Long)] {
  @transient private var times: ListState[Long] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    times = getHandle.getListState[Long](
      "times", Encoders.scalaLong, TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val hadState = times.exists()
    var firstTs = Long.MaxValue
    rows.foreach { r =>
      firstTs = math.min(firstTs, r._3)
      times.appendValue(r._3)
      val c = if (counts.containsKey(r._2)) counts.getValue(r._2) else 0L
      counts.updateValue(r._2, c + 1L)
    }
    if (!hadState && firstTs != Long.MaxValue)
      getHandle.registerTimer(firstTs + 3600000L)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    val n = times.get().size.toLong
    val distinctTypes = counts.keys().size.toLong
    times.clear()
    counts.clear()
    Iterator((key, n, distinctTypes))
  }
}

/** Structured Streaming execution of the engine's event-stream semantics
  * (SURVEY.md §2.9 / §7.5).
  *
  * The same declarative aggregations that run in batch (EventsQ) run here
  * over an unbounded source — that interchangeability is the point of
  * expressing stream logic as `window()`/`session_window()` compositions.
  * Batch queries stay the oracle-checkable contract; these transforms are
  * exercised by StreamingSpec over MemoryStream with watermarks, including
  * a late-data drop.
  *
  * At scale: watermark state is keyed by (window × event_type) or
  * (user × session) — high-cardinality, shard-able; `Trigger.AvailableNow`
  * gives catch-up batch runs with the same state semantics.
  */
object StreamingDemo {

  /** Tumbling 1-hour counts/sums per event type (append-able once the
    * watermark passes the window end). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dec(col("value"), 14, 4))).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour / 15-minute windows. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Custom keyed state (flatMapGroupsWithState): running per-user event
    * count + value total, updated across micro-batches. This is the escape
    * hatch when window()/session_window() can't express the state machine;
    * state is sharded by user_id, the high-cardinality key. */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, (Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var s = state.getOption.getOrElse(UserState(0L, 0.0))
          rows.foreach(r => s = UserState(s.n + 1, s.sum + r._2))
          state.update(s)
          Iterator((uid, s.n, s.sum))
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  /** The same running totals on Spark 4's transformWithState — the
    * successor state API (typed named state handles, TTL support, timers,
    * initial-state feeds; requires the RocksDB state store provider, which
    * is also the provider you run at 100 TB for state beyond executor
    * heap). Output is identical to `runningUserTotals` by construction;
    * StreamingSpec asserts both cross-batch accumulation and agreement
    * with the flatMapGroupsWithState formulation. */
  def runningUserTotalsTws(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "sum_value")
  }

  /** runningUserTotalsTws warm-started from a batch-computed seed:
    * `initialState` rows land in each key's state via
    * handleInitialState before the first micro-batch processes input. */
  def runningUserTotalsWarmStart(
      events: DataFrame,
      seed: org.apache.spark.sql.Dataset[(Long, UserState)]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsWithInitProcessor,
        TimeMode.None(), OutputMode.Update(),
        seed.groupByKey(_._1).mapValues(_._2))
      .toDF("user_id", "n_events", "sum_value")
  }

  /** SessionAuditProcessor wired to a stream: event-time mode (timers
    * fire off the watermark), append output (emission only on expiry). */
  def sessionAudit(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .select(col("user_id").cast("long"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionAuditProcessor,
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "n_types")
  }

  /** Native session windows (30-minute gap) per user — the streaming twin
    * of the batch lag/cumsum sessionization. */
  def sessions30m(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        dbl(sum(dec(col("value"), 14, 4))).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))
}
