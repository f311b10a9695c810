package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 table provider — the engine's custom-source
  * extension surface, exercising the full connector contract the built-in
  * formats use:
  *
  *   - `TableProvider` → `Table` → `ScanBuilder` → `Scan` → `Batch` →
  *     `InputPartition`/`PartitionReaderFactory` (the DSv2 read lifecycle);
  *   - **filter pushdown** (`SupportsPushDownFilters`): id-range predicates
  *     are consumed by the source and shrink the generated ranges — the
  *     same contract Parquet uses for row-group pruning;
  *   - **column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *     materializes only requested columns;
  *   - **limit pushdown** (`SupportsPushDownLimit`): a LIMIT after fully
  *     consumed filters caps the generated range (partially-pushed: the
  *     engine keeps its Limit operator);
  *   - **aggregate pushdown** (`SupportsPushDownAggregates`): ungrouped
  *     COUNT(*)/MIN(id)/MAX(id) are answered closed-form with zero row
  *     generation — the contract parquet footers serve with row-group
  *     stats; complete pushdown, so no Aggregate node survives;
  *   - **partition planning**: the row range splits into `partitions`
  *     slices, each read by an independent `PartitionReader` — the unit the
  *     scheduler distributes across a cluster;
  *   - **micro-batch streaming** (`MicroBatchStream`): the same range
  *     replays as a deterministic multi-batch stream — offset tracking in
  *     the id domain, `rowsPerBatch` admission per trigger, per-batch
  *     partition planning, restart-safe offset recovery (the read-side
  *     twin of AuditSink's `StreamingWrite`).
  *
  * The table itself is a deterministic synthetic relation
  * `(id BIGINT, sq BIGINT, hex STRING)` with `sq = id*id`,
  * `hex = hex(id)` — engine-checkable without any external system, which
  * is what makes it a good conformance fixture for the connector path.
  *
  * Usage: `spark.read.format("graft.sources.RangeSource")
  *   .option("rows", 1000).option("partitions", 4).load()`
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getInt("buckets", 0) > 0) RangeSource.bucketedSchema
    else RangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val buckets = properties.getOrDefault("buckets", "0").toInt
    if (buckets > 0)
      new RangeBucketedTable(
        properties.getOrDefault("rows", "1000").toLong, buckets)
    else
      new RangeTable(
        properties.getOrDefault("rows", "1000").toLong,
        properties.getOrDefault("partitions", "4").toInt,
        properties.getOrDefault("rowsPerBatch", "1000").toLong)
  }
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("hex", StringType, nullable = false)))

  /** Bucketed mode adds the PARTITION KEY column: bkt = id % buckets. */
  val bucketedSchema: StructType =
    schema.add(StructField("bkt", LongType, nullable = false))

  /** Balanced split of [lo, hi) into at most `partitions` slices WITHOUT
    * the i*n intermediate product, which would overflow Long once
    * n > Long.MaxValue/slices: the first (n % slices) partitions take one
    * extra row. Shared by the batch scan and the micro-batch stream —
    * partition planning is the same job either way. */
  def slices(lo: Long, hi: Long, partitions: Int): Array[InputPartition] = {
    val n = math.max(0L, hi - lo)
    if (n == 0) return Array.empty
    val k = math.min(partitions.toLong, n).toInt
    val base = n / k
    val rem = n % k
    (0 until k).map { i =>
      val start = lo + base * i + math.min(i.toLong, rem)
      val end = start + base + (if (i < rem) 1L else 0L)
      RangePartition(start, end): InputPartition
    }.toArray
  }
}

class RangeTable(rows: Long, partitions: Int, rowsPerBatch: Long)
  extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(rows, partitions, rowsPerBatch)
}

/** Consumes id-range filters (start/end tightening), prunes columns, and
  * accepts limit pushdown. */
class RangeScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownLimit
  with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema
  private var aggRow: Option[Seq[Any]] = None
  private var aggSchema: StructType = new StructType()

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: Long) | GreaterThan("id", _: Long) |
           GreaterThanOrEqual("id", _: Long) | LessThan("id", _: Long) |
           LessThanOrEqual("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      // v + 1 guards: at Long.MaxValue the increment wraps negative, and an
      // accepted filter is never re-checked by Spark — it must be exact.
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v)
        if (v < Long.MaxValue) hi = math.min(hi, v + 1)
      case GreaterThan("id", v: Long) =>
        lo = if (v == Long.MaxValue) Long.MaxValue else math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) =>
        if (v < Long.MaxValue) hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies anything the source didn't fully handle
  }

  override def pushedFilters(): Array[Filter] = pushed

  // Limit pushdown: Spark offers the limit only after filter pushdown, and
  // every accepted id-range filter is applied EXACTLY by range tightening,
  // so all rows in [lo, hi) qualify — the first `limit` of them is the
  // contiguous prefix [lo, lo+limit). Declared partially-pushed so Spark
  // keeps its own Limit operator (the source guarantee is "at most", the
  // operator enforces "exactly" — the standard contract; at 100 TB this is
  // what turns `LIMIT 20` exploration on a petabyte table into a
  // single-partition read).
  override def pushLimit(limit: Int): Boolean = {
    if (hi - lo > limit) hi = lo + limit
    true
  }
  override def isPartiallyPushed: Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // Aggregate pushdown: COUNT(*) / MIN(id) / MAX(id) have closed forms on
  // a range whose accepted filters are applied exactly — the source
  // answers them with ZERO row generation. This is the same contract
  // parquet footers serve (row-group stats answering min/max/count without
  // decoding data); on a real connector it's what turns a full-table
  // COUNT(*) into a metadata read. Spark is told the pushdown is COMPLETE,
  // so no Aggregate node survives in the plan — the scan returns the one
  // result row. SUM is deliberately NOT accepted: its overflow semantics
  // (wrap vs ANSI error) belong to the engine, not the source.
  private def aggValue(f: AggregateFunc): Option[Any] = {
    val empty = hi <= lo
    f match {
      case _: CountStar => Some(math.max(0L, hi - lo))
      case m: Min => m.column match {
        case r: NamedReference if r.fieldNames.sameElements(Array("id")) =>
          Some(if (empty) null else lo)
        case _ => None
      }
      case m: Max => m.column match {
        case r: NamedReference if r.fieldNames.sameElements(Array("id")) =>
          Some(if (empty) null else hi - 1)
        case _ => None
      }
      case _ => None
    }
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.forall(aggValue(_).isDefined)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggRow = Some(agg.aggregateExpressions.toSeq.map(aggValue(_).get))
    // After a complete pushdown Spark asserts readSchema() == the
    // aggregate's output schema (positional): one column per function.
    aggSchema = StructType(agg.aggregateExpressions.toSeq.map {
      case _: CountStar => StructField("count_star", LongType, nullable = false)
      case m: Min => StructField("min_id", LongType, nullable = true)
      case _ => StructField("max_id", LongType, nullable = true)
    })
    true
  }

  override def build(): Scan = aggRow match {
    case Some(values) => new RangeAggScan(lo, hi, values, aggSchema)
    case None => new RangeScan(lo, hi, partitions, rowsPerBatch, required)
  }
}

/** Single-row scan returning completely-pushed aggregate results. Spark
  * supplies the result schema via pruneColumns after pushAggregation. */
class RangeAggScan(lo: Long, hi: Long, values: Seq[Any], required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RangeScan agg lo=$lo hi=$hi pushed=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RangePartition(0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeAggReaderFactory(values)
}

class RangeAggReaderFactory(values: Seq[Any])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
}

class RangeScan(lo: Long, hi: Long, partitions: Int, rowsPerBatch: Long,
    required: StructType)
  extends Scan with Batch with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"RangeScan lo=$lo hi=$hi cols=[${required.fieldNames.mkString(",")}]"

  // ---- runtime filtering (the V2 analogue of dynamic partition pruning):
  // Spark plans a DPP subquery over the join's other side, evaluates it at
  // execution start, and hands the key set to `filter()` as an In filter;
  // the exec node then RE-plans input partitions, so the generated ranges
  // shrink to the surviving id runs before any reader is created. The
  // compile-time [lo, hi) stays immutable — runtime state lives beside it
  // and only ever narrows. Unhandled runtime filters are safely ignored
  // (the join re-applies its own condition; runtime pruning is an access-
  // path optimization, never a semantics carrier).
  private var rtLo: Long = lo
  private var rtHi: Long = hi // exclusive
  private var rtIds: Option[Array[Long]] = None // sorted surviving ids

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) =>
      val incoming = vs.iterator.collect { case v: Long => v }
        .filter(v => v >= rtLo && v < rtHi).toArray.sorted
      rtIds = Some(rtIds match {
        case Some(prev) => // repeated runtime filters intersect
          val p = prev.toSet; incoming.filter(p.contains)
        case None => incoming
      })
    case EqualTo("id", v: Long) =>
      rtLo = math.max(rtLo, v)
      if (v < Long.MaxValue) rtHi = math.min(rtHi, v + 1)
    case GreaterThan("id", v: Long) =>
      rtLo = if (v == Long.MaxValue) Long.MaxValue else math.max(rtLo, v + 1)
    case GreaterThanOrEqual("id", v: Long) => rtLo = math.max(rtLo, v)
    case LessThan("id", v: Long) => rtHi = math.min(rtHi, v)
    case LessThanOrEqual("id", v: Long) =>
      if (v < Long.MaxValue) rtHi = math.min(rtHi, v + 1)
    case _ => ()
  }

  /** Surviving ids coalesced into maximal contiguous [start, end) runs —
    * one partition per run (run count is bounded by the DPP key-set size,
    * the same granularity file-source DPP prunes at). */
  private def idRuns(ids: Array[Long]): Array[InputPartition] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < ids.length) {
      val start = ids(i)
      var end = start + 1
      i += 1
      while (i < ids.length && ids(i) == end) { end += 1; i += 1 }
      runs += ((start, end))
    }
    runs.map { case (a, b) => RangePartition(a, b): InputPartition }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    rtIds match {
      case Some(ids) =>
        idRuns(ids.filter(v => v >= rtLo && v < rtHi))
      case None => RangeSource.slices(rtLo, rtHi, partitions)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)

  /** The STREAMING half of the read lifecycle (SURVEY round-8 seam):
    * `readStream.format(...)` plans this instead of `toBatch`. Offsets
    * live in the id domain, so the accepted filter-tightened [lo, hi)
    * range bounds the stream exactly like the batch scan — accepted
    * filters are never re-checked by Spark, streaming or not. */
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, partitions, rowsPerBatch, required)
}

/** Offset = the exclusive upper id delivered so far. JSON form is the
  * bare long — what lands in the checkpoint's offset log. */
case class RangeStreamOffset(n: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

/** Micro-batch stream over the id range: each trigger admits up to
  * `rowsPerBatch` new ids, so a bounded table replays as a deterministic
  * multi-batch stream (the conformance shape `range_stream_exec` grades).
  * The checkpointed offset log is the single source of truth — the
  * stream holds NO mutable cursor:
  *   - admission control (`latestOffset(start, limit)`) is a pure
  *     function of the engine-supplied start offset, stepping
  *     `rowsPerBatch` (or the engine's ReadLimit) toward `hi` — restart
  *     recovery is automatic because the replayed start comes from the
  *     checkpoint, never from instance memory;
  *   - `SupportsTriggerAvailableNow` is declared natively: the range is
  *     bounded and latestOffset converges on `hi`, so AvailableNow
  *     drains the whole table across multiple batches (Spark's generic
  *     wrapper would instead snapshot ONE latestOffset — a single
  *     rowsPerBatch batch — as the target);
  *   - `planInputPartitions(start, end)` splits [start, end) with the
  *     same balanced slicing as the batch scan — per-batch partition
  *     planning is the distributable unit either way;
  *   - `commit` is a no-op: the source is synthetic/replayable, nothing
  *     upstream needs acknowledging (a log-backed source would trim
  *     here). */
class RangeMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    rowsPerBatch: Long, required: StructType)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  require(rowsPerBatch > 0, "rowsPerBatch must be positive")

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  override def initialOffset(): Offset = RangeStreamOffset(lo)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RangeStreamOffset].n
    val step = limit match {
      case mr: ReadMaxRows => mr.maxRows()
      case _ => rowsPerBatch
    }
    // overflow-safe cap: hi - s is always a valid Long gap here
    RangeStreamOffset(if (hi - s > step) s + step else hi)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def deserializeOffset(json: String): Offset =
    RangeStreamOffset(json.trim.toLong)

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] =
    RangeSource.slices(
      start.asInstanceOf[RangeStreamOffset].n,
      end.asInstanceOf[RangeStreamOffset].n,
      partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

// ---- storage-partitioned (bucketed) mode -------------------------------

/** KEY-GROUPED table variant (r15, verdict #3): `.option("buckets", k)`
  * makes the source REPORT its physical layout — every input partition
  * holds exactly the rows of one `bkt = id % k` value and declares that
  * key via `HasPartitionKey`, and the scan reports
  * `KeyGroupedPartitioning(identity(bkt), k)`. Under
  * `spark.sql.sources.v2.bucketing.enabled=true`, a join of two such
  * tables whose join keys cover `bkt` is planned as a STORAGE-
  * PARTITIONED JOIN: Spark aligns the reported partition values and
  * plans NO Exchange on either side — the V2 generalization of Hive
  * bucketing, and the contract Iceberg/Delta bucket transforms ride.
  * A downstream groupBy(bkt) is satisfied by the same reported
  * clustering, so join + aggregate run fully exchange-free
  * (spj_copartition_join grades exactly that plan; at 100 TB this is
  * the difference between a co-partitioned fact-fact join reading in
  * place and double-shuffling two petabyte inputs). */
class RangeBucketedTable(rows: Long, buckets: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_range_bkt($rows,$buckets)"
  override def schema(): StructType = RangeSource.bucketedSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeBucketedScanBuilder(rows, buckets)
}

class RangeBucketedScanBuilder(rows: Long, buckets: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RangeSource.bucketedSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new RangeBucketedScan(rows, buckets, required)
}

class RangeBucketedScan(rows: Long, buckets: Int, required: StructType)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RangeBucketedScan rows=$rows buckets=$buckets " +
      s"cols=[${required.fieldNames.mkString(",")}]"

  // The report that enables SPJ: identity transform over the bkt column,
  // one reported partition per bucket value. numPartitions MUST equal
  // planInputPartitions().length — Spark cross-checks.
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .identity("bkt")),
      buckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets)
      .map(b => RangeBucketPartition(b.toLong, rows, buckets): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeBucketedReaderFactory(required)
}

/** One bucket's rows: ids ≡ bkt (mod buckets), ascending. The declared
  * partition key is what Spark groups/aligns on for SPJ. */
case class RangeBucketPartition(bkt: Long, rows: Long, buckets: Int)
  extends InputPartition
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bkt)
}

class RangeBucketedReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[RangeBucketPartition]
    new PartitionReader[InternalRow] {
      private var cur = bp.bkt - bp.buckets
      private val cols = required.fieldNames
      override def next(): Boolean = { cur += bp.buckets; cur < bp.rows }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => cur
          case "sq" => cur * cur
          case "hex" => UTF8String.fromString(java.lang.Long.toHexString(cur))
          case "bkt" => bp.bkt
        })
      override def close(): Unit = ()
    }
  }
}

case class RangePartition(start: Long, end: Long) extends InputPartition

class RangeReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rp = p.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = rp.start - 1
      private val cols = required.fieldNames
      override def next(): Boolean = { cur += 1; cur < rp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => cur
          case "sq" => cur * cur
          case "hex" => UTF8String.fromString(java.lang.Long.toHexString(cur))
        })
      override def close(): Unit = ()
    }
  }
}
