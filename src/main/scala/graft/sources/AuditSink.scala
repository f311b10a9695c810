package graft.sources

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the engine's DataSource V2 surface — RangeSource
  * exercises the read lifecycle (scan building, pushdowns, partition
  * planning); this sink exercises the connector write contract the
  * built-in file sinks implement:
  *
  *   - `TableProvider` → `SupportsWrite` → `WriteBuilder` → `Write` →
  *     `BatchWrite` → `DataWriterFactory` → `DataWriter` (the DSv2 batch
  *     write lifecycle) plus the streaming half (`StreamingWrite` →
  *     `StreamingDataWriterFactory`, per-epoch two-phase commit);
  *   - **two-phase commit**: each task streams its rows to a private
  *     temp file and returns a `WriterCommitMessage` describing it; ONLY
  *     the driver-side `commit` publishes the temps into the destination
  *     and writes the manifest — so a failed/speculative/retried task
  *     never leaves partial output visible (`abort` deletes the temps).
  *     All paths go through the Hadoop `FileSystem` API resolved from the
  *     session's Hadoop conf, so the protocol holds on a real multi-node
  *     cluster (HDFS/S3A/...) exactly as it does on local disk — the
  *     driver renames by path, never by executor-local filename;
  *   - **streaming exactly-once on re-delivery**: epoch N's commit is
  *     idempotent — the epoch manifest (`_manifest-<queryId>-<epoch>.json`)
  *     is the commit marker, and a replayed `commit(N)` after a failure
  *     between sink-commit and checkpoint-advance sees the marker and
  *     drops the duplicate temps instead of double-publishing;
  *   - a per-query manifest (`_manifest-<queryId>.json`) records row and
  *     part counts — the sink-side audit record.
  *
  * Output format is JSON lines (long/int/double/string/boolean/null —
  * the fixture-schema types), re-readable with `spark.read.json`.
  * Non-finite float/double values render as `null` (strict JSON has no
  * NaN/Infinity token; external JSON-lines consumers reject bare `NaN`).
  * Usage:
  * `df.write.format("graft.sources.AuditSink").option("path", dir)
  *   .mode("append").save()` or
  * `df.writeStream.format("graft.sources.AuditSink").option("path", dir)`.
  */
class AuditSink extends TableProvider {
  // Write-only source: the table's schema is whatever the query writes.
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, properties.get("path"))
}

class AuditTable(writeSchema: StructType, path: String)
  extends Table with SupportsWrite {
  require(path != null, "graft.sources.AuditSink requires .option(\"path\", …)")
  override def name(): String = s"graft_audit($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        // Hadoop conf snapshotted on the DRIVER at plan time (it carries
        // fs.defaultFS / credentials); the serializable wrapper ships it
        // to executors inside the writer factory.
        private val conf = new SerializableHadoopConf(
          SparkSession.active.sessionState.newHadoopConf())
        override def toBatch: BatchWrite =
          new AuditBatchWrite(path, info.schema(), info.queryId(), conf)
        override def toStreaming: StreamingWrite =
          new AuditStreamingWrite(path, info.schema(), info.queryId(), conf)
      }
    }
}

/** Minimal serializable carrier for a Hadoop `Configuration` (which is
  * itself `Writable`, not `Serializable`). Standard connector pattern —
  * the factory holds one so executor-side writers resolve the SAME
  * filesystem (HDFS, S3A, local) the driver planned against. */
class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

case class AuditCommitMessage(tempPath: String, rows: Long, partitionId: Int)
  extends WriterCommitMessage

/** Driver-side publish core shared by the batch and streaming commit
  * paths: rename every task temp into the destination, then write the
  * manifest — nothing under `path` is visible until the job (or epoch)
  * succeeded. Rename-by-path via the Hadoop FileSystem, so it works when
  * driver and executors do NOT share a local filesystem. */
object AuditCommit {
  def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  def tempDir(path: String, queryId: String): Path =
    new Path(new Path(path, "_temp"), queryId)

  def cleanTempDir(fs: FileSystem, path: String, queryId: String): Unit = {
    fs.delete(tempDir(path, queryId), true)
    // Remove the shared _temp parent only when empty (another concurrent
    // query's temps must survive) — non-recursive delete refuses a
    // non-empty dir, which is exactly the semantics wanted.
    try fs.delete(new Path(path, "_temp"), false)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Publish `messages` under `path` with destination suffix `tag`
    * (queryId for batch, queryId-epoch for streaming) and write the
    * manifest marker LAST — its existence IS the commit record. */
  def publish(fs: FileSystem, path: String, queryId: String, tag: String,
      messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    fs.mkdirs(dest)
    var rows = 0L
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    messages.collect { case m: AuditCommitMessage => m }.foreach { m =>
      val temp = new Path(m.tempPath)
      if (m.rows > 0) {
        val target = new Path(dest, f"part-${m.partitionId}%05d-$tag.jsonl")
        // HDFS rename refuses an existing destination; REPLACE semantics
        // (re-run of the same queryId) need the explicit delete.
        fs.delete(target, false)
        if (!fs.rename(temp, target))
          throw new java.io.IOException(
            s"AuditSink commit: rename $temp -> $target failed")
        names += target.getName
      } else fs.delete(temp, false)
      rows += m.rows
    }
    val out = fs.create(new Path(dest, s"_manifest-$tag.json"), true)
    try out.write(
      s"""{"queryId":"$queryId","rows":$rows,"parts":${names.size},"files":[${names.map("\"" + _ + "\"").mkString(",")}]}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The READ side of the 2PC contract: enumerate committed parts by
    * parsing the `files` list of every `_manifest-*.json` commit marker
    * under `path`. The read consumes exactly what successful commits
    * published — stray temps, parts orphaned by aborted attempts, and
    * in-flight epochs are structurally invisible, unlike a `*.jsonl`
    * glob which trusts the directory listing. Driver-side cost is
    * O(#manifests), i.e. #epochs, never #rows. */
  def committedFiles(fs: FileSystem, path: String): Seq[String] = {
    val dest = new Path(path)
    val sts = fs.globStatus(new Path(dest, "_manifest-*.json"))
    if (sts == null) Seq.empty
    else sts.toSeq.flatMap { st =>
      val in = fs.open(st.getPath)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // Manifest is sink-authored with a fixed shape; part names are
      // %05d-printf + UUID tags, so a quote can never appear inside one.
      "\"([^\"]+\\.jsonl)\"".r.findAllMatchIn(txt)
        .map(m => new Path(dest, m.group(1)).toString).toSeq
    }
  }

  def dropTemps(fs: FileSystem,
      messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: AuditCommitMessage => m }
      .foreach(m => fs.delete(new Path(m.tempPath), false))
}

class AuditBatchWrite(path: String, schema: StructType, queryId: String,
    conf: SerializableHadoopConf)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(path, schema, queryId, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = AuditCommit.fs(path, conf.value)
    AuditCommit.publish(fs, path, queryId, queryId, messages)
    AuditCommit.cleanTempDir(fs, path, queryId)
  }

  /** Job failed somewhere: drop every temp this query produced. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = AuditCommit.fs(path, conf.value)
    AuditCommit.dropTemps(fs, messages)
    AuditCommit.cleanTempDir(fs, path, queryId)
  }
}

/** Per-epoch two-phase commit: epoch N's tasks write temps tagged with
  * the epoch, and `commit(N)` publishes them with the epoch manifest as
  * the atomic commit marker. Re-delivery safety: micro-batch engines may
  * re-run `commit(N)` after a failure between sink-commit and
  * checkpoint-advance — an existing epoch manifest short-circuits the
  * replay to temp cleanup, so each epoch's rows publish exactly once. */
class AuditStreamingWrite(path: String, schema: StructType, queryId: String,
    conf: SerializableHadoopConf)
  extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new AuditWriterFactory(path, schema, queryId, conf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val fs = AuditCommit.fs(path, conf.value)
    val tag = s"$queryId-$epochId"
    if (fs.exists(new Path(path, s"_manifest-$tag.json")))
      AuditCommit.dropTemps(fs, messages) // epoch already committed
    else
      AuditCommit.publish(fs, path, queryId, tag, messages)
    // Temp subdir is shared across this query's epochs — only drop the
    // specific temps, not the dir (later epochs may be mid-write under
    // continuous-ish overlap); the dir goes away with the final abort or
    // ages out with the query checkpoint.
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    AuditCommit.dropTemps(AuditCommit.fs(path, conf.value), messages)
}

class AuditWriterFactory(path: String, schema: StructType, queryId: String,
    conf: SerializableHadoopConf)
  extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditDataWriter(path, schema, queryId, partitionId, taskId, conf,
      epoch = None)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new AuditDataWriter(path, schema, queryId, partitionId, taskId, conf,
      epoch = Some(epochId))
}

/** Task-side writer: rows stream to a temp file keyed by (partition,
  * task attempt[, epoch]), so concurrent speculative attempts never
  * collide; the file is published only via the commit message the driver
  * acts on. Runs on the executor against the Hadoop FileSystem from the
  * shipped conf — the same namespace the driver's commit renames in. */
class AuditDataWriter(
    path: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long, conf: SerializableHadoopConf,
    epoch: Option[Long])
  extends DataWriter[InternalRow] {

  private val fs = AuditCommit.fs(path, conf.value)
  private val tempFile = {
    val d = AuditCommit.tempDir(path, queryId)
    fs.mkdirs(d)
    val e = epoch.map(i => s"-epoch-$i").getOrElse("")
    new Path(d, s"part-$partitionId-attempt-$taskId$e.jsonl")
  }
  private val out = new BufferedWriter(
    new OutputStreamWriter(fs.create(tempFile, true), StandardCharsets.UTF_8))
  private var rows = 0L

  /** Escape only when needed: the common no-escape string returns
    * itself (no per-char allocation on the per-row hot path). */
  private def jsonEscape(s: String): String = {
    var i = 0
    while (i < s.length && s.charAt(i) >= ' ' &&
      s.charAt(i) != '"' && s.charAt(i) != '\\') i += 1
    if (i == s.length) return s
    val b = new java.lang.StringBuilder(s.length + 8)
    b.append(s, 0, i)
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  // Field plan resolved ONCE per writer, not per row: each entry is the
  // pre-escaped "name": prefix plus a value renderer for the column.
  // Non-finite floats/doubles render as null — strict JSON has no
  // NaN/Infinity token (spark.read.json tolerates them, but the sink's
  // contract is output ANY JSON-lines consumer can parse).
  private val fieldPlan: Array[(String, InternalRow => String)] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val render: InternalRow => String = f.dataType match {
        case LongType => r => r.getLong(i).toString
        case IntegerType => r => r.getInt(i).toString
        case DoubleType => r => {
          val d = r.getDouble(i)
          if (java.lang.Double.isFinite(d)) d.toString else "null"
        }
        case FloatType => r => {
          val v = r.getFloat(i)
          if (java.lang.Float.isFinite(v)) v.toString else "null"
        }
        case BooleanType => r => r.getBoolean(i).toString
        case StringType =>
          r => "\"" + jsonEscape(r.getUTF8String(i).toString) + "\""
        case dt => throw new IllegalArgumentException(
          s"graft.sources.AuditSink: unsupported type $dt for ${f.name}")
      }
      ("\"" + jsonEscape(f.name) + "\":",
        (r: InternalRow) => if (r.isNullAt(i)) "null" else render(r))
    }

  override def write(row: InternalRow): Unit = {
    val b = new java.lang.StringBuilder(64)
    b.append('{')
    var i = 0
    while (i < fieldPlan.length) {
      if (i > 0) b.append(',')
      b.append(fieldPlan(i)._1).append(fieldPlan(i)._2(row))
      i += 1
    }
    b.append("}\n")
    out.write(b.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    AuditCommitMessage(tempFile.toString, rows, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tempFile, false)
  }

  override def close(): Unit = ()
}
