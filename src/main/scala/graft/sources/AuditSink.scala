package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the engine's DataSource V2 surface — RangeSource
  * exercises the read lifecycle (scan building, pushdowns, partition
  * planning); this sink exercises the connector write contract the
  * built-in file sinks implement:
  *
  *   - `TableProvider` → `SupportsWrite` → `WriteBuilder` → `Write` →
  *     `BatchWrite` → `DataWriterFactory` → `DataWriter` (the DSv2 write
  *     lifecycle);
  *   - **two-phase commit**: each task streams its rows to a private
  *     temp file and returns a `WriterCommitMessage` describing it; ONLY
  *     the driver-side `BatchWrite.commit` publishes the temps into the
  *     destination and writes the manifest — so a failed/speculative/
  *     retried task never leaves partial output visible (`abort` deletes
  *     the temps). This is the exact protocol that makes distributed
  *     writes exactly-once-per-job at any cluster size;
  *   - a per-query manifest (`_manifest-<queryId>.json`) records row and
  *     part counts — the sink-side audit record.
  *
  * Output format is JSON lines (long/int/double/string/boolean/null —
  * the fixture-schema types), re-readable with `spark.read.json`. Usage:
  * `df.write.format("graft.sources.AuditSink").option("path", dir)
  *   .mode("append").save()`.
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
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new AuditBatchWrite(path, info.schema(), info.queryId())
      }
    }
}

case class AuditCommitMessage(tempPath: String, rows: Long, partitionId: Int)
  extends WriterCommitMessage

class AuditBatchWrite(path: String, schema: StructType, queryId: String)
  extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(path, schema, queryId)

  /** Driver-side publish: rename every task temp into the destination,
    * then write the manifest — nothing under `path` is visible until the
    * whole job succeeded. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new File(path)
    dest.mkdirs()
    var rows = 0L
    var parts = 0
    messages.collect { case m: AuditCommitMessage => m }.foreach { m =>
      if (m.rows > 0) {
        Files.move(Paths.get(m.tempPath),
          Paths.get(path, f"part-${m.partitionId}%05d-$queryId.jsonl"),
          StandardCopyOption.REPLACE_EXISTING)
        parts += 1
      } else Files.deleteIfExists(Paths.get(m.tempPath))
      rows += m.rows
    }
    Files.write(Paths.get(path, s"_manifest-$queryId.json"),
      s"""{"queryId":"$queryId","rows":$rows,"parts":$parts}"""
        .getBytes(StandardCharsets.UTF_8))
    AuditBatchWrite.cleanTempDir(path, queryId)
  }

  /** Job failed somewhere: drop every temp this query produced. */
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.collect { case m: AuditCommitMessage => m }
      .foreach(m => Files.deleteIfExists(Paths.get(m.tempPath)))
    AuditBatchWrite.cleanTempDir(path, queryId)
  }
}

object AuditBatchWrite {
  def tempDir(path: String, queryId: String): File =
    new File(new File(path, "_temp"), queryId)
  def cleanTempDir(path: String, queryId: String): Unit = {
    val d = tempDir(path, queryId)
    Option(d.listFiles()).foreach(_.foreach(_.delete()))
    d.delete()
    new File(path, "_temp").delete() // succeeds only when empty — fine
  }
}

class AuditWriterFactory(path: String, schema: StructType, queryId: String)
  extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditDataWriter(path, schema, queryId, partitionId, taskId)
}

/** Task-side writer: rows stream to a temp file keyed by (partition,
  * task attempt), so concurrent speculative attempts never collide; the
  * file is published only via the commit message the driver acts on. */
class AuditDataWriter(
    path: String, schema: StructType, queryId: String,
    partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val tempFile = {
    val d = AuditBatchWrite.tempDir(path, queryId)
    d.mkdirs()
    new File(d, s"part-$partitionId-attempt-$taskId.jsonl")
  }
  private val out = Files.newBufferedWriter(tempFile.toPath,
    StandardCharsets.UTF_8)
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
  private val fieldPlan: Array[(String, InternalRow => String)] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      val render: InternalRow => String = f.dataType match {
        case LongType => r => r.getLong(i).toString
        case IntegerType => r => r.getInt(i).toString
        case DoubleType => r => r.getDouble(i).toString
        case FloatType => r => r.getFloat(i).toString
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
    AuditCommitMessage(tempFile.getAbsolutePath, rows, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tempFile.toPath)
  }

  override def close(): Unit = ()
}
