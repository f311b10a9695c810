package graft

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Conformance spec for the DSv2 WRITE path (sources/AuditSink) — the
  * write-side twin of RangeSourceSpec: lifecycle, two-phase commit
  * visibility, task abort cleanup, and schema fidelity through a
  * re-read. */
class AuditSinkSpec extends SparkSpec {

  private def freshDir(): String =
    Files.createTempDirectory("audit_sink").toString

  test("batch write publishes parts + manifest; re-read equals input") {
    import spark.implicits._
    val dir = freshDir()
    val df = spark.range(100)
      .select(col("id"), (col("id") * 2).as("dbl"),
        concat(lit("row"), col("id")).as("tag"))
      .repartition(4)
    df.write.format("graft.sources.AuditSink")
      .option("path", dir).mode("append").save()
    val files = new File(dir).listFiles().map(_.getName).sorted
    val parts = files.filter(_.startsWith("part-"))
    val manifests = files.filter(_.startsWith("_manifest-"))
    assert(parts.length == 4, files.mkString(","))
    assert(manifests.length == 1, files.mkString(","))
    val manifest = new String(
      Files.readAllBytes(new File(dir, manifests.head).toPath))
    assert(manifest.contains("\"rows\":100") &&
      manifest.contains("\"parts\":4"), manifest)
    // no temp debris survives a successful commit
    assert(!files.contains("_temp"), files.mkString(","))
    // schema + values round-trip through the JSON-lines output
    val back = spark.read.json(s"$dir/*.jsonl")
      .select(col("id").cast("long"), col("dbl").cast("long"), col("tag"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(back == (0L until 100L).map(i => (i, i * 2, s"row$i")))
  }

  test("empty partitions produce no part files but count in the manifest") {
    val dir = freshDir()
    spark.range(3).repartition(8)
      .write.format("graft.sources.AuditSink")
      .option("path", dir).mode("append").save()
    val parts = new File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("part-"))
    assert(parts.length <= 3, parts.mkString(","))
    val manifest = new String(Files.readAllBytes(
      new File(dir).listFiles().filter(_.getName.startsWith("_manifest-"))
        .head.toPath))
    assert(manifest.contains("\"rows\":3"), manifest)
  }

  test("two appends from distinct queries coexist (queryId-scoped names)") {
    import spark.implicits._
    val dir = freshDir()
    for (_ <- 1 to 2)
      spark.range(10).select(col("id"))
        .coalesce(1).write.format("graft.sources.AuditSink")
        .option("path", dir).mode("append").save()
    assert(spark.read.json(s"$dir/*.jsonl").count() == 20)
    assert(new File(dir).listFiles()
      .count(_.getName.startsWith("_manifest-")) == 2)
  }

  test("task abort deletes its temp; nothing becomes visible") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val qid = "unit-test-query"
    val factory = new graft.sources.AuditBatchWrite(dir, schema, qid)
      .createBatchWriterFactory(null)
    val w = factory.createWriter(0, 7L)
    w.write(InternalRow(1L))
    w.write(InternalRow(2L))
    w.abort()
    val temp = graft.sources.AuditBatchWrite.tempDir(dir, qid)
    assert(!temp.exists() || temp.listFiles().isEmpty,
      "aborted task must leave no temp file")
    assert(Option(new File(dir).listFiles()).forall(
      _.forall(f => !f.getName.startsWith("part-"))),
      "aborted task must publish nothing")
  }

  test("job abort drops committed-but-unpublished temps") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("tag", StringType)))
    val qid = "unit-test-abort"
    val bw = new graft.sources.AuditBatchWrite(dir, schema, qid)
    val w = bw.createBatchWriterFactory(null).createWriter(0, 1L)
    w.write(InternalRow(UTF8String.fromString("x")))
    val msg = w.commit()
    bw.abort(Array(msg))
    assert(Option(new File(dir).listFiles()).forall(_.forall(f =>
      !f.getName.startsWith("part-") && f.getName != "_temp")),
      "job abort must drop task temps and publish nothing")
  }
}
