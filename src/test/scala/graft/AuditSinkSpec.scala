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

  test("committedFiles reads exactly the manifest's part list — an " +
    "orphaned .jsonl is structurally invisible (r10)") {
    import graft.sources.AuditCommit
    val dir = freshDir()
    spark.range(10).select(col("id"))
      .coalesce(2)
      .write.format("graft.sources.AuditSink")
      .option("path", dir).mode("append").save()
    // plant an orphan: a stray part a failed/foreign writer left behind
    // WITHOUT a commit marker — a *.jsonl glob would happily read it
    Files.write(new File(dir, "part-99999-orphan.jsonl").toPath,
      "{\"id\": 424242}\n".getBytes("UTF-8"))
    val fs = AuditCommit.fs(dir, spark.sparkContext.hadoopConfiguration)
    val committed = AuditCommit.committedFiles(fs, dir)
    assert(committed.nonEmpty)
    assert(!committed.exists(_.contains("orphan")),
      s"orphan leaked into the committed list: $committed")
    val ids = spark.read.json(committed: _*)
      .select(col("id").cast("long")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 10L),
      s"manifest read returned ${ids.toSeq}")
    // the glob, by contrast, WOULD see the orphan — the exact hazard
    // the manifest contract removes
    val globIds = spark.read.json(s"$dir/*.jsonl").count()
    assert(globIds == 11, s"glob saw $globIds rows")
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

  private def conf() =
    new graft.sources.SerializableHadoopConf(
      spark.sessionState.newHadoopConf())

  test("task abort deletes its temp; nothing becomes visible") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val qid = "unit-test-query"
    val factory = new graft.sources.AuditBatchWrite(dir, schema, qid, conf())
      .createBatchWriterFactory(null)
    val w = factory.createWriter(0, 7L)
    w.write(InternalRow(1L))
    w.write(InternalRow(2L))
    w.abort()
    val temp = new File(new File(dir, "_temp"), qid)
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
    val bw = new graft.sources.AuditBatchWrite(dir, schema, qid, conf())
    val w = bw.createBatchWriterFactory(null).createWriter(0, 1L)
    w.write(InternalRow(UTF8String.fromString("x")))
    val msg = w.commit()
    bw.abort(Array(msg))
    assert(Option(new File(dir).listFiles()).forall(_.forall(f =>
      !f.getName.startsWith("part-") && f.getName != "_temp")),
      "job abort must drop task temps and publish nothing")
  }

  test("non-finite double/float render as null (strict JSON)") {
    val dir = freshDir()
    spark.range(1).select(
      lit(Double.NaN).as("a"),
      lit(Double.PositiveInfinity).as("b"),
      lit(1.5).as("c"))
      .coalesce(1).write.format("graft.sources.AuditSink")
      .option("path", dir).mode("append").save()
    val line = Files.readAllLines(
      new File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
        .head.toPath).get(0)
    assert(line.contains("\"a\":null") && line.contains("\"b\":null") &&
      line.contains("\"c\":1.5"), line)
    assert(!line.contains("NaN") && !line.contains("Infinity"), line)
  }

  // ---- streaming write half (StreamingWrite, per-epoch 2PC) ----------

  private def epochWrite(dir: String, qid: String,
      epoch: Long, values: Seq[Long],
      sw: graft.sources.AuditStreamingWrite): Unit = {
    val f = sw.createStreamingWriterFactory(null)
    val w = f.createWriter(0, epoch * 100 + 1, epoch)
    values.foreach(v => w.write(InternalRow(v)))
    sw.commit(epoch, Array(w.commit()))
  }

  test("streaming epochs publish per-epoch parts + manifests") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sw = new graft.sources.AuditStreamingWrite(
      dir, schema, "stream-q", conf())
    epochWrite(dir, "stream-q", 0, Seq(1L, 2L), sw)
    epochWrite(dir, "stream-q", 1, Seq(3L), sw)
    val names = new File(dir).listFiles().map(_.getName)
    assert(names.count(_.startsWith("part-")) == 2, names.mkString(","))
    assert(names.contains("_manifest-stream-q-0.json") &&
      names.contains("_manifest-stream-q-1.json"), names.mkString(","))
    assert(spark.read.json(s"$dir/*.jsonl").count() == 3)
  }

  test("replayed epoch commit is idempotent (exactly-once re-delivery)") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sw = new graft.sources.AuditStreamingWrite(
      dir, schema, "replay-q", conf())
    epochWrite(dir, "replay-q", 5, Seq(10L, 20L), sw)
    // the engine re-runs epoch 5 after a failure between sink-commit and
    // checkpoint-advance: same epoch id, fresh task attempt
    epochWrite(dir, "replay-q", 5, Seq(10L, 20L), sw)
    assert(spark.read.json(s"$dir/*.jsonl").count() == 2,
      "replayed epoch must not double-publish")
    val temp = new File(new File(dir, "_temp"), "replay-q")
    assert(!temp.exists() || temp.listFiles().isEmpty,
      "replayed epoch's duplicate temps must be dropped")
  }

  test("streaming epoch abort drops temps and publishes nothing") {
    val dir = freshDir()
    val schema = StructType(Seq(StructField("id", LongType)))
    val sw = new graft.sources.AuditStreamingWrite(
      dir, schema, "abort-q", conf())
    val w = sw.createStreamingWriterFactory(null).createWriter(0, 1L, 0L)
    w.write(InternalRow(9L))
    val msg = w.commit()
    sw.abort(0L, Array(msg))
    assert(Option(new File(dir).listFiles()).forall(_.forall(f =>
      !f.getName.startsWith("part-") &&
        !f.getName.startsWith("_manifest-"))),
      "aborted epoch must publish nothing")
  }

  test("writeStream end-to-end through the engine (foreachBatch-free)") {
    import spark.implicits._
    val dir = freshDir()
    val ckpt = freshDir()
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    src.addData(1L, 2L, 3L)
    val q = src.toDS.select(col("value").as("id"))
      .writeStream.format("graft.sources.AuditSink")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    src.addData(4L)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.json(s"$dir/*.jsonl")
      .select(col("id").cast("long")).as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
    // one manifest per non-empty epoch
    assert(new File(dir).listFiles()
      .count(_.getName.startsWith("_manifest-")) >= 2)
  }
}
