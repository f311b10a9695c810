package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal payload plumbing for binary media columns.
  *
  * Real image/audio decoders are native libraries invoked per batch of
  * rows; the Spark-native shape for that is `mapPartitions` — amortize
  * decoder init per partition, stream rows through, emit typed features.
  * No media libs exist in this environment, so `decodeStub` is a
  * clearly-marked deterministic fake; the partitioning, schema, and
  * iterator plumbing are the real thing and are what a decoder swap would
  * reuse. MultimodalQ.features covers the expression-only variant with a
  * DuckDB oracle; this operator is scalatest-verified.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("head_byte", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decoder: stands in for e.g. JPEG dimensions / PCM stats. Returns
    * deterministic pseudo-features of the payload bytes. */
  private def decodeStub(payload: Array[Byte]): (Int, Long) = {
    val head = if (payload.nonEmpty) payload(0) & 0xff else -1
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    (head, sum)
  }

  /** REAL codec tier (r8): the environment has no image/audio libraries,
    * but it has a real streaming byte codec — DEFLATE — so the decode
    * seam no longer has to be a stub to be exercised end to end. The
    * payloads are genuinely opaque compressed binary (a parquet BINARY
    * column an engine cannot interpret without the codec), the decoder
    * is initialized ONCE PER PARTITION and reset per row (exactly the
    * lifecycle a JPEG/PCM decoder needs), and correctness is graded
    * bit-exactly: the DuckDB oracle computes the same features from the
    * original text, so a single corrupted byte anywhere in
    * encode → binary column → decode breaks the md5 fingerprint. */
  def deflate(bytes: Array[Byte], d: java.util.zip.Deflater): Array[Byte] = {
    d.reset(); d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }

  def inflate(bytes: Array[Byte], i: java.util.zip.Inflater): Array[Byte] = {
    i.reset(); i.setInput(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
    val buf = new Array[Byte](4096)
    while (!i.finished()) {
      val n = i.inflate(buf)
      // n == 0 with the stream unfinished = a stalled decoder — a
      // truncated payload (needsInput), a preset-dictionary / FDICT
      // stream (needsDictionary), or any other stall. Fail loudly on
      // all of them; never spin and never return partial bytes.
      if (n == 0 && !i.finished())
        throw new java.util.zip.DataFormatException(
          if (i.needsDictionary()) "DEFLATE stream requires preset dictionary"
          else if (i.needsInput()) "truncated DEFLATE payload"
          else "stalled DEFLATE decode")
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** (doc_id, text) → (doc_id, payload: binary) — DEFLATE-compressed
    * UTF-8, one Deflater per partition. */
  def encodePayloads(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = df.select(col("doc_id").cast("long"), col("text")).rdd
      .mapPartitions { rows =>
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
        rows.map { r =>
          Row(r.getLong(0), deflate(r.getString(1).getBytes("UTF-8"), d))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** (doc_id, payload: binary) → (doc_id, decoded: string) — one
    * Inflater per partition; the decoder-amortization shape a media
    * codec swap reuses unchanged. */
  def decodePayloads(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("decoded", StringType, nullable = false)))
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        val i = new java.util.zip.Inflater(false)
        rows.map { r =>
          Row(r.getLong(0),
            new String(inflate(r.getAs[Array[Byte]]("payload"), i), "UTF-8"))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** df must carry (doc_id: long, payload: binary). One decoder "instance"
    * per partition, batch-streamed — the pattern scales by partition count. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // decoder init would happen here, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (head, sum) = decodeStub(payload)
          Row(r.getLong(0), payload.length.toLong, head, sum)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
