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
