package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized Count-Min sketch (Cormode &
  * Muthukrishnan 2005 — public): `graft_cms_estimate(sketch, word)`
  * returns the sketch's frequency estimate for `word`.
  *
  * Spark ships the BUILD side of CMS as the `count_min_sketch(col, eps,
  * conf, seed)` aggregate (partial+final mergeable, the property that
  * makes it a 100 TB rollup artifact — per-partition sketches union into
  * any cell), but no SQL-facing PROBE — estimates are only reachable via
  * the driver-side `df.stat` API. This expression closes that gap on the
  * executor side: the KB-sized sketch rides a 1-row broadcast and each
  * candidate row probes it in place, so heavy-hitter verification never
  * pulls data (or the sketch) through the driver.
  *
  * The aggregate inserts string keys as their UTF-8 bytes
  * (CountMinSketchAgg calls addBinary(getBytes)), so the probe passes the
  * identical byte key. CodegenFallback is fine here BY DESIGN: the probe
  * side is a bounded candidate list (top-k words), never a corpus-sized
  * column — deserialization cost per row is bounded by candidate count.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(sketchBytes: Any, word: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    cms.estimateCount(word.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** Register `graft_cms_estimate(sketch, word)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms_estimate", exprs => CmsEstimate(exprs(0), exprs(1)),
      "built-in")
}
