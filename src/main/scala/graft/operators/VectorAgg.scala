package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF surface (SURVEY.md §2.11): an exact, mergeable
  * element-wise vector sum over `array<float>`.
  *
  * `Aggregator` gives the partial-aggregate + merge contract Spark needs for
  * distributed execution (map-side partials, shuffle, final merge) — the
  * same shape a sketch or HLL would use. The buffer accumulates in Double to
  * keep partial merges associative enough for test tolerance; contract
  * queries avoid float aggregation entirely (decimal instead), so this op
  * is scalatest-verified rather than oracle-checked.
  */
object VectorSum extends Aggregator[Seq[Float], Array[Double], Seq[Float]] {

  def zero: Array[Double] = Array.empty[Double]

  /** Ragged inputs pad with zeros to the max length seen — consistent across
    * reduce and merge, so the result does not depend on partitioning.
    */
  def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] =
    if (v == null) buf
    else {
      val out =
        if (buf.length >= v.length) buf
        else java.util.Arrays.copyOf(buf, v.length)
      var i = 0
      while (i < v.length) { out(i) += v(i); i += 1 }
      out
    }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  def finish(buf: Array[Double]): Seq[Float] = buf.toSeq.map(_.toFloat)

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()

  /** Column form: vector_sum(embedding). */
  def apply(c: Column): Column = udaf(this).apply(c)
}
