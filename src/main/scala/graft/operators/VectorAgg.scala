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

  def reduce(buf: Array[Double], v: Seq[Float]): Array[Double] =
    if (v == null) buf
    else if (buf.isEmpty) { val a = new Array[Double](v.length); add(a, v); a }
    else { add(buf, v); buf }

  private def add(buf: Array[Double], v: Seq[Float]): Unit = {
    var i = 0
    while (i < v.length && i < buf.length) { buf(i) += v(i); i += 1 }
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a }

  def finish(buf: Array[Double]): Seq[Float] = buf.toSeq.map(_.toFloat)

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()

  def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()

  /** Column form: vector_sum(embedding). */
  def apply(c: Column): Column = udaf(this).apply(c)
}
