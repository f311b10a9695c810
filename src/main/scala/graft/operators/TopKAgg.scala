package graft.operators

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate for the top-k buffer. */
case class Scored(score: Double, id: Long)

/** Mergeable top-k-by-score aggregate — the AGGREGATE formulation of
  * top-k-per-group, complementing the physical-operator formulation in
  * plans/TopKPerKey.
  *
  * Why it matters at 100 TB: the row_number-window formulation shuffles
  * EVERY row of the group to one partition before ranking; this
  * Aggregator is map-side combinable (partial buffers of ≤ k rows merge
  * associatively), so only k rows per group per map partition ever cross
  * the shuffle — for a billion-row group and k=3 that is the difference
  * between shuffling a billion rows and shuffling 3 per upstream
  * partition. Spark plans it as ObjectHashAggregate partial+final, the
  * same shape collect_list/sketch aggregates use.
  *
  * Determinism: the buffer is kept sorted by the total order
  * (score DESC, id ASC), reduce and merge both re-normalize with the
  * same order, and ties are broken by the unique id — so the result is
  * independent of partitioning and row arrival order (asserted under
  * adversarial repartitioning in OperatorSpec).
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)
  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  def zero: Seq[Scored] = Vector.empty

  def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] =
    if (v == null) buf
    else if (buf.size == k && ord.lteq(buf.last, v)) buf
    else ((buf :+ v).sorted(ord)).take(k)

  def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    ((a ++ b).sorted(ord)).take(k)

  def finish(buf: Seq[Scored]): Seq[Scored] = buf

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKByScore {
  /** Column form: top_k_by_score(score, id) → array<struct<score,id>>. */
  def apply(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k)).apply(score, id)
}
