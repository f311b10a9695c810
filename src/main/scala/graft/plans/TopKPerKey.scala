package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (preference order (c) in the build mandate):
  * a planner strategy that recognizes the canonical top-k pattern
  *
  *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o)))
  *
  * and plans it as a streaming per-group counter instead of `WindowExec` +
  * `Filter`. WindowExec buffers every (partition-key) group in memory
  * before emitting; at 100 TB a hot key means a huge buffer. This operator
  * holds O(1) state — the current group's key and a counter — and emits at
  * most k rows per group while streaming the sorted input.
  *
  * Registered through GraftExtensions (injectPlannerStrategy). Results are
  * identical to the WindowExec plan (TopKSpec asserts both), so enabling
  * the extension is purely a physical-plan change — exactly how a custom
  * operator should behave in a Catalyst world.
  */
case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pSpec = partitionSpec
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(pSpec, childOutput)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(
        (childOutput :+ rankAttr).map(_.dataType).toArray)
      var currentKey: UnsafeRow = null
      var rank = 0
      iter.flatMap { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          rank = 0
        }
        // Stop counting once the limit is hit: a hot key with >2^31 rows
        // must not wrap the Int counter back into emit range.
        if (rank < limit) {
          rank += 1
          rankRow.setInt(0, rank)
          Some(outProj(joined(row, rankRow)))
        } else None
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans `Filter(rank-bound, Window(row_number))` as TopKPerKeyExec. */
object TopKStrategy extends SparkStrategy {

  /** Extracts k from `attr <= k`, `attr < k`, or `attr === k` (k=1 form). */
  private def kBound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      // v > MinValue guard: `rn < Int.MinValue` is always false and must not
      // wrap to k = Int.MaxValue (select-all). Leave it to the stock planner.
      if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, child, _)) =>
      kBound(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 =>
          TopKPerKeyExec(part, order, k, alias.toAttribute,
            planLater(child)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}
