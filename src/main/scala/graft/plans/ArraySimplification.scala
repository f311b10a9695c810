package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Logical optimizer rule (the `injectOptimizerRule` extension surface,
  * alongside the engine's custom Expression, SparkStrategy, Aggregator and
  * DSv2 connector): algebraic simplification of redundant array work.
  *
  * Membership and cardinality-of-reorder identities:
  *   - `array_contains(array_distinct(e), v)` ≡ `array_contains(e, v)`
  *   - `array_contains(sort_array(e), v)`     ≡ `array_contains(e, v)`
  *   - `array_contains(reverse(e), v)`        ≡ `array_contains(e, v)`
  *   - `size(reverse(e))`                     ≡ `size(e)`
  *   - `size(sort_array(e))`                  ≡ `size(e)`
  *
  * Dropping the inner O(n)/O(n log n) pass matters when the pattern sits
  * under an explode or join fan-out — exactly where hand-written dedup
  * pipelines tend to leave a redundant `array_distinct` behind. All five
  * rewrites are semantics-preserving for any input including nulls: the
  * dropped operator changes order/multiplicity only, which neither
  * membership nor (for reverse/sort) length observes.
  */
object ArraySimplification extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayContains(ArrayDistinct(e), v) => ArrayContains(e, v)
      case ArrayContains(SortArray(e, _), v) => ArrayContains(e, v)
      case ArrayContains(Reverse(e), v) if e.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] => ArrayContains(e, v)
      case Size(Reverse(e), legacy) if e.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] => Size(e, legacy)
      case Size(SortArray(e, _), legacy) => Size(e, legacy)
    }
}
