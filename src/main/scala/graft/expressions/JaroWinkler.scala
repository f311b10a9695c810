package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings —
  * the GRADED record-linkage metric (Winkler 1990, public) complementing
  * the binary edit-distance tier (`typo_neardup_words`' Levenshtein ≤ 1).
  *
  * Codegen follows Spark's own `Levenshtein` pattern: `doGenCode` emits a
  * static call into [[JaroWinkler.score]], so the expression stays inside
  * whole-stage codegen (no CodegenFallback, no boxing) while the match /
  * transposition loops live in one auditable JVM method operating on the
  * UTF8String bytes directly (the corpus vocabulary is ASCII; multi-byte
  * code points would compare per byte, exactly like DuckDB's
  * byte-oriented `jaro_winkler_similarity` this expression mirrors).
  *
  * Semantics pinned against DuckDB 1.0 (probed, 17 cases):
  *   - match window = max(|a|,|b|)/2 − 1 (floored at 0);
  *   - transpositions = half the matched-but-misaligned count;
  *   - jaro = (m/|a| + m/|b| + (m−t)/m)/3, 0 when m = 0;
  *   - Winkler prefix boost ℓ·0.1·(1−jaro), ℓ ≤ 4, applied ONLY when
  *     jaro > 0.7 (the boost-threshold DuckDB uses).
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinkler.score($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Byte-oriented Jaro-Winkler, called from generated code (must stay
    * public + static-reachable). Allocation is two small boolean arrays
    * per call — the same cost class as Spark's levenshtein scratch. */
  def score(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.getBytes
    val b = ub.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb - 1, i + win)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lim = math.min(4, math.min(la, lb))
    while (l < lim && a(l) == b(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Register `graft_jaro_winkler(a, b)` (Column API + SQL). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler", exprs => JaroWinkler(exprs(0), exprs(1)),
      "built-in")
}
