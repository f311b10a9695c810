package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all adjacent `[a-z]{2}` character bigrams of
  * a string, in order, as `array<string>`.
  *
  * Replaces the `zip_with(slice, slice, concat)` + `rlike("^[a-z]{2}$")`
  * pipeline in `ngram_profile`: higher-order functions are CodegenFallback
  * in Spark 4.1 (interpreted lambda per element, boxed rows), while this
  * expression participates in whole-stage codegen with a primitive byte
  * loop and zero regex work.
  *
  * Byte-level scanning is EXACTLY equivalent to the character-level
  * formulation for the `[a-z]` class: UTF-8 lead/continuation bytes are all
  * ≥ 0x80, so two adjacent bytes in 'a'..'z' are necessarily two adjacent
  * single-byte code points — no multi-byte character can contribute or
  * split a match (asserted against the HOF formulation, incl. multibyte
  * and boundary inputs, in CharBigramsSpec). Callers lowercase upstream
  * (`lower(text)`, same as the oracle), keeping case semantics byte-for-
  * byte identical to DuckDB's `lower` for everything that can reach
  * `[a-z]`. Per-bigram output allocates exactly one 2-byte UTF8String —
  * no char-array materialization, no per-position O(position) substr walk.
  */
case class CharBigrams(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i + 1 < n) {
      if (bytes(i) >= 'a' && bytes(i) <= 'z' &&
        bytes(i + 1) >= 'a' && bytes(i + 1) <= 'z') cnt += 1
      i += 1
    }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i + 1 < n) {
      if (bytes(i) >= 'a' && bytes(i) <= 'z' &&
        bytes(i + 1) >= 'a' && bytes(i + 1) <= 'z') {
        out(k) = UTF8String.fromBytes(Array(bytes(i), bytes(i + 1)))
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |int $cnt = 0;
         |for (int $i = 0; $i + 1 < $n; $i++) {
         |  if ($bytes[$i] >= 'a' && $bytes[$i] <= 'z' &&
         |      $bytes[$i + 1] >= 'a' && $bytes[$i + 1] <= 'z') $cnt++;
         |}
         |Object[] $out = new Object[$cnt];
         |int $k = 0;
         |for (int $i = 0; $i + 1 < $n; $i++) {
         |  if ($bytes[$i] >= 'a' && $bytes[$i] <= 'z' &&
         |      $bytes[$i + 1] >= 'a' && $bytes[$i + 1] <= 'z') {
         |    $out[$k++] = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |      new byte[] { $bytes[$i], $bytes[$i + 1] });
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CharBigrams = copy(child = newChild)
}

object CharBigrams {
  /** Register `graft_bigrams(s)` in the session's function registry.
    * Idempotent; works on driver-built sessions (no extensions hook). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bigrams", exprs => CharBigrams(exprs(0)), "built-in")
}
