package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: split a string into its Unicode CODE
  * POINTS, in order, as `array<string>` of single-codepoint strings.
  *
  * Replaces `split(str, "")` wherever the result must agree with
  * DuckDB's `string_split(text, '')`: Spark's `split` runs Java
  * `Pattern.split`, which iterates UTF-16 code units, so any non-BMP
  * character (emoji, astral CJK) is torn into two lone surrogates whose
  * UTF-8 encodings are replacement bytes — engine and oracle then hash
  * different byte sequences (r14 advisory, MultimodalQ). DuckDB splits
  * the UTF-8 payload at codepoint boundaries; this expression does the
  * identical walk: a new codepoint starts at every byte that is NOT a
  * UTF-8 continuation byte (`(b & 0xC0) != 0x80`), and each slice keeps
  * its original bytes verbatim — no UTF-16 round-trip, no surrogate
  * tearing, bit-exact with the oracle for ALL well-formed UTF-8
  * including astral planes (pinned against a codepoint-level mirror in
  * CodepointSplitSpec). Participates in whole-stage codegen with a
  * primitive two-pass byte loop, one UTF8String per codepoint.
  */
case class CodepointSplit(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i < n) {
      if ((bytes(i) & 0xC0) != 0x80) cnt += 1
      i += 1
    }
    val out = new Array[Any](cnt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && (bytes(j) & 0xC0) == 0x80) j += 1
      out(k) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, j))
      k += 1
      i = j
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
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (($bytes[$i] & 0xC0) != 0x80) $cnt++;
         |}
         |Object[] $out = new Object[$cnt];
         |int $k = 0;
         |int $i = 0;
         |while ($i < $n) {
         |  int $j = $i + 1;
         |  while ($j < $n && ($bytes[$j] & 0xC0) == 0x80) $j++;
         |  $out[$k++] = org.apache.spark.unsafe.types.UTF8String.fromBytes(
         |    java.util.Arrays.copyOfRange($bytes, $i, $j));
         |  $i = $j;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): CodepointSplit = copy(child = newChild)
}

object CodepointSplit {
  /** Register `graft_codepoints(s)` in the session's function registry.
    * Idempotent; works on driver-built sessions (no extensions hook). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_codepoints", exprs => CodepointSplit(exprs(0)), "built-in")
}
