package graft

import org.apache.spark.sql.functions._
import graft.expressions.CodepointSplit

/** CodepointSplit ≡ a JVM codePoints() mirror — including astral-plane
  * characters that Spark's split(str,"") tears into lone surrogates —
  * and agrees with split(str,"") wherever the input is pure BMP (so the
  * r15 swap inside multimodal_neardup changes nothing for the ASCII
  * fixture while fixing the astral divergence the r14 advisory found). */
class CodepointSplitSpec extends SparkSpec {

  private def mirror(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toSeq
  }

  private val cases = Seq(
    "", "a", "ab", "héllo", "日本語", "aé日b",
    "💩",                       // U+1F4A9 PILE OF POO (astral)
    "a💩b",                     // astral sandwiched in ASCII
    "😀😁",           // two adjacent emoji
    "𰻞",                       // U+30EDE astral CJK ext
    "é",                            // combining accent: TWO codepoints
    "é",                             // precomposed é: ONE codepoint
    "mix 👍 日本 ok")

  private def df(ss: Seq[String]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      ss.map(s => org.apache.spark.sql.Row(s)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
  }

  test("matches the JVM codePoints walk on astral + combining inputs") {
    CodepointSplit.register(spark)
    val rows = df(cases)
      .select(col("t"), call_function("graft_codepoints", col("t")).as("cs"))
      .collect()
    rows.foreach { r =>
      val got = r.getSeq[String](1)
      val want = mirror(r.getString(0))
      assert(got == want,
        s"input '${r.getString(0)}': got=$got want=$want")
    }
  }

  test("equals split(str,'') on pure-BMP corpus text") {
    CodepointSplit.register(spark)
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        call_function("graft_codepoints", col("text")).as("fast"),
        split(col("text"), "").as("regex"))
    assert(d.count() > 0)
    val diff = d.filter(not(col("fast") === col("regex"))).count()
    assert(diff == 0,
      s"$diff BMP documents diverge from split(str,'')")
  }

  test("astral input: 3 codepoints, and split(str,'') agrees on 4.1") {
    // The r14 advisory predicted split(str,'') tears surrogate pairs
    // (UTF-16 code-unit walk). Empirically Spark 4.1's regex split
    // advances code-point-wise, so there is no divergence TODAY — but
    // that equivalence hangs on Java-regex Unicode internals, while
    // CodepointSplit's UTF-8 byte-boundary walk makes the codepoint
    // contract structural. This test documents the current agreement;
    // if a Spark/JDK upgrade ever changes regex-split behavior, the
    // engine keys are already off it.
    CodepointSplit.register(spark)
    val r = df(Seq("a💩b"))
      .select(size(call_function("graft_codepoints", col("t"))).as("cp"),
        size(split(col("t"), "")).as("cu"))
      .collect()(0)
    assert(r.getInt(0) == 3, "codepoint split: 3 elements")
    assert(r.getInt(1) == 3, "Spark 4.1 regex split is codepoint-aware")
  }
}
