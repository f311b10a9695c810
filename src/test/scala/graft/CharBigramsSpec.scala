package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.CharBigrams

/** CharBigrams ≡ the HOF formulation it replaced, on the corpus and on
  * adversarial inputs (multibyte, case, boundaries, empty). */
class CharBigramsSpec extends SparkSpec {

  private def hofBigrams(c: Column): Column = {
    val cs = split(c, "")
    filter(
      zip_with(slice(cs, lit(1), greatest(size(cs) - 1, lit(0))),
        slice(cs, lit(2), greatest(size(cs) - 1, lit(0))),
        (a, b) => concat(a, b)),
      bg => bg.rlike("^[a-z]{2}$"))
  }

  test("matches the zip_with+rlike pipeline on every corpus document") {
    CharBigrams.register(spark)
    val d = Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .select(col("doc_id"),
        call_function("graft_bigrams", col("t")).as("fast"),
        hofBigrams(col("t")).as("slow"))
    assert(d.count() > 0)
    val diff = d.filter(not(col("fast") === col("slow"))).count()
    assert(diff == 0, s"$diff documents diverge from the HOF formulation")
  }

  test("adversarial inputs: multibyte, case, digits, boundaries") {
    CharBigrams.register(spark)
    val cases = Seq(
      "", "a", "ab", "abc", "aBc", "a b", "ab cd",
      "héllo", "日本語ab", "aé", "éa", "ab日ba", "a1b2cd",
      "ZZ", "zz", "z z", "ßab", "añb")
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      cases.map(s => org.apache.spark.sql.Row(s)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType))))
    val rows = df.select(col("t"),
      call_function("graft_bigrams", col("t")).as("fast"),
      hofBigrams(col("t")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"input '${r.getString(0)}': " +
          s"fast=${r.getSeq[String](1)} slow=${r.getSeq[String](2)}")
    }
  }

  test("interpreted eval matches codegen path") {
    CharBigrams.register(spark)
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal("xabécd yz")
    val interpreted = CharBigrams(lit0).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(interpreted == Seq("xa", "ab", "cd", "yz"))
  }
}
