package graft

import org.apache.spark.sql.functions._
import graft.expressions.JaroWinkler

/** The native Jaro-Winkler expression: classic literature values, both
  * eval paths (codegen + interpreted), SQL registration, null handling,
  * and the algebraic properties a broken matcher cannot fake. */
class JaroWinklerSpec extends SparkSpec {

  private val classic = Seq(
    // (a, b, expected) — Winkler's published examples + pinned DuckDB
    // probes (the oracle engine this expression must agree with)
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("a", "b", 0.0),
    ("abcd", "dcba", 0.5),
    // jaro = 2/3 with common prefix: boost must NOT fire at jaro ≤ 0.7
    ("ab", "ax", 0.6666666666666666))

  test("classic values on both eval paths") {
    JaroWinkler.register(spark)
    import spark.implicits._
    val df = classic.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      val got = df.select(col("a"), col("b"),
        call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
        .collect().map(r => (r.getString(0), r.getString(1)))
        .zip(df.select(
          call_function("graft_jaro_winkler", col("a"), col("b")))
          .collect().map(_.getDouble(0)))
      got.zip(classic).foreach { case (((a, b), v), (_, _, exp)) =>
        assert(math.abs(v - exp) < 1e-12, s"$mode $a/$b: $v != $exp")
      }
    }
    spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("symmetry, unit range, and identity on the corpus vocabulary") {
    JaroWinkler.register(spark)
    val words = Tables(spark, sf, "part")
      .select(lower(col("p_name")).as("w")).distinct().limit(40)
    val pairs = words.select(col("w").as("a"))
      .crossJoin(words.select(col("w").as("b")))
    val rows = pairs.select(
      call_function("graft_jaro_winkler", col("a"), col("b")).as("ab"),
      call_function("graft_jaro_winkler", col("b"), col("a")).as("ba"),
      (col("a") === col("b")).as("eq")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ab, ba, eq) = (r.getDouble(0), r.getDouble(1), r.getBoolean(2))
      assert(ab == ba, s"asymmetric: $ab vs $ba")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range: $ab")
      if (eq) assert(ab == 1.0, s"identity pair scored $ab")
    }
  }

  test("SQL registration and null propagation") {
    JaroWinkler.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('spark', 'spork'), " +
        "graft_jaro_winkler(CAST(NULL AS STRING), 'x')").collect()(0)
    assert(math.abs(r.getDouble(0) - 0.8933333333333333) < 1e-12)
    assert(r.isNullAt(1))
  }
}
