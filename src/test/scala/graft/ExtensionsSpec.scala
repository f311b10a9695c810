package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions route: a session built with GraftExtensions
  * resolves graft_dot with no runtime registration call. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) injects graft_dot") {
    // getOrCreate returns any existing default session (whose registry may
    // not have the function) — force a fresh session over the shared
    // SparkContext, then restore the previous default for other suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .collect()(0).getDouble(0)
      assert(r == 11.0)

      val bg = s.sql("SELECT graft_bigrams('ab cd')")
        .collect()(0).getSeq[String](0)
      assert(bg == Seq("ab", "cd"))

      val jw = s.sql("SELECT graft_jaro_winkler('martha', 'marhta')")
        .collect()(0).getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-12)

      // injected optimizer rule: redundant array passes are removed.
      // The array must be NON-foldable (derived from range's id) —
      // a literal Seq would be constant-folded/ConvertToLocalRelation'd
      // to nothing regardless of the rule, making the assert vacuous.
      import org.apache.spark.sql.functions._
      val xs = transform(sequence(lit(0), col("id") + 2),
        i => concat(lit("w"), i))
      val df = s.range(1, 4)
        .select(col("id"),
          array_contains(array_distinct(xs), "w1").as("has_w1"),
          size(sort_array(xs)).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("array_distinct"), optimized)
      assert(!optimized.contains("sort_array"), optimized)
      val row = df.orderBy(col("id")).collect()(0)
      assert(row.getBoolean(1) && row.getInt(2) == 4)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
