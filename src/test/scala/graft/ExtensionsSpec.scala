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

      // injected optimizer rule: redundant array passes are removed
      import org.apache.spark.sql.functions._
      import s.implicits._
      val df = Seq((1L, Seq("a", "b", "a"))).toDF("id", "xs")
        .select(col("id"),
          array_contains(array_distinct(col("xs")), "b").as("has_b"),
          size(sort_array(col("xs"))).as("n"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("array_distinct"), optimized)
      assert(!optimized.contains("sort_array"), optimized)
      val row = df.collect()(0)
      assert(row.getBoolean(1) && row.getInt(2) == 3)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
