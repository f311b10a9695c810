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
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
