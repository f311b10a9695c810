package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom planner strategy: the row_number-top-k pattern plans as
  * TopKPerKeyExec under GraftExtensions, with results identical to the
  * stock WindowExec plan. */
class TopKSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try f(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate())
    finally prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
  }

  private def topk(spark: SparkSession, k: Int): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  test("strategy plans TopKPerKeyExec and matches the WindowExec result") {
    withExtSession { spark =>
      val df = topk(spark, 3)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("TopKPerKey"), physical.take(600))
      val viaCustom = df.orderBy(col("o_custkey"), col("rn")).collect().toSeq
      // same logical query, strategy disabled via a plain session path:
      // compare against the contract query (WindowExec) output
      val viaWindow = SparkEntry.queries("qwin_rank_per_cust")(
        spark, "/root/testdata/sf0.001")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("int").as("rn"))
        .collect().toSeq
      val customProjected = df
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn")).collect().toSeq
      assert(customProjected == viaWindow)
      assert(viaCustom.nonEmpty)
    }
  }

  test("rank-equals-one form plans the custom operator too") {
    withExtSession { spark =>
      val df = topk(spark, 1).filter(col("rn") === 1)
      val first = topk(spark, 1)
      assert(first.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
      assert(df.count() == first.count())
    }
  }

  test("global top-k (empty partition spec) works") {
    withExtSession { spark =>
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, "/root/testdata/sf0.001", "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = df.orderBy(col("rn")).collect()
      assert(got.length == 5)
      val expect = Tables(spark, "/root/testdata/sf0.001", "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(5)
        .select(col("o_orderkey")).collect().map(_.getLong(0)).toSeq
      assert(got.map(_.getAs[Long]("o_orderkey")).toSeq == expect)
    }
  }

  test("rn < Int.MinValue does not plan the custom operator (no k wrap)") {
    withExtSession { spark =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, "/root/testdata/sf0.001", "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") < Int.MinValue)
      assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() == 0)
    }
  }

  test("rn < k form plans the custom operator with k-1 bound") {
    withExtSession { spark =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val df = Tables(spark, "/root/testdata/sf0.001", "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") < 4)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(df.count() == topk(spark, 3).count())
    }
  }
}
