package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev harness: time / explain a single contract query.
  * Usage: runMain graft.Dev <queryName> <sfDir> [explain|time|show] */
object Dev {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "time"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    mode match {
      case "explain" => fn(spark, sfDir).explain("formatted")
      case "show"    => fn(spark, sfDir).show(30, false)
      case _ =>
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"[dev] $name iter$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
        }
    }
    spark.stop()
  }
}
