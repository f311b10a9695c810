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
    def fn = SparkEntry.queries(name)
    mode match {
      // run once with a streaming listener printing per-batch durations
      case "sprof" =>
        spark.streams.addListener(
          new org.apache.spark.sql.streaming.StreamingQueryListener {
            def onQueryStarted(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryStartedEvent): Unit = ()
            def onQueryTerminated(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
            def onQueryProgress(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryProgressEvent): Unit =
              println(s"[sprof] batch=${e.progress.batchId} " +
                s"rows=${e.progress.numInputRows} " +
                s"durations=${e.progress.durationMs}")
          })
        for (i <- 1 to 2) {
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"[dev] $name iter$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
        }
      case "explain" => fn(spark, sfDir).explain("formatted")
      // dump formatted plans for a comma-separated key list (arg 1) to
      // <arg 4>/<key><suffix arg 5>.txt — one JVM for the whole batch
      case "dump" =>
        val outDir = new java.io.File(args(3))
        outDir.mkdirs()
        val suffix = if (args.length > 4) args(4) else ""
        name.split(",").foreach { k =>
          val df = SparkEntry.queries(k)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            new java.io.File(outDir, s"$k$suffix.txt").toPath, plan)
          println(s"[dev] dumped plan: $k")
        }
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
