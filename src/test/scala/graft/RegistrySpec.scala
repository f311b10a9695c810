package graft

import org.apache.spark.sql.functions._

/** Tokenizer/LM registry persistence (r13) + atomic cross-writer publish
  * (r15, verdict #1): after the registry is built once, a DIFFERENT
  * SparkSession in the same JVM (the pipeline-restart stand-in — fresh
  * session caches, same scratch) must serve every tokenizer consumer from
  * the persisted parquet WITHOUT re-entering a trainer, and produce
  * identical graded output; and concurrent sessions racing one shared
  * registry root must commit exactly one full artifact, never a torn one.
  *
  * SEQUENTIAL-EXECUTION REQUIREMENT: the publish tests mutate the
  * JVM-global `graft.registry.lockTimeoutMs` sys.prop — safe because
  * forked suites run sequentially (`Test / testForkedParallel := false`,
  * build.sbt). */
class RegistrySpec extends SparkSpec {

  test("second session re-loads the registry — no retrain, same outputs") {
    // Build (or reuse) the registry through the graded key on session 1.
    val reg1 = SparkEntry.queries("tokenizer_registry")(spark, sf)
      .collect().map(_.toString).toSeq
    val bpeApply1 = SparkEntry.queries("token_bpe_apply")(spark, sf)
      .collect().map(_.toString).toSeq
    val uniApply1 = SparkEntry.queries("token_unigram_apply")(spark, sf)
      .collect().map(_.toString).toSeq

    // Fresh session: separate session caches, shared JVM scratch.
    val s2 = spark.newSession()
    val bpeBefore = graft.queries.TextQ.bpeTrainRuns.get()
    val uniBefore = graft.queries.TextQ.unigramTrainRuns.get()
    val reg2 = SparkEntry.queries("tokenizer_registry")(s2, sf)
      .collect().map(_.toString).toSeq
    val bpeApply2 = SparkEntry.queries("token_bpe_apply")(s2, sf)
      .collect().map(_.toString).toSeq
    val uniApply2 = SparkEntry.queries("token_unigram_apply")(s2, sf)
      .collect().map(_.toString).toSeq

    assert(graft.queries.TextQ.bpeTrainRuns.get() == bpeBefore,
      "second session re-entered the BPE trainer instead of re-loading " +
        "the persisted merge table")
    assert(graft.queries.TextQ.unigramTrainRuns.get() == uniBefore,
      "second session re-entered the unigram trainer instead of " +
        "re-loading the persisted pieces")
    assert(reg2 == reg1, "registry roundtrip drifted across sessions")
    assert(bpeApply2 == bpeApply1, "BPE apply drifted across sessions")
    assert(uniApply2 == uniApply1, "unigram apply drifted across sessions")
  }

  test("second session re-loads the HNSW graph — no rebuild, same top-5") {
    val knn1 = SparkEntry.queries("ann_hnsw_knn")(spark, sf)
      .collect().map(_.toString).toSeq
    val s2 = spark.newSession()
    val before = graft.queries.VectorQ.hnswBuildRuns.get()
    val knn2 = SparkEntry.queries("ann_hnsw_knn")(s2, sf)
      .collect().map(_.toString).toSeq
    assert(graft.queries.VectorQ.hnswBuildRuns.get() == before,
      "second session re-built the HNSW graph instead of re-loading " +
        "the registry parquet")
    assert(knn2 == knn1, "HNSW search drifted across sessions")
  }

  test("committed artifacts carry the _built marker INSIDE the data dir") {
    SparkEntry.queries("tokenizer_registry")(spark, sf).collect()
    val root = new java.io.File(graft.queries.core.scratchRoot,
      "registry_" + graft.queries.core.dirKey(sf))
    for (a <- Seq("bpe_merges", "unigram_pieces", "lm_threshold")) {
      assert(new java.io.File(new java.io.File(root, a), "_built").exists(),
        s"missing in-dir _built marker for $a")
      assert(new java.io.File(root, a).exists(), s"missing parquet for $a")
    }
    // no stray generation dirs or lock files after a clean publish
    val leftovers = Option(root.listFiles()).getOrElse(Array())
      .map(_.getName).filter(n => n.startsWith("._tmp_") ||
        n.startsWith("._lock_"))
    assert(leftovers.isEmpty, s"uncleaned publish droppings: " +
      leftovers.mkString(", "))
  }

  test("two writers racing one shared root commit exactly one winner") {
    import scala.jdk.CollectionConverters._
    val parentDir = java.nio.file.Files
      .createTempDirectory("graft_regspec_race")
    try {
      val parent = new org.apache.hadoop.fs.Path(parentDir.toString)
      def writerDf(id: Int) = spark.createDataFrame(
        Seq(org.apache.spark.sql.Row(id.toLong, "payload"),
          org.apache.spark.sql.Row(id.toLong, "payload2")).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("writer",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.StringType))))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { id =>
        new Thread(() => {
          try {
            val dest = graft.queries.core.publishOnce(spark, parent,
              "artifact_x") { tmp =>
              // widen the race window: both threads reach the election
              Thread.sleep(150)
              writerDf(id).coalesce(1).write.mode("overwrite")
                .parquet(tmp.toString)
            }
            results.add(dest.toString)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(errs.isEmpty, s"publisher threw: ${errs.asScala.headOption}")
      assert(results.size == 2, "both publishers must return")
      assert(results.asScala.toSet.size == 1, "both resolve one dest")
      // the committed artifact is EXACTLY one writer's full output
      val rows = spark.read.parquet(results.peek())
        .select(col("writer")).collect().map(_.getLong(0)).toSeq
      assert(rows.size == 2, s"torn artifact: $rows")
      assert(rows.toSet.size == 1, s"mixed-writer artifact: $rows")
      // and the root is clean: no generation dirs, no lock
      val leftovers = Option(parentDir.toFile.listFiles()).getOrElse(Array())
        .map(_.getName).filter(n => n.startsWith("._tmp_") ||
          n.startsWith("._lock_"))
      assert(leftovers.isEmpty,
        s"uncleaned publish droppings: ${leftovers.mkString(", ")}")
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(parentDir.toFile)
  }

  test("sidecarOnce: concurrent builders of one sidecar run the write " +
      "once and both read the full committed artifact (r16, verdict #5)") {
    import scala.jdk.CollectionConverters._
    val writes = new java.util.concurrent.atomic.AtomicInteger
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tag = "race_sidecar_" + System.nanoTime()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          val dest = graft.queries.core.sidecarOnce(spark, sf, tag) { tmp =>
            writes.incrementAndGet()
            Thread.sleep(150) // widen the race window
            spark.range(10).toDF("v").coalesce(1)
              .write.mode("overwrite").parquet(tmp.toString)
          }
          results.add(dest)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"sidecar build threw: ${errs.asScala.headOption}")
    assert(results.size == 2 && results.asScala.toSet.size == 1,
      "both builders must resolve the one committed sidecar")
    assert(writes.get() == 1,
      s"sidecar built ${writes.get()} times — the in-process lock + " +
        "publish marker must make the second builder a reader")
    assert(spark.read.parquet(results.peek()).count() == 10,
      "committed sidecar is torn")
    assert(new java.io.File(results.peek(), "_built").exists(),
      "sidecar missing the in-dir commit marker")
  }

  test("a stale lock from a crashed writer is broken, publish proceeds") {
    val parentDir = java.nio.file.Files
      .createTempDirectory("graft_regspec_stale")
    val priorTimeout = sys.props.get("graft.registry.lockTimeoutMs")
    sys.props("graft.registry.lockTimeoutMs") = "500"
    try {
      val parent = new org.apache.hadoop.fs.Path(parentDir.toString)
      // a writer that died mid-build: lock present, no artifact
      assert(new java.io.File(parentDir.toFile, "._lock_artifact_y")
        .createNewFile())
      import scala.jdk.CollectionConverters._
      val dest = graft.queries.core.publishOnce(spark, parent,
        "artifact_y") { tmp =>
        spark.createDataFrame(
          Seq(org.apache.spark.sql.Row(7L)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.LongType))))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      }
      assert(spark.read.parquet(dest.toString).count() == 1)
      assert(new java.io.File(new java.io.File(parentDir.toFile,
        "artifact_y"), "_built").exists(), "commit marker missing")
    } finally {
      priorTimeout match {
        case Some(v) => sys.props("graft.registry.lockTimeoutMs") = v
        case None => sys.props.remove("graft.registry.lockTimeoutMs")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(parentDir.toFile)
    }
  }
}
