package graft

import org.apache.spark.sql.functions._

/** Tokenizer/LM registry persistence (r13): after the registry is built
  * once, a DIFFERENT SparkSession in the same JVM (the pipeline-restart
  * stand-in — fresh session caches, same scratch) must serve every
  * tokenizer consumer from the persisted parquet WITHOUT re-entering a
  * trainer, and produce identical graded output. */
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

  test("registry dir carries one _built marker per artifact") {
    SparkEntry.queries("tokenizer_registry")(spark, sf).collect()
    val root = new java.io.File(graft.queries.core.scratchRoot,
      "registry_" + graft.queries.core.dirKey(sf))
    for (a <- Seq("bpe_merges", "unigram_pieces", "lm_threshold")) {
      assert(new java.io.File(root, s"_built_$a").exists(),
        s"missing _built marker for $a")
      assert(new java.io.File(root, a).exists(), s"missing parquet for $a")
    }
  }
}
