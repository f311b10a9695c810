package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.util.QueryExecutionListener

/** r14 (r13 verdict #7): the key-level window sweeps (PlanSweepSpec) only
  * see the plans the KEYS return — every once-per-session artifact
  * builder checkpoints its stages, so a weak window INSIDE a builder was
  * invisible to all three sweeps. This spec closes that blind spot: each
  * builder runs on a FRESH session (fresh session caches force a real
  * build) with a QueryExecutionListener attached — Spark routes
  * localCheckpoint through withAction, so every checkpointed stage's
  * physical plan is captured — and the same global/bounded-key window
  * detectors (PlanShapes, shared with PlanSweepSpec) run over ALL
  * captured plans. The allowlist records, per builder, the exact flagged
  * inventory and WHAT BOUNDS each window's input; equality is the
  * rot-check (a re-plan that adds or removes a shape fails loudly).
  */
class ArtifactPlanSpec extends SparkSpec {

  /** Capture the physical plan of every action `body` executes on a
    * fresh AQE-off session. Listener events post asynchronously — poll
    * until the capture count is stable.
    *
    * SEQUENTIAL-EXECUTION REQUIREMENT (r14 advisory): this mutates the
    * JVM-global `graft.registry.root` sys.prop for the duration of each
    * builder run — any concurrently-running suite resolving
    * core.registryRoot inside the window would persist into the
    * throwaway root. Safe because forked test suites run sequentially
    * (`Test / testForkedParallel := false`, pinned in build.sbt); the
    * temp root is deleted in the finally. */
  private def capturePlans(body: SparkSession => Unit): Seq[SparkPlan] = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // A fresh session forces the SESSION caches to rebuild, but parts of
    // some builders ride the persist-once REGISTRY (lm_threshold): in a
    // shared-JVM suite run an earlier suite has already persisted them
    // and the builder would silently skip its threshold stage — point
    // the registry at a throwaway root so every stage truly builds.
    val priorRoot = sys.props.get("graft.registry.root")
    val tmpRoot = java.nio.file.Files
      .createTempDirectory("graft_apspec_reg")
    sys.props("graft.registry.root") = tmpRoot.toString
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    s2.listenerManager.register(listener)
    try {
      body(s2)
      // require a full 2 s of no new events before trusting the capture
      // (a 300 ms window exited early under co-tenant load and read a
      // PARTIAL plan set — the listener bus trails the actions)
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 60000000000L
      while (stable < 20 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = plans.size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally {
      s2.listenerManager.unregister(listener)
      priorRoot match {
        case Some(v) => sys.props("graft.registry.root") = v
        case None => sys.props.remove("graft.registry.root")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(tmpRoot.toFile)
    }
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  private val builders: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    ("lm_gate_artifact", (s2, dir) => {
      val (a, b) = graft.queries.CurationQ.lmGateArtifact(s2, dir)
      a.count(); b.count(); ()
    }),
    ("clf_gate_artifact", (s2, dir) => {
      val (a, b) = graft.queries.CurationQ.clfGateArtifact(s2, dir)
      a.count(); b.count(); ()
    }),
    ("unigram_artifact", (s2, dir) => {
      val (a, b, c) = graft.queries.TextQ.unigramArtifact(s2, dir)
      a.count(); b.count(); c.count(); ()
    }),
    ("bpe_train_merges", (s2, dir) => {
      graft.queries.TextQ.bpeTrainMerges(s2, dir).count(); ()
    }))

  /** builder → (sorted flagged global windows, sorted flagged
    * bounded-key windows) with the recorded justification. Counts are
    * exact — the rot-check. */
  private val expected: Map[String, (Seq[String], Seq[String], String)] =
    Map(
      "lm_gate_artifact" -> ((Seq("Window"), Seq.empty,
        "one global threshold-rank prefix over the DISTINCT r6-rounded " +
          "score table — ≤ 10^6+1 rows by rounding (the quality_lm_gate " +
          "bound, previously recorded key-side only)")),
      "clf_gate_artifact" -> ((Seq("Window"), Seq.empty,
        "one global threshold-rank prefix over the bounded distinct-" +
          "score histogram (the quality_clf_gate 30th-percentile cut)")),
      "unigram_artifact" -> ((Seq.empty, Seq.empty,
        "DP/backtrack are agg-argmax + keyed joins on the word domain — " +
          "no window anywhere in the trainer")),
      "bpe_train_merges" -> ((Seq.empty, Seq.empty,
        "per-round argmax rides a 1-row broadcast; merges are keyed " +
          "joins on the symbol domain — no window")))

  for ((name, force) <- builders)
    test(s"artifact builder $name: checkpointed stages carry exactly the " +
      "recorded window inventory") {
      val plans = capturePlans(s2 => force(s2, sf))
      assert(plans.nonEmpty, s"$name: no plans captured — the builder " +
        "did not run (stale session cache?) or the listener broke")
      val global = plans.flatMap(PlanShapes.globalWindows).sorted
      val bounded = plans.flatMap(PlanShapes.boundedKeyWindows).sorted
      val (expG, expB, why) = expected(name)
      assert(global == expG && bounded == expB,
        s"$name window inventory drifted: global=$global (expected " +
          s"$expG), boundedKey=$bounded (expected $expB) — re-record " +
          s"with a bound or re-plan ($why)")
    }
}
