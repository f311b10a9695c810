package graft

/** r15 (verdict #7): `-Dgraft.checkpoint.mode=reliable` flips every
  * eager-checkpoint swap point (core.CkptOps — the SCALING.md inventory)
  * from executor-local blocks to reliable `checkpoint()` files on
  * `graft.checkpoint.dir`. Both modes cut lineage eagerly, so an
  * iterative key must produce IDENTICAL rows either way — only the
  * storage substrate (and executor-loss recovery story) differs.
  *
  * SEQUENTIAL-EXECUTION REQUIREMENT: mutates JVM-global sys.props for
  * the duration of the reliable run — safe because forked suites run
  * sequentially (`Test / testForkedParallel := false`, build.sbt). */
class CheckpointModeSpec extends SparkSpec {

  test("neardup_clusters: reliable checkpoints == local checkpoints") {
    val local = SparkEntry.queries("neardup_clusters")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(local.nonEmpty)

    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val priorMode = sys.props.get("graft.checkpoint.mode")
    val priorDir = sys.props.get("graft.checkpoint.dir")
    sys.props("graft.checkpoint.mode") = "reliable"
    sys.props("graft.checkpoint.dir") = ckptDir.toString
    try {
      val reliable = SparkEntry.queries("neardup_clusters")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(reliable == local,
        "reliable-mode checkpointing changed the result")
      // the mode was actually exercised: checkpoint files were written
      val wrote = Option(ckptDir.toFile.listFiles()).getOrElse(Array())
      assert(wrote.nonEmpty, "reliable mode wrote no checkpoint files — " +
        "the switch never reached a ckpt() call")
    } finally {
      priorMode match {
        case Some(v) => sys.props("graft.checkpoint.mode") = v
        case None => sys.props.remove("graft.checkpoint.mode")
      }
      priorDir match {
        case Some(v) => sys.props("graft.checkpoint.dir") = v
        case None => sys.props.remove("graft.checkpoint.dir")
      }
      org.apache.commons.io.FileUtils.deleteQuietly(ckptDir.toFile)
    }
  }
}
