package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** The ONE set of physical window-shape detectors shared by
  * PlanSweepSpec (key-returned plans) and ArtifactPlanSpec (plans the
  * artifact builders execute behind their checkpoints) — two copies of
  * a detector is how a re-plan passes one sweep and rots in the other. */
object PlanShapes {

  /** Bounded-cardinality fixture dimensions (documents, events, TPC-H):
    * a window partitioned ONLY by these has shards that grow with the
    * corpus — the r12/r13 weak class. */
  val boundedDims: Set[String] =
    Set("source", "lang", "split", "lang_pred", "event_type",
      "p_type", "p_brand", "p_container", "l_returnflag", "l_linestatus",
      "l_shipmode", "o_orderpriority", "o_orderstatus", "c_mktsegment",
      "n_name", "r_name")

  /** Every physical window node with no PARTITION BY in `plan`
    * (single-task sort of its whole input). */
  def globalWindows(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
    }

  /** Window nodes whose partitionSpec is nonempty and draws only from
    * the bounded fixture dimensions. */
  def boundedKeyWindows(plan: SparkPlan): Seq[String] =
    plan.collect {
      case w: WindowExec
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
              .forall(boundedDims) => w.nodeName
      case w: WindowGroupLimitExec
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.toSeq.map(_.name))
              .forall(boundedDims) => w.nodeName
    }
}
