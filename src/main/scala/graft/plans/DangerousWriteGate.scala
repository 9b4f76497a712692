package graft.plans

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

/** Plan-level danger gate: the Catalyst analogue of the reference's
  * analyzer gate on dangerous DDL (`internal/cli/apply.go` blocks
  * HIGH/CRITICAL migrations unless forced). Here the protected resource
  * is a storage path (e.g. the migration tracker's directory): any
  * Overwrite-mode file write whose target is under a protected root is
  * rejected at PLAN time — before a single task runs — unless the
  * session is explicitly forced.
  *
  * Configuration (session confs, settable at runtime):
  *   - `spark.graft.protectedPaths`: comma-separated path roots
  *   - `spark.graft.force`: "true" bypasses the gate (the --force flag)
  *
  * Installed either at session build via [[GraftPlanExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftPlanExtensions`) or on a
  * live session via [[DangerousWriteGate.install]] (extra-optimization
  * hook — check rules can't be added post-creation, optimizer rules
  * can).
  */
object DangerousWriteGate extends Rule[LogicalPlan] {

  final val ProtectedPathsKey = "spark.graft.protectedPaths"
  final val ForceKey = "spark.graft.force"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val roots = conf.getConfString(ProtectedPathsKey, "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    if (roots.nonEmpty &&
        !conf.getConfString(ForceKey, "false").toBoolean) {
      plan.foreach {
        case w: InsertIntoHadoopFsRelationCommand
            if w.mode == SaveMode.Overwrite =>
          val target = w.outputPath.toUri.getPath
          roots.find(r => target == r || target.startsWith(r + "/"))
            .foreach { root =>
              throw graft.model.DangerousWrite(target, root)
            }
        case _ => ()
      }
    }
    plan
  }

  /** Attach to a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  /** Detach from a live session. */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == this)
}

/** `spark.sql.extensions` entry point registering the gate. */
class GraftPlanExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DangerousWriteGate)
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
  }
}
