package graft.cli

import graft.analyzer.Analyzer
import graft.classify.SqlClassifier
import graft.loader.MigrationLoader
import graft.model.Severity
import graft.tracker.ParquetTracker

/** `plan` command: pre-apply impact estimation — the reference's
  * Phase-7 stub (`internal/cli/plan.go:22-26`,
  * `plans/checklist.md:112-123`), implemented per its checklist: for
  * each *pending* migration, the statements it will run, the locks
  * they take, whether execution is transactional (CONCURRENTLY ops are
  * not), danger findings, and the would-block verdict the apply gate
  * will reach.
  *
  * Usage: runMain graft.cli.PlanMain <migrationsDir> <trackerDir>
  *        [--pg-version N] [--pending-only]
  *
  * `--pending-only` implements the flag the reference registers on the
  * stub (`plan.go:19`): by default the plan lists EVERY migration (the
  * applied ones as one-line status rows), with the flag it restricts
  * to pending — the view a CI gate wants.
  */
object PlanMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: PlanMain <migrationsDir> <trackerDir> [--pg-version N] [--pending-only]")
      sys.exit(2)
    }
    val (dir, trackerDir) = (args(0), args(1))
    var pgVersion = 14
    var pendingOnly = false
    var i = 2
    while (i < args.length) {
      args(i) match {
        case "--pg-version" =>
          pgVersion = CliArgs.value(args, i, "--pg-version").toInt; i += 2
        case "--pending-only" => pendingOnly = true; i += 1
        case other => System.err.println(s"unknown flag: $other"); sys.exit(2)
      }
    }
    val spark = CliSpark.session("graft-plan")
    try {
      val migrations = MigrationLoader.loadLocal(dir)
      val tracker = new ParquetTracker(spark, trackerDir)
      tracker.ensureTable()
      val appliedSet = tracker.getApplied().map(_.version).toSet
      val pending = migrations.filterNot(m => appliedSet(m.version))
      val analyzer = new Analyzer(targetPgVersion = pgVersion)
      println(s"Plan: ${pending.length} pending migration(s) " +
        s"(${appliedSet.size} already applied; target PostgreSQL $pgVersion)\n")
      var anyBlocked = false
      if (!pendingOnly) migrations.filter(m => appliedSet(m.version))
        .foreach { m =>
          println(s"${m.version} ${m.name} — already applied")
        }
      pending.foreach { m =>
        val result = analyzer.analyze(m)
        val stmts = SqlClassifier.parseOrThrow(m.upSql)
        val concurrent = SqlClassifier.containsConcurrentOp(m.upSql)
        val mode = if (concurrent) "NON-TRANSACTIONAL (CONCURRENTLY)"
          else "transactional"
        val verdict =
          if (result.hasHighOrCritical) { anyBlocked = true; "BLOCKED by apply gate (use --force)" }
          else "will apply"
        println(s"${m.version} ${m.name} — ${stmts.length} statement(s), $mode → $verdict")
        stmts.zipWithIndex.foreach { case (st, idx) =>
          val kind = st.getClass.getSimpleName.stripSuffix("$")
          println(s"    [$idx] $kind: ${SqlClassifier.truncateSql(st.sql, 70)}")
        }
        result.findings.foreach { f =>
          println(s"    ! ${Severity.label(f.severity)} [${f.rule}] " +
            s"table=${f.table} lock=${f.lockType}")
        }
        if (m.downSql.isEmpty)
          println("    ~ no down migration — rollback will not be possible")
      }
      if (pending.isEmpty) println("(nothing to do — up to date)")
      else if (anyBlocked)
        println("\nApply would be blocked: HIGH/CRITICAL findings present.")
    } finally spark.stop()
  }
}
