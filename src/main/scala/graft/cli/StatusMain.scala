package graft.cli

import graft.loader.MigrationLoader
import graft.tracker.ParquetTracker

/** `status` command: applied / pending / rolled-back overview — the
  * reference left this as a Phase-8 stub (`internal/cli/status.go:22-26`,
  * `plans/checklist.md:127-138`); implemented here per its checklist:
  * applied list with timestamps + durations, pending list, checksum
  * drift warnings.
  *
  * Usage: runMain graft.cli.StatusMain <migrationsDir> <trackerDir>
  */
object StatusMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: StatusMain <migrationsDir> <trackerDir>")
      sys.exit(2)
    }
    val (dir, trackerDir) = (args(0), args(1))
    val spark = CliSpark.session("graft-status")
    try {
      val migrations = MigrationLoader.loadLocal(dir)
      val tracker = new ParquetTracker(spark, trackerDir)
      tracker.ensureTable()
      val applied = tracker.getApplied()
      val appliedVersions = applied.map(_.version).toSet
      val byVersion = migrations.map(m => m.version -> m).toMap

      println(s"Migrations dir: $dir")
      println(s"Tracker:        $trackerDir")
      println(s"\nApplied (${applied.length}):")
      applied.foreach { a =>
        val drift = byVersion.get(a.version) match {
          case Some(m) if m.checksum != a.checksum => "  [CHECKSUM DRIFT]"
          case None => "  [FILE MISSING]"
          case _ => ""
        }
        println(f"  ${a.version}%-16s ${a.filename}%-40s ${a.appliedAt} ${a.durationMs}%5dms$drift")
      }
      val pending = migrations.filterNot(m => appliedVersions(m.version))
      println(s"\nPending (${pending.length}):")
      pending.foreach(m => println(f"  ${m.version}%-16s ${m.name}"))
      if (pending.isEmpty) println("  (none — up to date)")
    } finally spark.stop()
  }
}
