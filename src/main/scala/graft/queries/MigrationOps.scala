package graft.queries

import graft.analyzer.Analyzer
import graft.loader.MigrationLoader
import org.apache.spark.sql.functions._
import Catalog._

/** The migration engine's own dataflow exposed as queries — loader,
  * analyzer, pending-set computation (SURVEY.md §2.2 S1-S3, R1-R9, E3).
  * These read the repo's SQL fixture corpus, not the sf parquet tables,
  * so they carry no DuckDB oracle (rows-only checks); their semantics
  * are covered by the ScalaTest suites against the reference's expected
  * findings.
  */
object MigrationOps {

  val fixturesDir = "/root/repo/fixtures/migrations"

  def queries: Seq[(String, Q)] = Seq(

    // Loader output: version/name/checksum/pairing (S1-S3 + T1 + T2).
    "m01_load_migrations" -> Q(
      (s, _) =>
        MigrationLoader.load(s, fixturesDir)
          .select(col("version"), col("name"), col("checksum"),
            (col("downSql") =!= "").as("has_down"),
            length(col("upSql")).as("up_len"))
          .orderBy(col("version")),
      None),

    // Analyzer findings: statements × rules flatMap (R1-R9).
    "m02_findings" -> Q(
      (s, _) => {
        val a = new Analyzer(targetPgVersion = 14)
        a.findingsDs(MigrationLoader.load(s, fixturesDir))
          .select(col("version"),
            col("finding.rule").as("rule"),
            col("finding.severity").as("severity"),
            col("finding.table").as("table_name"),
            col("finding.lockType").as("lock_type"),
            col("finding.stmtIndex").as("stmt_index"))
          .orderBy(col("version"), col("rule"))
      },
      None),

    // Per-migration rollup: max severity + rule set (§3.1 pipeline).
    "m03_analysis_summary" -> Q(
      (s, _) =>
        Analyzer.summaryDf(s, MigrationLoader.load(s, fixturesDir)),
      None),

    // Pending-set: migrations not yet applied — the left-anti join the
    // executor runs before applying (E3). Tracker state is a literal
    // 6-row table here; in production it's the parquet tracker.
    "m04_pending_antijoin" -> Q(
      (s, _) => {
        import s.implicits._
        val applied = Seq("001", "002", "003").toDF("version")
        MigrationLoader.load(s, fixturesDir)
          .join(applied, Seq("version"), "left_anti")
          .select(col("version"), col("name"))
          .orderBy(col("version"))
      },
      None))
}
