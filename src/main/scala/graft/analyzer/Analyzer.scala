package graft.analyzer

import graft.classify.SqlClassifier
import graft.model.{AnalysisResult, Finding, Migration, Severity}
import graft.rules.{FileRule, Registry, Rule, RuleContext}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Migration danger analyzer.
  *
  * Reference driver: `internal/analyzer/analyzer.go:53-110` — parse each
  * migration, run every statement through every registered rule, fold
  * max severity. The Spark shape (SURVEY.md §2.2) is a flatMap/explode
  * cross of statements × rules producing a `Dataset[Finding]`, with
  * per-migration rollup via `groupBy(version).agg(max(severity))` — or,
  * as here for the typed API, the per-record fold inside `map` (the
  * statements×rules cross is row-local; only the migration set is
  * distributed).
  */
final class Analyzer(
    rules: Seq[Rule] = Registry.defaultRules,
    targetPgVersion: Int = 14,
    fileRules: Seq[FileRule] = Registry.defaultFileRules)
    extends Serializable {

  /** Analyze one migration (pure; runs on executors inside `map`). */
  def analyze(m: Migration): AnalysisResult = {
    val stmts = SqlClassifier.parseOrThrow(m.upSql)
    val findings = stmts.zipWithIndex.flatMap { case (stmt, idx) =>
      val ctx = RuleContext(targetPgVersion, idx)
      rules.flatMap(_.check(stmt, ctx))
    } ++ fileRules.flatMap(_.checkFile(stmts, targetPgVersion))
    val maxSev =
      if (findings.isEmpty) Severity.Safe else findings.map(_.severity).max
    AnalysisResult(m.version, m.name, findings, maxSev)
  }

  /** Analyze a local collection (driver-side, for the executor gate on
    * small migration sets — migration metadata is tens of rows).
    */
  def analyzeAll(ms: Seq[Migration]): Seq[AnalysisResult] = ms.map(analyze)

  /** Distributed analysis: Dataset[Migration] → Dataset[AnalysisResult]. */
  def analyzeDs(ms: Dataset[Migration]): Dataset[AnalysisResult] = {
    val spark = ms.sparkSession
    import spark.implicits._
    val self = this
    ms.map(self.analyze _)
  }

  /** Distributed flat findings view: one row per finding, carrying the
    * migration version (SURVEY.md §3.1 minimum slice shape).
    */
  def findingsDs(ms: Dataset[Migration]): Dataset[(String, Finding)] = {
    val spark = ms.sparkSession
    import spark.implicits._
    val self = this
    ms.flatMap(m => self.analyze(m).findings.map(f => (m.version, f)))
      .toDF("version", "finding").as[(String, Finding)]
  }
}

object Analyzer {

  /** The analyze-command pipeline as one DataFrame query:
    * migrations → explode(statements×rules findings) →
    * groupBy(version) max severity + finding count. Columns sorted for
    * stable downstream compare.
    */
  def summaryDf(spark: SparkSession, ms: Dataset[Migration],
      targetPgVersion: Int = 14) = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = new Analyzer(targetPgVersion = targetPgVersion)
    val flat = ms.flatMap { m =>
      val r = a.analyze(m)
      if (r.findings.isEmpty)
        Seq((m.version, m.name, "", Severity.Safe, "", ""))
      else r.findings.map(f =>
        (m.version, m.name, f.rule, f.severity, f.table, f.lockType))
    }.toDF("version", "name", "rule", "severity", "table", "lock_type")
    flat.groupBy($"version", $"name")
      .agg(
        max($"severity").as("max_severity"),
        sum(when($"rule" =!= "", 1).otherwise(0)).as("n_findings"),
        sort_array(collect_set(when($"rule" =!= "", $"rule"))).as("rules"))
      .orderBy($"version")
  }
}
