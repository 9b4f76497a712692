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
    // Arrays are emitted comma-joined: the verify harness round-trips
    // results through pandas, where array cells are unhashable/unsortable.
    "m03_analysis_summary" -> Q(
      (s, _) =>
        Analyzer.summaryDf(s, MigrationLoader.load(s, fixturesDir))
          .withColumn("rules", array_join(col("rules"), ",")),
      None),

    // Statement-type census via an explicit udf() over the classifier —
    // the scalar-UDF surface (SURVEY §2.3 UDF/UDAF row). Kept off data-
    // scale hot paths by policy; migration metadata is where a UDF
    // around existing Scala logic is the right tool.
    "m05_stmt_types" -> Q(
      (s, _) => {
        val classify = udf((sql: String) =>
          graft.classify.SqlClassifier.parseOrThrow(sql)
            .map(_.getClass.getSimpleName.stripSuffix("$")))
        MigrationLoader.load(s, fixturesDir)
          .select(col("version"), explode(classify(col("upSql")))
            .as("stmt_type"))
          .groupBy(col("stmt_type"))
          .agg(count(lit(1)).as("n"),
            array_join(sort_array(collect_set(col("version"))), ",")
              .as("versions"))
          .orderBy(col("stmt_type"))
      },
      None),

    // Typed Aggregator[IN, BUF, OUT]: worst finding per migration with
    // the causing rule as payload (the UDAF surface).
    "m06_worst_finding" -> Q(
      (s, _) => {
        import s.implicits._
        val a = new graft.analyzer.Analyzer()
        val findings = MigrationLoader.load(s, fixturesDir)
          .flatMap { m =>
            val r = a.analyze(m)
            if (r.findings.isEmpty) Seq((m.version, graft.model.Severity.Safe, ""))
            else r.findings.map(f => (m.version, f.severity, f.rule))
          }
        findings.groupByKey(_._1)
          .mapValues(t => (t._2, t._3))
          .agg(new graft.functions.MaxSeverityAgg().toColumn.name("worst"))
          .toDF("version", "worst")
          .orderBy(col("version"))
      },
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
