package graft.queries

import graft.analyzer.Analyzer
import graft.loader.MigrationLoader
import org.apache.spark.sql.functions._
import Catalog._

/** The migration engine's own dataflow exposed as queries — loader,
  * analyzer, pending-set computation (SURVEY.md §2.2 S1-S3, R1-R9, E3).
  * These read the repo's SQL fixture corpus, not the sf parquet tables.
  * The loader-shaped ones (m01, m04) ARE oracle-verified — DuckDB
  * re-derives version/name/checksum/pairing from the same files via
  * read_text + regexp + sha256. The analyzer/classifier ones embed the
  * rule engine and stay rows-only, covered by the ScalaTest suites
  * against the reference's expected findings.
  */
object MigrationOps {

  val fixturesDir = "/root/repo/fixtures/migrations"

  /** Shared oracle CTE: filename→(version, name, direction) parse +
    * whitespace trim + up/down pivot, mirroring MigrationLoader exactly
    * (same regex, same \s trim, orphan .down skipped).
    */
  private val loaderCte: String = {
    val re = "^(?:V(\\d+)|(\\d{14}))_(.+)\\.(up|down)\\.sql$"
    s"""WITH f AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname, content
        FROM read_text('$fixturesDir/*.sql')),
      p AS (
        SELECT
          CASE WHEN regexp_extract(fname, '$re', 1) <> ''
               THEN regexp_extract(fname, '$re', 1)
               ELSE regexp_extract(fname, '$re', 2) END AS version,
          regexp_extract(fname, '$re', 3) AS name,
          regexp_extract(fname, '$re', 4) AS direction,
          regexp_replace(content, '^\\s+|\\s+$$', '', 'g') AS c
        FROM f WHERE regexp_extract(fname, '$re', 4) <> ''),
      piv AS (
        SELECT version, name,
          max(CASE WHEN direction = 'up' THEN c END) AS up_sql,
          max(CASE WHEN direction = 'down' THEN c END) AS down_sql
        FROM p GROUP BY version, name)"""
  }

  def queries: Seq[(String, Q)] = Seq(

    // Loader output: version/name/checksum/pairing (S1-S3 + T1 + T2).
    "m01_load_migrations" -> Q(
      (s, _) =>
        MigrationLoader.load(s, fixturesDir)
          .select(col("version"), col("name"), col("checksum"),
            (col("downSql") =!= "").as("has_down"),
            length(col("upSql")).as("up_len"))
          .orderBy(col("version")),
      Some(s"""$loaderCte
        SELECT version, name, sha256(up_sql) AS checksum,
          down_sql IS NOT NULL AND down_sql <> '' AS has_down,
          cast(strlen(up_sql) as int) AS up_len
        FROM piv WHERE up_sql IS NOT NULL
        ORDER BY version""")),

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
      Some(s"""$loaderCte
        SELECT version, name FROM piv
        WHERE up_sql IS NOT NULL
          AND version NOT IN ('001', '002', '003')
        ORDER BY version""")))
}
