package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark implementation plus (when the operator
  * is SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB
  * on the same parquet tables. Queries without oracle SQL get the
  * driver's weaker rows-only check.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench */
    bench: Boolean = false)

object Catalog {

  /** Read one test table (parquet scan; filters/pruning push down).
    *
    * `events.ts` has shipped as BOTH physical types across driver data
    * generations: TIMESTAMP(NANOS) (rounds 1-6), which Spark 4 rejects
    * by default, and plain µs TIMESTAMP with isAdjustedToUTC=false
    * (round 7+), which Spark 4 infers as TIMESTAMP_NTZ. Either way the
    * rest of the engine expects one canonical type — session-local
    * (UTC) microsecond TIMESTAMP — so normalize here: nanos read as
    * longs and floor-convert; NTZ casts to LTZ (an identity on the
    * stored values under the UTC session timezone). The DuckDB oracles
    * do the same with `cast(ts as timestamp)` (ns → µs truncation /
    * µs no-op), keeping both engines bit-identical.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema.find(_.name == "ts") match {
        case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
          // integer `div`, not `/`: double division loses sub-µs precision
          // at nanosecond-epoch magnitudes (> 2^53)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case Some(f)
            if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  // --- determinism helpers ------------------------------------------------
  // Double addition is not associative, and Spark's partition-parallel
  // aggregation order differs from DuckDB's — so raw double sums/avgs are
  // not reproducible bit-for-bit. Casting each addend to an exact decimal
  // first makes the aggregate exact and order-independent in BOTH engines;
  // the final cast back to double is then deterministic. Per-row double
  // arithmetic (price * (1-discount)) IS deterministic (same IEEE ops on
  // the same values) and needs no special handling.

  /** Order-independent sum of a money-like column: decimal(18,2). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Same for per-row double products. Scale 6 exactly: a product of
    * three 2-decimal factors has at most 6 true decimal digits, so the
    * double→decimal(·,6) cast never hits a rounding-mode tie (scale 4
    * CAN — x.xxxx5 exactly — and Spark HALF_UP vs DuckDB then disagree
    * by 1e-4). And the sum's unscaled integer stays below 2^53 at the
    * tested scale factors, so BOTH engines' final decimal→double cast
    * is a single exact-int division — correctly rounded, bit-identical
    * (at scale 10 the int exceeds 2^53 and DuckDB's two-step conversion
    * drifts 1 ULP from Spark's correctly-rounded BigDecimal cast).
    */
  def dsum4(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  /** Order-independent average: exact decimal sum, then double division. */
  def davg(c: Column): Column = (dsum(c) / count(c)).cast("double")

  /** SQL twins (DuckDB syntax is ANSI here). */
  def sqlDsum(e: String): String =
    s"cast(sum(cast($e as decimal(18,2))) as double)"
  def sqlDsum4(e: String): String =
    s"cast(sum(cast($e as decimal(24,6))) as double)"
  def sqlDavg(e: String): String =
    "cast(" + sqlDsum(e) + " / count(" + e + ") as double)"

  /** Materialize a multi-consumer corpus-scale frame: localCheckpoint
    * by default (eager, lineage-cutting, MEMORY_AND_DISK), or
    * persist(DISK_ONLY) + eager count under
    * `spark.graft.graph.materialize=disk` / SPARK_GRAFT_GRAPH_MAT=disk
    * — the posture a 1000-executor run wants when the frame outgrows
    * executor memory. One definition shared by the graph loops
    * (GraphOps) and d14's corpus-scale banded frame (the r7 residual
    * nit: the graph family had the dial, the dedup family's one
    * corpus-scale checkpoint did not). Mode equivalence is a
    * QueriesSpec assertion.
    */
  private[queries] def mat(df: DataFrame): DataFrame = {
    val mode = df.sparkSession.conf
      .getOption("spark.graft.graph.materialize")
      .orElse(sys.env.get("SPARK_GRAFT_GRAPH_MAT"))
      .getOrElse("checkpoint")
    if (mode == "disk") {
      val p = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      p.count()
      p
    } else df.localCheckpoint()
  }

  /** The full declared inventory (SURVEY.md §2.3 + training-data ops). */
  def all: Seq[(String, Q)] =
    Relational.queries ++ Relational2.queries ++ TextOps.queries ++
      EventOps.queries ++ MigrationOps.queries ++ MediaOps.queries ++
      GraphOps.queries
}
