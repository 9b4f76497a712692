package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned JDBC extract / load — the data-plane half of database
  * migration as ETL (BASELINE north star: "DataFrame read/write with
  * JDBC connectors"; reference S5/S6 are its control-plane analogues).
  *
  * Scale posture (SURVEY.md §7.4 item 6): a single-connection JDBC read
  * serializes 100 TB through one socket. [[readPartitioned]] splits the
  * scan into `numPartitions` range predicates on a numeric column —
  * one connection per task, each reading `(hi-lo)/n` of the key space —
  * and Catalyst additionally pushes filters/projections into the
  * generated per-partition queries. Writers batch inserts per
  * partition. The bounds can come from [[keyBounds]] (one cheap
  * MIN/MAX roundtrip) when the caller doesn't know them.
  */
object JdbcEtl {

  /** Full-table single-stream read — only for dimension-scale tables. */
  def read(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, table, props).load()

  /** Range-partitioned parallel read: `numPartitions` concurrent
    * connections, each scanning one slice of `[lower, upper]` on
    * `partitionColumn`.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame =
    reader(spark, url, table, props)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** MIN/MAX of the partition key — one aggregate roundtrip, used to
    * derive partitioning bounds without caller knowledge.
    */
  def keyBounds(url: String, table: String, column: String,
      props: Map[String, String] = Map.empty): (Long, Long) = {
    val conn = connect(url, props)
    try {
      val rs = conn.createStatement()
        .executeQuery(s"SELECT MIN($column), MAX($column) FROM $table")
      rs.next()
      (rs.getLong(1), rs.getLong(2))
    } finally conn.close()
  }

  /** Convenience: partitioned read with auto-discovered bounds. */
  def extract(spark: SparkSession, url: String, table: String,
      partitionColumn: String, numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame = {
    val (lo, hi) = keyBounds(url, table, partitionColumn, props)
    readPartitioned(spark, url, table, partitionColumn, lo, hi,
      numPartitions, props)
  }

  /** Bulk load: per-partition batched inserts (`batchsize`), each task
    * its own connection/transaction.
    */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append, batchSize: Int = 10000,
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
    props.foreach { case (k, v) => w.option(k, v) }
    w.save()
  }

  private def reader(spark: SparkSession, url: String, table: String,
      props: Map[String, String]) = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foreach { case (k, v) => r.option(k, v) }
    r
  }

  private def connect(url: String, props: Map[String, String]) = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    java.sql.DriverManager.getConnection(url, p)
  }
}

/** Post-migration validation: the "validate" leg of extract-transform-
  * load-validate (SURVEY.md §0). Count and content parity between
  * source and target — content via order-insensitive per-row hash
  * aggregation (xor of row hashes), so no sort and one aggregate per
  * side.
  */
object MigrationValidate {
  import org.apache.spark.sql.functions._

  final case class TableDiff(srcRows: Long, dstRows: Long,
      srcOnlyRows: Long, dstOnlyRows: Long) {
    def isEqual: Boolean = srcRows == dstRows && srcOnlyRows == 0 &&
      dstOnlyRows == 0
  }

  /** Exact symmetric difference via left-anti joins on all columns. */
  def diff(src: DataFrame, dst: DataFrame): TableDiff = {
    val cols = src.columns.toSeq
    TableDiff(
      srcRows = src.count(),
      dstRows = dst.count(),
      srcOnlyRows = src.join(dst, cols, "left_anti").count(),
      dstOnlyRows = dst.join(src, cols, "left_anti").count())
  }

  /** Snapshot-to-snapshot change capture (CDC-lite): classify target
    * rows as inserts / updates / deletes by key + row-hash comparison.
    * Two shuffles on the key — no full-row sort, no driver data. The
    * incremental-sync primitive when the source offers no changelog.
    */
  def incrementalDiff(prev: DataFrame, cur: DataFrame,
      keys: Seq[String]): DataFrame = {
    def hashed(df: DataFrame) = df.select(
      keys.map(col) :+
        xxhash64(df.columns.sorted.map(col).toIndexedSeq: _*).as("__rh"): _*)
    val p = hashed(prev).withColumnRenamed("__rh", "__rh_prev")
    val c = hashed(cur).withColumnRenamed("__rh", "__rh_cur")
    val joined = c.join(p, keys, "full_outer")
    joined.select(
      keys.map(col) :+
        when(col("__rh_prev").isNull, "insert")
          .when(col("__rh_cur").isNull, "delete")
          .when(col("__rh_prev") =!= col("__rh_cur"), "update")
          .as("change"): _*)
      .filter(col("change").isNotNull)
  }

  /** O(1)-shuffle content fingerprint: xor-aggregate of xxhash64 row
    * hashes — order- and partitioning-independent (and overflow-free
    * under ANSI mode, unlike a sum); equal tables ⇒ equal fingerprints
    * modulo multiset-xor cancellation, which the row count guards.
    */
  def contentFingerprint(df: DataFrame): Long = {
    val hashed = df.select(
      xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
    val row = hashed.agg(
      call_function("bit_xor", col("h")).as("hxor"),
      count(lit(1)).as("n")).head()
    // bit_xor over zero rows aggregates to NULL — fingerprint empty as 0
    val hxor = if (row.isNullAt(0)) 0L else row.getLong(0)
    hxor * 31 + row.getLong(1)
  }
}
