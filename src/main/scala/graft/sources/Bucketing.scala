package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join layout for fact⋈fact
  * joins at 100 TB (SCALE.md "Joins").
  *
  * A shuffled join on orderkey moves BOTH fact tables across the
  * network every query. Writing each side bucketed by the join key
  * (`bucketBy(n, key)` + `sortBy`) pre-partitions the data at rest:
  * Catalyst recognizes matching bucket specs and plans a sort-merge
  * join with NO Exchange on either side — the shuffle is paid once at
  * write time, amortized over every subsequent join. The bucket count
  * is the join parallelism; size it to cores × executors at the target
  * scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** True iff the executed plan of `df` contains no shuffle exchange —
    * the co-location check used by tests and plan audits.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
