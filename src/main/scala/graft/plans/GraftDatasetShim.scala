package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shim exposing the package-private `Dataset.ofRows` so graft's
  * custom logical operators (graft.plans.TopKPerKey) can wrap a plan
  * as a DataFrame — the established public extension pattern (see
  * SNIPPETS.md [3], a DatasetFactory in the spark.sql package doing
  * exactly this; Spark offers no public LogicalPlan → DataFrame
  * constructor).
  */
object GraftDatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Exposes `NormalizeFloatingNumbers.normalize` (private[sql]): the
    * canonical -0.0→0.0 / NaN-bit normalizer Spark applies to grouping
    * and join keys of BUILT-IN operators only. Custom operators that
    * hash or group on caller-supplied keys (TopKPerKey) must apply it
    * themselves or float keys split on bit patterns.
    */
  def normalizeFloats(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
      .normalize(e)
}
