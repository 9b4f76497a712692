package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffled join sends every row of one key to one reducer; a hot key
  * (the null customer, the default tenant) turns 999 executors idle and
  * one into the job's critical path. Salting splits each hot key into
  * `saltBuckets` sub-keys: the large side picks a random-but-
  * deterministic salt per row, the small side replicates each row
  * across all salts, and the join runs on (key, salt).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * default on in our sessions) does this re-plan automatically for
  * sort-merge joins at runtime; this explicit form exists for the cases
  * AQE can't see (pre-aggregation skew, broadcast-ineligible
  * dimensions) and as the documented 100 TB mitigation.
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, salted.
    * Deterministic: the salt is a hash of the large side's whole row,
    * not a random number — reruns produce identical partitioning.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val largeCols = large.columns.map(col).toIndexedSeq
    val salted = large.withColumn("__salt",
      pmod(xxhash64(largeCols: _*), lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
