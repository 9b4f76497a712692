package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with the same key whose timestamp is ≤ the left timestamp.
  *
  * Spark has no built-in as-of join. The naive formulations are
  * disqualifying at scale: a range-predicate join plans as a
  * broadcast-nested-loop (O(n·m) per key), and "join then
  * row_number=1" materializes every (left, right-before) pair before
  * discarding all but one. This implementation is the single-shuffle
  * union trick (SURVEY.md §2.3 flags as-of as extension-only; the
  * pattern is standard in the streams/timeseries literature):
  *
  *   1. union left and right rows, tagged, right rows carrying their
  *      payload and left rows nulls;
  *   2. one shuffle: partition by key, sort by (ts, tag) — right rows
  *      sort before left rows at equal ts, making the match inclusive;
  *   3. running `last(payload, ignoreNulls)` fills each left row with
  *      the latest right payload at-or-before its timestamp;
  *   4. keep the left rows.
  *
  * Cost: one shuffle of |L|+|R| rows and a per-partition sort —
  * the same shape as a sort-merge join, with no pair blow-up. Skewed
  * keys behave like any window partition (salt + two-phase if needed).
  */
object AsOfJoin {

  /** Left as-of join.
    *
    * @param left       left (probe) rows
    * @param right      right (reference) rows; duplicate (key, ts)
    *                   entries should be pre-deduplicated by the caller
    *                   for deterministic output
    * @param leftTs     timestamp column on `left`
    * @param rightTs    timestamp column on `right`
    * @param keyLeft    equi-key on `left`
    * @param keyRight   equi-key on `right`
    * @param payload    right columns to carry (default: all but key/ts)
    */
  def leftAsOf(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      keyLeft: String, keyRight: String,
      payload: Seq[String] = Seq.empty): DataFrame = {
    val payloadCols =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.filterNot(c => c == rightTs || c == keyRight)
    val leftCols = left.columns.toSeq

    val taggedRight = right.select(
      (col(keyRight).as("__key") +: col(rightTs).as("__ts")
        +: lit(0).as("__tag")
        +: payloadCols.map(c => col(c).as(s"__p_$c"))
        ++: leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(keyLeft).as("__key") +: col(leftTs).as("__ts")
        +: lit(1).as("__tag")
        +: payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(s"__p_$c"))
        ++: leftCols.map(col)): _*)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedRight.unionByName(taggedLeft)
      .select((col("__tag")
        +: leftCols.map(col)
        ++: payloadCols.map(c =>
          last(col(s"__p_$c"), ignoreNulls = true).over(w).as(c))): _*)
    filled.filter(col("__tag") === 1).drop("__tag")
  }

  /** Interval join: left rows matched to right rows whose
    * [start, end) interval contains the left timestamp, bucketized so
    * the join is equi on (key, bucket) rather than a pure range
    * predicate — each interval explodes into the buckets it spans, the
    * bucket join prunes candidates, and the exact predicate filters.
    * `bucketMs` trades duplication (long intervals span many buckets)
    * against candidate precision.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightStart: String, rightEnd: String,
      keyLeft: String, keyRight: String,
      bucketMs: Long = 3600L * 1000): DataFrame = {
    val lb = left.withColumn("__bucket",
      (unix_millis(col(leftTs)) / bucketMs).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        (unix_millis(col(rightStart)) / bucketMs).cast("long"),
        (unix_millis(col(rightEnd)) / bucketMs).cast("long"))))
    lb.join(rb,
      lb("__bucket") === rb("__bucket") &&
        col(keyLeft) === col(keyRight) &&
        col(leftTs) >= col(rightStart) && col(leftTs) < col(rightEnd))
      .drop("__bucket")
  }
}
