package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming incremental view maintenance from a change feed — q108's
  * kappa twin (the 15th): typed CDF rows (insert / update_postimage
  * weigh +1, delete / update_preimage −1) stream in and a per-status
  * aggregate view accumulates in GroupState, SEEDED from the snapshot
  * aggregate the feed starts after (mapGroupsWithState's initial-state
  * form — the view never replays history it already reflects). State
  * is O(distinct statuses) FOREVER; each micro-batch costs
  * O(changes), never O(table) — the materialized-view economics q108
  * proves in batch, held under unbounded arrival.
  *
  * Totals ride as exact SCALED INTEGERS (micros = value·1e6, rounded
  * once at ingest): the true values carry ≤ 4 decimal digits, so the
  * rounding recovers the exact decimal and integer addition is
  * associative across any batch split — the same reason q108 keeps
  * decimal(24,6) until one final cast. A double accumulator would make
  * the final state depend on batch boundaries.
  *
  * Equivalence contract (StreamingSpec): initial state from v1 +
  * streamed signed deltas across micro-batches ≡ the direct batch
  * aggregate of v2.
  */
object CdfViewStream {

  /** One change-feed row: signed weight w ∈ {+1, −1}, total scaled to
    * exact integer micros.
    */
  final case class Change(status: String, totMicros: Long, w: Int)

  final case class ViewState(status: String, n: Long, totMicros: Long)

  def micros(v: Double): Long = math.round(v * 1e6)

  /** The streaming operator: per-status (n, Σtotal) maintained across
    * micro-batches (update mode — each batch emits the touched
    * statuses' post-batch state), seeded with `initial`.
    */
  def maintain(changes: Dataset[Change],
      initial: Dataset[ViewState]): Dataset[ViewState] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val init = initial.groupByKey(_.status).mapValues(identity)
    changes.groupByKey(_.status)
      .mapGroupsWithState[ViewState, ViewState](
        GroupStateTimeout.NoTimeout, init) { (status, batch, state) =>
        var st = state.getOption.getOrElse(ViewState(status, 0L, 0L))
        batch.foreach { c =>
          st = ViewState(status, st.n + c.w,
            st.totMicros + c.w * c.totMicros)
        }
        state.update(st)
        st
      }
  }
}
