package graft.streaming

import graft.streaming.EventStreams.UserEvent
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming CEP — e36's regex patterns compiled BY HAND to
  * incremental automata whose per-user states live in GroupState
  * across micro-batches: match counting over an unbounded event
  * stream without ever materializing the per-user sequence string
  * (the batch e36 collects the whole history per user; on a stream
  * that string grows without bound, while the automaton state is four
  * small integers + four counters per user — O(1) forever).
  *
  * Leftmost-scan equivalence with `regexp_count`, pattern by pattern
  * (asserted in StreamingSpec both on randomized sequences against
  * java.util.regex and on the real stream against the batch census):
  *  - `vp` (direct_buy): a v arms; p fires when armed; a later v
  *    re-arms (the regex scan restarting at that v IS the armed
  *    state); anything else disarms.
  *  - `v[ce]*p` (browse_buy): v arms; c/e keep it armed; p fires and
  *    resets; s disarms.
  *  - `ee+` (error_burst): one match per MAXIMAL run of ≥ 2 e's —
  *    greedy consumes the whole run, so counting at the run's second
  *    e is exact and needs no end-of-input flush.
  *  - `s[^p]*p` (signup_journey): s arms; p fires and resets;
  *    everything else (including another s) keeps it armed.
  */
object CepStream {

  /** Four automaton registers + four counters — the whole per-user
    * streaming state.
    */
  final case class CepState(vp: Int, vcep: Int, eRun: Int, sp: Int,
      nVp: Long, nVcep: Long, nEe: Long, nSp: Long)

  object CepState { val zero: CepState = CepState(0, 0, 0, 0, 0, 0, 0, 0) }

  final case class CepCounts(user_id: Long, browse_buy: Long,
      direct_buy: Long, error_burst: Long, signup_journey: Long)

  /** One character through all four automata. */
  private[graft] def step(s: CepState, ch: Char): CepState = {
    var vp = s.vp; var nVp = s.nVp
    ch match {
      case 'v'            => vp = 1
      case 'p' if vp == 1 => nVp += 1; vp = 0
      case _              => vp = 0
    }
    var vcep = s.vcep; var nVcep = s.nVcep
    ch match {
      case 'v'              => vcep = 1
      case 'c' | 'e'        => () // keep armed (or stay idle)
      case 'p' if vcep == 1 => nVcep += 1; vcep = 0
      case _                => vcep = 0
    }
    var eRun = s.eRun; var nEe = s.nEe
    if (ch == 'e') { eRun += 1; if (eRun == 2) nEe += 1 }
    else eRun = 0
    var sp = s.sp; var nSp = s.nSp
    ch match {
      case 's'            => sp = 1
      case 'p' if sp == 1 => nSp += 1; sp = 0
      case 'p'            => sp = 0
      case _              => () // [^p] keeps the armed state
    }
    CepState(vp, vcep, eRun, sp, nVp, nVcep, nEe, nSp)
  }

  /** Reference scan for the equivalence property test. */
  private[graft] def countAll(seq: String): CepCounts = {
    val s = seq.foldLeft(CepState.zero)(step)
    CepCounts(0L, s.nVcep, s.nVp, s.nEe, s.nSp)
  }

  /** The streaming operator: per-user pattern-match counters updated
    * each micro-batch (mapGroupsWithState, update mode). Rows within a
    * batch are applied in event-time order — cross-batch order is the
    * source's responsibility (same contract as every kappa twin here).
    */
  def patternCounts(events: Dataset[UserEvent]): Dataset[CepCounts] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CepState, CepCounts](GroupStateTimeout.NoTimeout) {
        (uid, batch, state) =>
          var s = state.getOption.getOrElse(CepState.zero)
          batch.toSeq
            .sortBy(e => (e.ts.getTime * 1000L +
              (e.ts.getNanos / 1000) % 1000, e.event_id))
            .foreach(e => s = step(s, e.event_type.charAt(0)))
          state.update(s)
          CepCounts(uid, s.nVcep, s.nVp, s.nEe, s.nSp)
      }
  }
}
