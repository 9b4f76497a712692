package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming IVF sufficient-statistics maintenance — s24's kappa twin
  * (the 14th): the stored-index ingest path run as an unbounded
  * stream. Each arriving vector is assigned to its nearest stored
  * centroid ROW-LOCALLY (the same literal-codebook squared-euclidean
  * argmin s24 runs in batch — the codebook rides in the closure as
  * k·dim longs, broadcast-sized), and the per-cell sufficient
  * statistics (n, per-dimension sums) accumulate in GroupState across
  * micro-batches. State is k cells × (dim+1) longs — O(k·dim)
  * FOREVER, regardless of how many vectors stream through; the batch
  * form rescans its whole accumulated corpus per maintenance run.
  * Centroid drift (s24's retrain census) is derivable from the state
  * alone at any point: updated mean = sums div n per cell.
  *
  * Equivalence contract (StreamingSpec): cross-batch final state ≡
  * one-shot batch aggregation over the same vectors — addition is
  * associative/commutative, so batch boundaries cannot change the
  * sums; assignment is stateless per row.
  */
object IvfStatsStream {

  final case class VecRow(vec_id: Long, li: Seq[Long])
  final case class CellStats(cent_id: Long, n: Long, sums: Seq[Long])

  /** s24's assignment: squared-euclidean argmin, ties to the smallest
    * cent_id (the (d2, cent_id) tuple min).
    */
  private[graft] def assign(li: Seq[Long],
      cents: Seq[(Long, Seq[Long])]): Long = {
    require(li.length == cents.head._2.length,
      s"vector dim ${li.length} != codebook dim ${cents.head._2.length}")
    cents.map { case (cid, ci) =>
      var d2 = 0L
      var i = 0
      while (i < li.length) {
        val dx = li(i) - ci(i); d2 += dx * dx; i += 1
      }
      (d2, cid)
    }.min._2
  }

  /** The streaming operator: per-cell (n, sums) updated each
    * micro-batch (mapGroupsWithState, update mode — each batch emits
    * the touched cells' post-batch state).
    */
  def cellStats(vecs: Dataset[VecRow],
      cents: Seq[(Long, Seq[Long])]): Dataset[CellStats] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // fail fast on the DRIVER for a malformed codebook: an empty one
    // would NoSuchElement inside a task; a ragged one would silently
    // compute partial distances (or IndexOutOfBounds) per row
    require(cents.nonEmpty, "empty codebook")
    val dim = cents.head._2.length
    require(cents.forall(_._2.length == dim),
      s"ragged codebook: expected every centroid at dim $dim")
    vecs
      .groupByKey(v => assign(v.li, cents))
      .mapGroupsWithState[CellStats, CellStats](
        GroupStateTimeout.NoTimeout) { (cid, batch, state) =>
        var st = state.getOption
          .getOrElse(CellStats(cid, 0L, Vector.fill(dim)(0L)))
        batch.foreach { v =>
          var i = 0
          val next = new Array[Long](dim)
          while (i < dim) { next(i) = st.sums(i) + v.li(i); i += 1 }
          st = CellStats(cid, st.n + 1, next.toVector)
        }
        state.update(st)
        st
      }
  }
}
