package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * dedup-cluster extractor: near-dup PAIRS (from Jaccard/MinHash/SimHash
  * candidates) become GROUPS, so "keep one representative per cluster"
  * is a groupBy away.
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; convergence takes at most `diameter` rounds, and near-dup
  * graphs are unions of small dense clusters (tiny diameters), so the
  * loop terminates in a handful of shuffles. The driver-side loop is the
  * correct shape for iterative graph algorithms on Spark: per-round
  * dataflow is declarative (join + groupBy min — all Catalyst), only
  * the fixpoint test touches the driver, and each round's result is
  * persisted so lineage doesn't recompute across iterations. At 100 TB
  * the same loop runs with the edges pre-partitioned by src so every
  * round reuses one partitioning; for adversarial high-diameter graphs
  * the alternating large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce") halves round counts — near-dup
  * clustering never needs it.
  */
object ConnectedComponents {

  /** Component labels for an undirected edge list.
    *
    * @param pairs (a, b) pairs, any orientation, any duplicates
    * @return (id, cluster) for every endpoint, cluster = min id in its
    *         component
    * @throws IllegalStateException if the propagation has not reached a
    *         fixpoint within `maxIter` rounds — partially-propagated
    *         labels are WRONG clusters, so truncation must never be
    *         silent. maxIter bounds the component diameter, not size;
    *         raise it (or switch to large-star/small-star) for
    *         path-shaped graphs.
    */
  def components(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val Seq(aCol, bCol) = pairs.columns.toSeq.take(2).map(col)
    val edges = pairs.select(aCol.as("src"), bCol.as("dst"))
      .union(pairs.select(bCol.as("src"), aCol.as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid"))
        .agg(min(col("label")).as("nbr_label"))
      val updated = labels.as("l")
        .join(nbrMin, col("l.id") === col("nid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.label"), coalesce(col("nbr_label"), col("l.label")))
            .as("label"))
        .persist()
      val changed = updated.as("u")
        .join(labels.as("p"), Seq("id"))
        .filter(col("u.label") =!= col("p.label"))
        .count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds; " +
          "labels would be partially propagated (wrong clusters) — raise " +
          "maxIter for high-diameter graphs")
    labels.select(col("id"), col("label").as("cluster"))
  }
}
