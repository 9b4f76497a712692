package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point INTEGER PageRank over an edge list — iterative graph
  * analytics beyond what one SQL query expresses, as a reusable Spark
  * operator (the batch sibling of [[ConnectedComponents]]).
  *
  * Ranks are maintained as scaled 64-bit integers (`scale` = 1e12 ≈
  * rank 1.0 spread over the graph) and every step uses floor division:
  *
  * {{{ r'(v) = (15·(scale div N)) div 100
  *           + (85 · Σ_{(u,v)∈E} (r(u) div outdeg(u))) div 100 }}}
  *
  * Floor-div integer arithmetic is the portability trick (same family
  * as graft.functions.PortableHash): double-precision PageRank is not
  * reproducible across engines — parallel summation orders differ —
  * but 64-bit integer sums are exact and order-independent, so a
  * DuckDB oracle re-derives every iteration bit-for-bit. The truncation
  * "loses" ≤1e-12 of mass per in-edge per round, which biases nothing
  * at ranking granularity.
  *
  * Scale posture (100 TB / 1000 executors):
  * - the iteration body is one equi-join + two hash aggregations — no
  *   driver-side collection of node or edge state, no cross join; rank
  *   state is one (id, long) row per node (16 bytes/node).
  * - rank state is `localCheckpoint`ed EVERY round and the static
  *   sides (edges⋈outdeg, nodes) are persisted once up front — the
  *   same lineage discipline as [[ConnectedComponents]]. Without the
  *   checkpoint the plan nests one level per round and AQE re-optimizes
  *   the whole accumulated tree after every stage: measured 1.8 s →
  *   50-110 s at sf0.1 for 5 rounds, pure driver-side planning time.
  *   With it, every round is a constant-size plan over cached inputs.
  * - graph size N is one driver-side count on the persisted nodes —
  *   the same metadata-scale action as ConnectedComponents' convergence
  *   check; it doubles as the materialization of the caches.
  *
  * Reference scope note: the reference engine (a Go schema-migration
  * CLI) has no graph surface; this operator is part of the
  * training-data-pipeline extension (graph-signal scoring, e.g.
  * domain-authority weighting of a crawl corpus).
  */
object PageRank {

  /** Run `iterations` rounds over `edges` (columns `src`, `dst`; supply
    * both directions for an undirected graph). Nodes are the distinct
    * edge sources — with both directions present that is every endpoint,
    * and guarantees outdeg ≥ 1 (no dangling-mass term). Returns
    * (`id`, `r`) with `r` the scaled integer rank.
    */
  def run(edges: DataFrame, iterations: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    // persist the (possibly expensive) edge derivation once: nodes,
    // deg and eDeg all consume it
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = e.select(col("src").as("id")).distinct().persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // round 16: pin the cached per-round join input to the session's
    // shuffle parallelism, keyed by the round join's key. AQE
    // coalesces the join exchanges to the 64 MB advisory (1-3
    // partitions at sf0.1) and persist freezes that, starving every
    // round's join + partial aggregation of cores. The explicit count
    // (REPARTITION_BY_NUM) is exempt from AQE coalescing; src is the
    // round key, so the rounds stay exchange-free on the edge side.
    val nPart = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val eDeg = e.join(deg, "src").repartition(nPart, col("src")).persist()
    val n = nodes.count() // materializes the caches; N is a scalar
    require(n > 0, "PageRank needs a non-empty edge list (0 nodes)")
    val rInit = scale / n
    val tele = (15L * rInit) / 100L
    var r = nodes.select(col("id"), lit(rInit).as("r")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = eDeg
        .join(r.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(tele) +
            expr("(85 * coalesce(contrib, cast(0 as bigint))) div 100"))
            .as("r"))
        .localCheckpoint()
    }
    // safe: r is checkpointed, nothing downstream re-reads the caches
    e.unpersist()
    nodes.unpersist()
    eDeg.unpersist()
    r
  }

  /** PERSONALIZED PageRank: all teleport mass returns to `seed` instead
    * of spreading uniformly — the random surfer restarts at the seed
    * node, so ranks measure proximity TO THE SEED (recommendation /
    * related-items scoring) rather than global authority. Same
    * integer-exact floor-div arithmetic and per-round materialization
    * discipline as [[run]]; the only changes are the init vector (all
    * `scale` at the seed, 0 elsewhere) and the teleport term
    * (`15·scale div 100` at the seed only, no `div N`). Haveliwala,
    * WWW 2002.
    */
  def runPersonalized(edges: DataFrame, seed: Long, iterations: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val nodes = e.select(col("src").as("id")).distinct().persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // round 16: same pinned-parallelism spread as run() — see there.
    val nPart = edges.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val eDeg = e.join(deg, "src").repartition(nPart, col("src")).persist()
    val n = nodes.count() // materializes the caches
    require(n > 0, "PageRank needs a non-empty edge list (0 nodes)")
    val tele = (15L * scale) / 100L
    var r = nodes.select(col("id"),
      when(col("id") === seed, lit(scale)).otherwise(lit(0L)).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contrib = eDeg
        .join(r.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      r = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(col("id") === seed, lit(tele)).otherwise(lit(0L)) +
            expr("(85 * coalesce(contrib, cast(0 as bigint))) div 100"))
            .as("r"))
        .localCheckpoint()
    }
    e.unpersist()
    nodes.unpersist()
    eDeg.unpersist()
    r
  }
}
