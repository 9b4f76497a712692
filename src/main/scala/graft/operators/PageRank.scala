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
  * - the iteration body is two hash aggregations and one equi-join per
  *   round — no driver-side collection of node or edge state, no
  *   cross join; rank state is one (id, long) row per node.
  * - `edges ⋈ r` keys by src and the contribution aggregate keys by
  *   dst — each round's exchanges repeat the same partitioning, and the
  *   static `eDeg`/`nodes` subtrees are plan-identical across rounds so
  *   ReuseExchange evaluates each ONCE per action (the loop builds one
  *   lazy plan; nothing is re-scanned per iteration at execution time).
  * - iteration count is a fixed small constant (bounded lineage depth);
  *   for iteration counts beyond ~10, localCheckpoint the rank state
  *   every ~5 rounds exactly as ConnectedComponents does.
  * - N rides along as a 1-row broadcast aggregate, not a driver action.
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
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("id")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eDeg = e.join(deg, "src")
    // N as a broadcast 1-row aggregate: keeps the whole computation one
    // lazy plan (no build-time count() job on the driver)
    val nn = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.crossJoin(broadcast(nn))
      .select(col("id"), expr(s"$scale div n").as("r"))
    for (_ <- 1 to iterations) {
      val contrib = eDeg
        .join(r.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), expr("r div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      r = nodes.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(nn))
        .select(col("id"),
          expr(s"(15 * ($scale div n)) div 100 + " +
            "(85 * coalesce(contrib, cast(0 as bigint))) div 100").as("r"))
    }
    r
  }
}
