package graft.queries

import org.apache.spark.sql.functions._
import Catalog._

/** Graph analytics over relationship structures mined from the
  * relational tables: the co-purchase graph (parts appearing in the
  * same order) ranked with the integer-exact
  * [[graft.operators.PageRank]]. Companion to the dup-cluster
  * connected-components surface (d07/d09) — together they cover the
  * two iterative-graph shapes a curation pipeline leans on: transitive
  * grouping and authority scoring.
  */
object GraphOps {

  def queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------------
    // PageRank over the part co-purchase graph: nodes are parts, with
    // an edge between two parts whenever some order contains both.
    // Edge generation groups lineitem by l_orderkey and expands each
    // order's part set to ordered pairs ROW-LOCALLY (the
    // winnowCandidatePairs shape — a TPC-H order has ≤7 lines, so ≤42
    // directed pairs per row): one groupBy shuffle + one distinct, no
    // fact×fact self-join. Then 5 rounds of the fixed-point integer
    // PageRank. Both engines run the identical floor-div arithmetic, so
    // the scaled ranks — not just the ordering — hash-match
    // bit-for-bit; see the PageRank scaladoc for why double-precision
    // PageRank could never be oracle-checked.
    // ------------------------------------------------------------------
    "g01_pagerank_parts" -> Q(
      (s, d) => {
        val orderParts = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
        val edges = orderParts
          .select(explode(col("ps")).as("src"), col("ps"))
          .select(col("src"), explode(col("ps")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
        graft.operators.PageRank.run(edges, iterations = 5)
          .orderBy(col("r").desc, col("id"))
          .limit(20)
          .select(col("id").as("part_id"), col("r").as("rank_scaled"))
      },
      // MATERIALIZED pins DuckDB to evaluate the shared CTEs once (the
      // default inlines them per reference: 29 s -> 0.7 s at sf0.01)
      Some("""WITH li AS MATERIALIZED (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
        deg AS MATERIALIZED (
          SELECT src, cast(count(*) as bigint) AS outdeg
          FROM edges GROUP BY src),
        tele AS MATERIALIZED (
          SELECT (15 * (1000000000000 // cast(count(*) as bigint))) // 100
              AS t,
            (1000000000000 // cast(count(*) as bigint)) AS r_init
          FROM nodes),
        it0 AS (SELECT id, (SELECT r_init FROM tele) AS r FROM nodes),
        it1 AS MATERIALIZED (
          SELECT n0.id,
            (SELECT t FROM tele) + (85 * coalesce(s.contrib, 0)) // 100 AS r
          FROM nodes n0
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.r // d.outdeg) AS contrib
            FROM edges e JOIN it0 r ON r.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.id = n0.id),
        it2 AS MATERIALIZED (
          SELECT n0.id,
            (SELECT t FROM tele) + (85 * coalesce(s.contrib, 0)) // 100 AS r
          FROM nodes n0
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.r // d.outdeg) AS contrib
            FROM edges e JOIN it1 r ON r.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.id = n0.id),
        it3 AS MATERIALIZED (
          SELECT n0.id,
            (SELECT t FROM tele) + (85 * coalesce(s.contrib, 0)) // 100 AS r
          FROM nodes n0
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.r // d.outdeg) AS contrib
            FROM edges e JOIN it2 r ON r.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.id = n0.id),
        it4 AS MATERIALIZED (
          SELECT n0.id,
            (SELECT t FROM tele) + (85 * coalesce(s.contrib, 0)) // 100 AS r
          FROM nodes n0
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.r // d.outdeg) AS contrib
            FROM edges e JOIN it3 r ON r.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.id = n0.id),
        it5 AS MATERIALIZED (
          SELECT n0.id,
            (SELECT t FROM tele) + (85 * coalesce(s.contrib, 0)) // 100 AS r
          FROM nodes n0
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.r // d.outdeg) AS contrib
            FROM edges e JOIN it4 r ON r.id = e.src
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst) s ON s.id = n0.id)
        SELECT id AS part_id, r AS rank_scaled FROM it5
        ORDER BY r DESC, id LIMIT 20"""),
      bench = true))
}
