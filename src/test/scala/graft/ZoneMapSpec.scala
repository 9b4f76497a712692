package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physical proof for e34's Z-order OPTIMIZE: the same 2-D predicate
  * over the same rows decodes FEWER rows from the z-ordered parquet
  * layout than from the arrival layout, measured from the actual
  * FileSourceScan metrics (row-group/page pruning via footer min-max
  * stats), with the predicate visible as PushedFilters in the scan —
  * q57's PartitionFilters discipline applied to footer statistics.
  * The e34 census pins the deterministic zone-map numbers both engines
  * agree on; THIS spec pins the part only a real scan can show: Spark
  * actually skipping physical data because of how it was written.
  */
class ZoneMapSpec extends SparkFunSuite {

  /** All FileSourceScanExec nodes, descending through AQE wrappers
    * (AdaptiveSparkPlanExec / query stages), which collectLeaves()
    * treats as leaves.
    */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans) ++
      other.subqueries.flatMap(fileScans)
  }

  private def interleave(c: Column, offset: Int): Column =
    (0 until 6).map { i =>
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i + offset)
    }.reduce(_ bitwiseOR _)

  test("z-ordered parquet decodes fewer rows than arrival-ordered " +
      "parquet under the same 2-D predicate (real scan metrics + " +
      "pushed footer filters), with identical answers") {
    // Catalog.t normalizes events.ts across the driver's physical
    // timestamp generations (nanos / NTZ) — same read path as e34
    val ev = graft.queries.Catalog.t(spark, sf0001, "events")
      .select(col("event_id"),
        pmod(col("user_id"), lit(64L)).as("ux"),
        pmod(expr("unix_seconds(ts) div 60"), lit(60L)).as("my"))
      .select(col("event_id"), col("ux"), col("my"),
        interleave(col("ux"), 0).bitwiseOR(interleave(col("my"), 1))
          .as("z"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-zonemap").toString
    // one row group per file; 16 files per layout. The ONLY difference
    // between the two writes is the sort/partition key — exactly the
    // rewrite an OPTIMIZE ZORDER performs.
    ev.repartitionByRange(16, col("event_id"))
      .write.parquet(s"$base/arrival")
    ev.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.parquet(s"$base/zorder")
    val pred = col("ux").between(8, 23) && col("my").between(16, 47)
    def scanRows(layout: String): (Long, Long) = {
      val q = spark.read.parquet(s"$base/$layout").filter(pred)
      val matched = q.count()
      // re-run as a collect so the scan metric reflects decode work
      val q2 = spark.read.parquet(s"$base/$layout").filter(pred)
      q2.collect()
      val scan = q2.queryExecution.executedPlan.collectLeaves()
        .find(_.nodeName.toLowerCase.contains("scan"))
        .getOrElse(fail("no scan node in " +
          q2.queryExecution.executedPlan.toString))
      // the 2-D predicate must reach the parquet footer as pushed
      // filters — otherwise no row group can be skipped at any scale
      val planStr = scan.toString
      assert(planStr.contains("PushedFilters") &&
        planStr.contains("GreaterThanOrEqual(ux,8)"), planStr)
      (scan.metrics("numOutputRows").value, matched)
    }
    val (decodedArrival, matchedArrival) = scanRows("arrival")
    val (decodedZ, matchedZ) = scanRows("zorder")
    // layout never changes answers
    assert(matchedArrival == matchedZ && matchedZ > 0,
      s"matched: arrival=$matchedArrival zorder=$matchedZ")
    // arrival blocks are user/minute-random → every row group's
    // envelope intersects the predicate → nothing prunes; the
    // z-ordered files carry tight envelopes on BOTH dims → most prune
    assert(decodedZ < decodedArrival,
      s"no pruning gain: zorder=$decodedZ arrival=$decodedArrival")
    assert(decodedZ <= (decodedArrival * 7) / 10,
      s"pruning too weak: zorder decoded $decodedZ of " +
        s"$decodedArrival arrival rows (expected ≤ 70%)")
  }

  test("dynamic partition pruning (q85's plan): the broadcast dim's " +
      "runtime filter reaches the Hive-partitioned fact scan as a " +
      "DynamicPruningExpression and only the matching partitions' " +
      "rows are read") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val total = orders.count()
    orders
      .withColumn("opr", substring(col("o_orderpriority"), 1, 1)
        .cast("int"))
      .write.partitionBy("opr").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.range(1, 6)
      .select(col("id").cast("int").as("opr"),
        when(col("id") <= 2, "fast").otherwise("slow").as("tier"))
    val q = fact.join(broadcast(dim.filter(col("tier") === "fast")),
      Seq("opr"))
    val matched = q.count()
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan)
    val scan = fileScans(q.queryExecution.executedPlan)
      .find(_.toString.contains("/fact")).getOrElse(
        fail("no fact scan in:\n" + plan))
    val decoded = scan.metrics("numOutputRows").value
    // 2 of 5 priorities survive the dim filter; the runtime filter
    // must keep the other 3 partitions' rows out of the scan
    assert(decoded == matched && matched > 0 && decoded < total,
      s"decoded=$decoded matched=$matched total=$total")
  }
}
