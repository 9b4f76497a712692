package graft

import graft.model.DangerousWrite
import graft.plans.DangerousWriteGate
import graft.queries.Catalog
import java.nio.file.Files
import org.apache.spark.sql.SaveMode

/** The plan-level danger gate: Overwrite writes under a protected root
  * are rejected at optimization time (no task ever launches), append
  * writes and unprotected paths pass, and spark.graft.force bypasses —
  * the Spark-plan analogue of the reference's apply danger gate.
  */
class PlanGateSpec extends SparkFunSuite {

  def withGate(body: String => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-protected").toString
    DangerousWriteGate.install(spark)
    spark.conf.set(DangerousWriteGate.ProtectedPathsKey, dir)
    try body(dir)
    finally {
      DangerousWriteGate.uninstall(spark)
      spark.conf.unset(DangerousWriteGate.ProtectedPathsKey)
      spark.conf.unset(DangerousWriteGate.ForceKey)
    }
  }

  def sampleDf = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
  }

  test("overwrite under a protected root is blocked at plan time") {
    withGate { dir =>
      val e = intercept[DangerousWrite] {
        sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/tracker")
      }
      assert(e.protectedRoot == dir)
      // nothing was written
      assert(!Files.exists(java.nio.file.Paths.get(s"$dir/tracker")))
    }
  }

  test("append mode and unprotected paths pass the gate") {
    withGate { dir =>
      sampleDf.write.mode(SaveMode.Append).parquet(s"$dir/tracker")
      assert(spark.read.parquet(s"$dir/tracker").count() == 2)
      val other = Files.createTempDirectory("graft-unprotected").toString
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$other/out")
      assert(spark.read.parquet(s"$other/out").count() == 2)
    }
  }

  test("spark.graft.force=true bypasses the gate (the --force flag)") {
    withGate { dir =>
      spark.conf.set(DangerousWriteGate.ForceKey, "true")
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/tracker")
      assert(spark.read.parquet(s"$dir/tracker").count() == 2)
    }
  }

  test("gate uninstall restores normal overwrite behavior") {
    val dir = Files.createTempDirectory("graft-protected2").toString
    DangerousWriteGate.install(spark)
    spark.conf.set(DangerousWriteGate.ProtectedPathsKey, dir)
    DangerousWriteGate.uninstall(spark)
    try {
      sampleDf.write.mode(SaveMode.Overwrite).parquet(s"$dir/t")
      assert(spark.read.parquet(s"$dir/t").count() == 2)
    } finally spark.conf.unset(DangerousWriteGate.ProtectedPathsKey)
  }

  def withApprox(k: Int)(body: => Unit): Unit = {
    graft.plans.ApproxDistinctRewrite.install(spark)
    spark.conf.set(graft.plans.ApproxDistinctRewrite.EnabledKey, "true")
    spark.conf.set(graft.plans.ApproxDistinctRewrite.KKey, k.toString)
    try body
    finally {
      graft.plans.ApproxDistinctRewrite.uninstall(spark)
      spark.conf.unset(graft.plans.ApproxDistinctRewrite.EnabledKey)
      spark.conf.unset(graft.plans.ApproxDistinctRewrite.KKey)
    }
  }

  test("approx-distinct rewrite: same query, flag decides exactness, " +
      "estimate is the deterministic KMV value") {
    import org.apache.spark.sql.functions._
    val li = Catalog.t(spark, sf0001, "lineitem")
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val k = 64
    withApprox(k) {
      val q = li.agg(countDistinct(col("l_orderkey")).as("n"))
      // the physical plan must carry the sketch aggregate, not a
      // distinct expand
      assert(q.queryExecution.executedPlan.toString
        .toLowerCase.contains("kmv_estimate"))
      val est = q.head().getLong(0)
      // deterministic oracle: fold the same h60 stream through the
      // same aggregator
      val agg = new graft.functions.KmvEstimate(k)
      val expected = agg.finish(
        li.select(graft.functions.PortableHash.h60col(
            col("l_orderkey").cast("string")).as("h"))
          .collect().map(_.getLong(0))
          .foldLeft(agg.zero)(agg.reduce))
      assert(est == expected, s"estimate $est != deterministic $expected")
      assert(math.abs(est - exact).toDouble / exact < 3.0 / math.sqrt(k),
        s"estimate $est too far from exact $exact")
      // grouped distinct rewrites too, exact below k per group
      val grouped = li.groupBy(col("l_linestatus"))
        .agg(countDistinct(col("l_returnflag")).as("nf"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val groupedExact = li.groupBy(col("l_linestatus"))
        .agg(collect_set(col("l_returnflag")).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).size).toMap
      groupedExact.foreach { case (g, n) =>
        assert(grouped(g) == n.toLong,
          s"below-k distinct for group $g must be exact")
      }
    }
    // flag off (uninstalled): identical query is exact again
    val after = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    assert(after == exact)
  }
}
