package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors the 100 TB posture relies on,
  * proven live rather than assumed: the runtime skew-join split
  * (OptimizeSkewedJoin) — the AQE counterpart of q74's deterministic
  * salting — and runtime partition coalescing. Both are plan-level
  * facts only an executed AQE plan can show.
  */
class AqeSpec extends SparkFunSuite {

  test("AQE skew-join split: a hot key triggers OptimizeSkewedJoin " +
      "(isSkew in the executed SMJ) under lowered thresholds, with " +
      "rows identical to the non-AQE plan") {
    import spark.implicits._
    // 1 hot key carrying 200k rows vs 63 keys with ~300 each — the
    // shape one pathological customer gives a fact-fact join
    val skewed = spark.range(0, 220000)
      .select(when(col("id") < 200000, lit(7L))
        .otherwise(pmod(col("id"), lit(64L))).as("k"),
        col("id").as("v"),
        // widen rows so the hot partition clears the byte threshold
        concat(lit("payload_"), col("id")).as("pad"))
    val dim = spark.range(0, 64)
      .select(col("id").as("k"), (col("id") * 10).as("w"))
    // the consumer must NOT require the join's hash partitioning
    // (a groupBy(k) above the SMJ makes OptimizeSkewedJoin skip —
    // splitting a partition would break the reusable distribution);
    // a global aggregate leaves the split free to happen
    def q = skewed.join(dim.hint("merge"), Seq("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("v") * col("w")).as("svw"),
        sum(length(col("pad"))).as("sp"))
    val expected = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try q.collect().map(_.toSeq.toVector).sortBy(_.mkString("|")).toSeq
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // thresholds sized to the test data: a partition is skewed if
    // > 5x the median AND > 64 KB — the hot key's partition is both
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "65536")
    spark.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
    try {
      val df = q
      val rows = df.collect().map(_.toSeq.toVector)
        .sortBy(_.mkString("|")).toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n$plan")
      assert(rows == expected, "skew-split join changed the answer")
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  test("AQE runtime join re-plan: a statically SMJ-planned join whose " +
      "build side turns out tiny at runtime executes as a broadcast " +
      "join (the third AQE lever, after skew-split and coalescing)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"))
    // static sizing (no CBO): an Aggregate's size estimate derives
    // from its CHILD, so the 3-group rollup below reads as file-sized
    // → SMJ under an 8 KB threshold. At runtime the finished shuffle
    // stage is 3 rows → AQE re-plans the join to broadcast.
    val tiny = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sq"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "8192")
    try {
      val q = li.join(tiny, Seq("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      val initial = q.queryExecution.executedPlan.toString
      assert(initial.contains("SortMergeJoin"),
        s"expected a static SMJ:\n$initial")
      q.collect()
      val fin = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(fin.contains("BroadcastHashJoin"),
        s"runtime did not promote to broadcast:\n$fin")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("AQE partition coalescing: a near-empty 32-partition shuffle " +
      "executes with fewer reducers than shuffle.partitions (the " +
      "runtime re-plan that keeps small stages cheap)") {
    val df = spark.range(0, 1000)
      .select(pmod(col("id"), lit(10L)).as("k"))
      .groupBy(col("k")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("coalesced") || plan.contains("AQEShuffleRead"),
      s"no AQE shuffle coalescing in:\n$plan")
  }
}
