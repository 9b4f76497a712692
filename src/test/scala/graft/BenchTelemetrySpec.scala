package graft

/** Plumbing gate for the bench artifact's plan telemetry (PlanTelemetry):
  * fingerprints must be STABLE across separate executions of the same
  * query (else every round cries plan-change) and SENSITIVE to actual
  * plan differences (else they certify nothing), and the shuffle
  * metrics must read non-zero for a shuffle-bearing executed plan.
  */
class BenchTelemetrySpec extends SparkFunSuite {

  private def executedStats(name: String): PlanTelemetry.Stats = {
    val qe = SparkEntry.queries(name)(spark, sf0001).queryExecution
    qe.executedPlan.execute()
      .foreachPartition(it => while (it.hasNext) it.next())
    PlanTelemetry.stats(qe)
  }

  test("fingerprint is stable across executions and exprId drift, " +
      "and differs between different plans") {
    val before = spark.conf.getOption("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", 100000)
    try {
      val a = executedStats("q01_pricing_summary")
      // burn expression ids + lambda-variable counters between the two
      // executions (the run-over-run drift the normalizer must absorb —
      // d08's transform/aggregate lambdas advance the global counter)
      executedStats("d08_posting_jaccard")
      val b = executedStats("q01_pricing_summary")
      assert(a.fingerprint == b.fingerprint,
        "same query, same session → same fingerprint")
      val other = executedStats("q04_star_broadcast")
      assert(other.fingerprint != a.fingerprint,
        "different plans must not collide")
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.maxMetadataStringLength", v)
        case None => spark.conf.unset("spark.sql.maxMetadataStringLength")
      }
    }
  }

  test("shuffle metrics are non-zero for an executed shuffle-bearing " +
      "plan and fingerprinting is side-effect-free") {
    val s = executedStats("q01_pricing_summary")
    assert(s.exchanges >= 1, "q01 aggregates lineitem — it shuffles")
    assert(s.shuffleBytes > 0L)
    assert(s.shuffleRecords > 0L)
    // stats() twice on the same execution: identical (reads final
    // accumulators, doesn't re-run or mutate anything)
    val qe = SparkEntry.queries("q01_pricing_summary")(spark, sf0001)
      .queryExecution
    qe.executedPlan.execute()
      .foreachPartition(it => while (it.hasNext) it.next())
    val x = PlanTelemetry.stats(qe)
    val y = PlanTelemetry.stats(qe)
    assert(x == y)
  }

  test("norm strips every run-varying token class") {
    // expression ids
    assert(PlanTelemetry.norm("sum(l_quantity#123)") ==
      "sum(l_quantity#x)")
    // lambda-variable names carry a session-global counter in the NAME
    assert(PlanTelemetry.norm("lambda x_14#7 * lambda y_16#9") ==
      PlanTelemetry.norm("lambda x_23#1 * lambda y_25#2"))
    // local-mode application ids (they key per-run scratch paths)
    assert(PlanTelemetry.norm("/tmp/graft-index/d16-local-1755349392") ==
      PlanTelemetry.norm("/tmp/graft-index/d16-local-9999999999"))
    // object identity hashes
    assert(PlanTelemetry.norm("UnsafeArrayData@1a2b3c4d") ==
      PlanTelemetry.norm("UnsafeArrayData@ffee0011"))
    // plan / exchange ids
    assert(PlanTelemetry.norm("ReusedExchange [id=42]") ==
      PlanTelemetry.norm("ReusedExchange [id=7]"))
  }
}
