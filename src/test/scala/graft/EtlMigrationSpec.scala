package graft

import graft.exec._
import graft.model.Migration
import graft.tracker.InMemoryTracker
import org.apache.spark.sql.functions._

/** Migration-as-ETL end to end: versioned migrations whose SQL is
  * Spark DDL/DML building an analytics mart from the parquet test data
  * — executed through the real Executor (tracker, checksums, ordering,
  * rollback) with the SparkSqlRunner. This is the BASELINE north star
  * ("database migration is ETL") exercised as one flow.
  */
class EtlMigrationSpec extends SparkFunSuite {

  def mig(v: String, name: String, up: String, down: String = "") =
    Migration(v, name, up, down, s"/virtual/V${v}_$name.up.sql")

  test("versioned CTAS migrations build and tear down a mart through the executor") {
    val suffix = System.nanoTime() // unique temp-view names per run
    val m1 = mig("001", "stage_orders",
      s"""CREATE OR REPLACE TEMPORARY VIEW stage_orders_$suffix AS
          SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
          FROM parquet.`$sf0001/orders.parquet`""",
      down = s"DROP VIEW IF EXISTS stage_orders_$suffix")
    val m2 = mig("002", "stage_lineitem",
      s"""CREATE OR REPLACE TEMPORARY VIEW stage_lineitem_$suffix AS
          SELECT l_orderkey, l_extendedprice, l_discount
          FROM parquet.`$sf0001/lineitem.parquet`""",
      down = s"DROP VIEW IF EXISTS stage_lineitem_$suffix")
    val m3 = mig("003", "revenue_mart",
      s"""CREATE OR REPLACE TEMPORARY VIEW revenue_mart_$suffix AS
          SELECT o_custkey,
                 cast(sum(cast(l_extendedprice * (1 - l_discount)
                   as decimal(24,6))) as double) AS revenue
          FROM stage_orders_$suffix
          JOIN stage_lineitem_$suffix ON l_orderkey = o_orderkey
          GROUP BY o_custkey""",
      down = s"DROP VIEW IF EXISTS revenue_mart_$suffix")

    val tracker = new InMemoryTracker
    val ex = new Executor(tracker, new SparkSqlRunner(spark))
    val r = ex.apply(Seq(m3, m1, m2)) // out of order on purpose
    assert(r.applied == Seq("001", "002", "003")) // version order enforced
    // the mart exists and carries real aggregated data
    val mart = spark.table(s"revenue_mart_$suffix")
    assert(mart.count() > 0)
    val total = mart.agg(sum(col("revenue"))).head().getDouble(0)
    assert(total > 0)
    // idempotent re-apply: nothing re-runs
    assert(ex.apply(Seq(m1, m2, m3)).skipped.length == 3)
    // rollback the mart only; staging views survive
    assert(ex.rollback(Seq(m1, m2, m3), steps = 1).rolledBack == Seq("003"))
    assert(spark.catalog.tableExists(s"stage_orders_$suffix"))
    assert(!spark.catalog.tableExists(s"revenue_mart_$suffix"))
    // tracker reflects the state machine
    assert(tracker.getApplied().map(_.version) == Seq("001", "002"))
  }
}
