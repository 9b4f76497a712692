package graft

import graft.sources.Bucketing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucketed co-located join tests: the join of two tables bucketed on
  * the same key must plan without a shuffle exchange, and produce the
  * same rows as the plain join.
  */
class BucketingSpec extends SparkFunSuite {

  test("join of same-bucketed tables plans with no shuffle exchange") {
    val s = spark // default in-memory catalog + ./spark-warehouse
    // unique names: the in-memory catalog forgets tables between JVMs
    // but warehouse dirs persist, so a reused name hits
    // LOCATION_ALREADY_EXISTS
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val tOrd = s"b_orders_$tag"
    val tLi = s"b_lineitem_$tag"
    val ord = s.read.parquet(s"$sf0001/orders.parquet")
    val li = s.read.parquet(s"$sf0001/lineitem.parquet")
    Bucketing.writeBucketed(ord, tOrd, "o_orderkey", 8)
    Bucketing.writeBucketed(li, tLi, "l_orderkey", 8)
    val joined = s.table(tLi)
      .join(s.table(tOrd),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    // force planning
    val rows = joined.collect()
    assert(rows.nonEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    // the JOIN itself must be exchange-free on both sides (the final
    // single-partition agg may still exchange on the group key)
    val joinSection = plan.substring(0, plan.indexOf("Scan"))
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join should be co-located:\n$plan")
    val _ = joinSection
    // same result as the un-bucketed join
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSet == plain)
    s.sql(s"DROP TABLE IF EXISTS $tOrd")
    s.sql(s"DROP TABLE IF EXISTS $tLi")
  }
}
