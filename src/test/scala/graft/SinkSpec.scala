package graft

import graft.queries.Catalog
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Sink-side scale behaviors: date-partitioned parquet layout and
  * partition pruning — the standard time-partitioned lake layout where
  * a day-filter query touches one directory, not 100 TB.
  */
class SinkSpec extends SparkFunSuite {

  test("date-partitioned write + partition-pruned read") {
    val out = Files.createTempDirectory("graft-partitioned").toString
    val events = Catalog.t(spark, sf0001, "events")
      .withColumn("event_date", to_date(col("ts")))
    events.write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(out)
    // layout: one directory per day
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(dirs.length >= 25 && dirs.head.startsWith("event_date=2024-01-"))
    // a day filter must prune to ONE partition directory at plan time
    val oneDay = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-05")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val scanned = oneDay.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(scanned.contains("event_date"), scanned)
    // row parity with the unpartitioned filter
    val expected = events.filter(to_date(col("ts")) === "2024-01-05").count()
    assert(oneDay.count() == expected && expected > 0)
  }

  test("sized output: writer produces the requested file count") {
    val out = Files.createTempDirectory("graft-sized").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    li.repartition(4).write.mode("overwrite").parquet(out)
    val files = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 4)
    assert(spark.read.parquet(out).count() == li.count())
  }
}
