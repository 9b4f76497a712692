package graft

import graft.sources.{JdbcEtl, MigrationValidate}
import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** JDBC ETL integration tests against a real embedded Derby database —
  * partitioned extract, bulk load, and migration validation.
  */
class JdbcEtlSpec extends SparkFunSuite {

  lazy val dbUrl: String = {
    val dir = Files.createTempDirectory("graft-derby").resolve("db")
    s"jdbc:derby:$dir;create=true"
  }

  def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(dbUrl)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  lazy val seeded: Unit = {
    exec("CREATE TABLE src_orders (id BIGINT NOT NULL, amount DOUBLE, status VARCHAR(10))")
    val c = java.sql.DriverManager.getConnection(dbUrl)
    try {
      val ps = c.prepareStatement("INSERT INTO src_orders VALUES (?, ?, ?)")
      (1 to 1000).foreach { i =>
        ps.setLong(1, i.toLong)
        ps.setDouble(2, i * 1.5)
        ps.setString(3, if (i % 2 == 0) "OPEN" else "DONE")
        ps.addBatch()
      }
      ps.executeBatch()
    } finally c.close()
  }

  test("partitioned extract reads all rows across range partitions") {
    seeded
    val df = JdbcEtl.extract(spark, dbUrl, "src_orders",
      partitionColumn = "id", numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    assert(df.agg(sum(col("id"))).head().getLong(0) == 500500L)
  }

  test("keyBounds discovers min/max with one roundtrip") {
    seeded
    assert(JdbcEtl.keyBounds(dbUrl, "src_orders", "id") == (1L, 1000L))
  }

  test("predicate pushdown reaches the JDBC scan") {
    seeded
    val df = JdbcEtl.extract(spark, dbUrl, "src_orders", "id", 2)
      .filter(col("status") === "OPEN")
    // the JDBC relation reports pushed filters in the explain output
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(STATUS,OPEN)"),
      s"expected pushed filter in plan:\n$plan")
    assert(df.count() == 500)
  }

  test("bulk write + re-read round-trips; validation passes") {
    seeded
    val src = JdbcEtl.extract(spark, dbUrl, "src_orders", "id", 4)
    JdbcEtl.write(src, dbUrl, "dst_orders", mode = SaveMode.Overwrite)
    val dst = JdbcEtl.extract(spark, dbUrl, "dst_orders", "id", 4)
    val d = MigrationValidate.diff(src, dst)
    assert(d.isEqual, s"diff: $d")
    assert(MigrationValidate.contentFingerprint(src) ==
      MigrationValidate.contentFingerprint(dst))
  }

  test("contentFingerprint of an empty table is defined (bit_xor null guard)") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "name")
    assert(MigrationValidate.contentFingerprint(empty) == 0L)
    assert(MigrationValidate.contentFingerprint(empty.limit(0)) == 0L)
  }

  test("incrementalDiff classifies inserts, updates, deletes") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val prev = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "amt")
    val cur = Seq((1L, "a", 10.0), // unchanged
      (2L, "b", 25.0), // updated
      (4L, "d", 40.0)) // inserted; 3 deleted
      .toDF("id", "name", "amt")
    val changes = MigrationValidate.incrementalDiff(prev, cur, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changes == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
  }

  test("validation detects divergence") {
    seeded
    val src = JdbcEtl.extract(spark, dbUrl, "src_orders", "id", 2)
    val tampered = src.withColumn("amount",
      when(col("id") === 7, col("amount") + 1).otherwise(col("amount")))
    val d = MigrationValidate.diff(src, tampered)
    assert(!d.isEqual && d.srcOnlyRows == 1 && d.dstOnlyRows == 1)
    assert(MigrationValidate.contentFingerprint(src) !=
      MigrationValidate.contentFingerprint(tampered))
  }
}
