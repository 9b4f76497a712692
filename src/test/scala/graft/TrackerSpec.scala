package graft

import graft.model.{AppliedMigration, MigrationNotFound, MigrationStatus}
import graft.tracker.ParquetTracker
import java.nio.file.Files
import java.sql.Timestamp

/** ParquetTracker integration tests (real Spark, temp dirs) — the
  * reference's tracker integration matrix
  * (`integration/tracker_test.go:15-131`).
  */
class TrackerSpec extends SparkFunSuite {

  def newTracker() = {
    val dir = Files.createTempDirectory("graft-tracker").toString
    val tr = new ParquetTracker(spark, dir)
    tr.ensureTable()
    tr
  }

  def row(v: String, checksum: String = "abc") =
    AppliedMigration(v, s"V${v}_m.up.sql", checksum,
      new Timestamp(1700000000000L), 5, MigrationStatus.Applied)

  test("ensureTable is idempotent; empty table reads as no rows") {
    val tr = newTracker()
    tr.ensureTable()
    assert(tr.getApplied().isEmpty)
    assert(!tr.isApplied("001"))
  }

  test("recordApplied + point lookups (Q1/Q5)") {
    val tr = newTracker()
    tr.recordApplied(row("001"))
    assert(tr.isApplied("001"))
    assert(!tr.isApplied("002"))
    assert(tr.getChecksum("001") == "abc")
    intercept[MigrationNotFound] { tr.getChecksum("999") }
  }

  test("upsert semantics: re-record replaces the row (Q3)") {
    val tr = newTracker()
    tr.recordApplied(row("001", checksum = "v1"))
    tr.recordApplied(row("001", checksum = "v2"))
    assert(tr.getApplied().length == 1)
    assert(tr.getChecksum("001") == "v2")
  }

  test("ordered applied list filters rolled_back (Q2/Q4)") {
    val tr = newTracker()
    tr.recordApplied(row("002"))
    tr.recordApplied(row("001"))
    tr.recordApplied(row("003"))
    tr.recordRolledBack("002")
    assert(tr.getApplied().map(_.version) == Seq("001", "003"))
    assert(!tr.isApplied("002"))
    intercept[MigrationNotFound] { tr.recordRolledBack("999") }
  }

  test("re-apply after rollback flips status back (upsert-latest)") {
    val tr = newTracker()
    tr.recordApplied(row("001"))
    tr.recordRolledBack("001")
    tr.recordApplied(row("001"))
    assert(tr.isApplied("001"))
  }

  test("state survives a new tracker instance on the same path (durability)") {
    val dir = Files.createTempDirectory("graft-tracker").toString
    val tr1 = new ParquetTracker(spark, dir)
    tr1.ensureTable()
    tr1.recordApplied(row("001"))
    val tr2 = new ParquetTracker(spark, dir)
    assert(tr2.isApplied("001"))
    assert(tr2.getApplied().map(_.version) == Seq("001"))
  }
}
