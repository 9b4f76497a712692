package graft

import graft.loader.MigrationLoader
import graft.model.Migration
import java.nio.file.Files

/** Loader tests — ported case matrix from the reference's
  * `internal/migration/loader_test.go` and `sorter_test.go`.
  */
class LoaderSpec extends SparkFunSuite {

  val fixturesDir = "/root/repo/fixtures/migrations"

  test("Spark load: 27 fixture migrations, sorted, stripped V prefix") {
    val ms = MigrationLoader.loadSorted(spark, fixturesDir).collect().toSeq
    assert(ms.length == 27)
    assert(ms.map(_.version) == (1 to 27).map(i => f"$i%03d"))
    assert(ms.head.name == "create_users")
    assert(ms.head.upSql.startsWith("CREATE TABLE users"))
    assert(ms.head.downSql.startsWith("DROP TABLE users"))
  }

  test("Spark load: migrations without down files have empty downSql") {
    val ms = MigrationLoader.load(spark, fixturesDir).collect()
    val v008 = ms.find(_.version == "008").get
    assert(v008.downSql == "")
    assert(v008.upSql == "VACUUM FULL users;")
  }

  test("Spark checksum (sha2) agrees with driver-side SHA-256") {
    val ms = MigrationLoader.load(spark, fixturesDir).collect()
    ms.foreach { m =>
      assert(m.checksum == Migration.computeChecksum(m.upSql),
        s"checksum divergence for ${m.version}")
    }
  }

  test("local load matches Spark load") {
    val local = MigrationLoader.loadLocal(fixturesDir)
    val dist = MigrationLoader.loadSorted(spark, fixturesDir).collect().toSeq
    assert(local.map(m => (m.version, m.name, m.upSql, m.downSql, m.checksum)) ==
      dist.map(m => (m.version, m.name, m.upSql, m.downSql, m.checksum)))
  }

  test("orphan .down.sql and non-matching filenames are skipped; timestamp versions load") {
    val dir = Files.createTempDirectory("graft-loader").toFile
    def write(name: String, content: String): Unit =
      Files.write(new java.io.File(dir, name).toPath, content.getBytes("UTF-8"))
    write("V001_ok.up.sql", "SELECT 1;")
    write("V002_orphan.down.sql", "SELECT 2;") // no matching up → skipped
    write("README.md", "not a migration")
    write("notes.sql", "SELECT 3;") // non-matching name → skipped
    write("20240101120000_ts_style.up.sql", "SELECT 4;")
    val local = MigrationLoader.loadLocal(dir.getAbsolutePath)
    assert(local.map(_.version) == Seq("001", "20240101120000"))
    val dist = MigrationLoader.loadSorted(spark, dir.getAbsolutePath).collect()
    assert(dist.map(_.version).toSeq == Seq("001", "20240101120000"))
    assert(dist.find(_.version == "20240101120000").get.name == "ts_style")
  }

  test("version sort is lexicographic on the version string") {
    // 14-digit timestamps sort after zero-padded numeric versions —
    // exactly the reference's lexicographic semantics (sorter.go:11-13)
    val vs = Seq("20240101120000", "001", "010", "002")
    assert(vs.sorted == Seq("001", "002", "010", "20240101120000"))
  }
}
