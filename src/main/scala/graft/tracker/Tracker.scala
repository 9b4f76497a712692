package graft.tracker

import graft.model.{AppliedMigration, MigrationNotFound, MigrationStatus}
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The `schema_migrations` state store (reference:
  * `internal/tracker/tracker.go`, DDL `internal/tracker/schema.go:4-11`).
  *
  * Q1-Q5 (SURVEY.md §2.2) as DataFrame operations over the tracker
  * table: point existence = filter+limit, applied list = filter+orderBy,
  * upsert = anti-join+union (MERGE semantics), keyed update, point
  * lookup.
  */
trait Tracker {
  def ensureTable(): Unit
  /** Q1: is this version currently applied? */
  def isApplied(version: String): Boolean
  /** Q2: applied migrations ordered by version. */
  def getApplied(): Seq[AppliedMigration]
  /** Q5: stored checksum; MigrationNotFound if absent. */
  def getChecksum(version: String): String
  /** Q3: INSERT … ON CONFLICT (version) DO UPDATE. */
  def recordApplied(row: AppliedMigration): Unit
  /** Q4: UPDATE status='rolled_back'; MigrationNotFound on 0 rows. */
  def recordRolledBack(version: String): Unit
}

/** Parquet-snapshot tracker: the table lives as versioned snapshot
  * directories under `basePath`, with a `_CURRENT` pointer file updated
  * by atomic rename. Single-writer safety comes from the executor's
  * lock lease (as in the reference, where the advisory lock serializes
  * all tracker writes); the atomic pointer swap additionally keeps
  * readers consistent. On a lakehouse deployment the natural backend is
  * a Delta/Iceberg table with real MERGE — the trait boundary is where
  * that swaps in.
  *
  * The tracker is metadata-scale (one row per migration), so
  * snapshot-rewrite-on-upsert is O(migrations), not O(data).
  */
final class ParquetTracker(spark: SparkSession, basePath: String)
    extends Tracker {
  import spark.implicits._

  private def base: Path = Paths.get(basePath)
  private def pointer: Path = base.resolve("_CURRENT")

  def ensureTable(): Unit = {
    Files.createDirectories(base)
    if (!Files.exists(pointer)) writeSnapshot(Seq.empty)
  }

  private def currentSnapshot: Option[String] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer), "UTF-8").trim)
    else None

  def table(): Dataset[AppliedMigration] = currentSnapshot match {
    case Some(snap) =>
      spark.read.parquet(base.resolve(snap).toString).as[AppliedMigration]
    case None => spark.emptyDataset[AppliedMigration]
  }

  private def writeSnapshot(rows: Seq[AppliedMigration]): Unit = {
    val snapName = s"snap_${System.currentTimeMillis()}_${rows.length}"
    val snapDir = base.resolve(snapName)
    rows.toDS().coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(snapDir.toString)
    val tmp = base.resolve(s"_CURRENT.tmp.${System.nanoTime()}")
    Files.write(tmp, snapName.getBytes("UTF-8"))
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def isApplied(version: String): Boolean =
    table().filter(col("version") === version &&
      col("status") === MigrationStatus.Applied).limit(1).count() > 0

  def getApplied(): Seq[AppliedMigration] =
    table().filter(col("status") === MigrationStatus.Applied)
      .orderBy("version").collect().toSeq

  def getChecksum(version: String): String = {
    val rows = table().filter(col("version") === version)
      .select("checksum").collect()
    if (rows.isEmpty) throw MigrationNotFound(version)
    rows.head.getString(0)
  }

  def recordApplied(row: AppliedMigration): Unit = {
    val existing = table().collect().toSeq
    val merged = existing.filterNot(_.version == row.version) :+
      row.copy(status = MigrationStatus.Applied)
    writeSnapshot(merged.sortBy(_.version))
  }

  def recordRolledBack(version: String): Unit = {
    val existing = table().collect().toSeq
    if (!existing.exists(_.version == version))
      throw MigrationNotFound(version)
    val merged = existing.map { r =>
      if (r.version == version) r.copy(status = MigrationStatus.RolledBack)
      else r
    }
    writeSnapshot(merged)
  }
}

/** In-memory tracker for white-box executor tests (the reference's stub
  * tracker pattern, `internal/executor/executor_internal_test.go`).
  */
final class InMemoryTracker extends Tracker {
  var rows: Vector[AppliedMigration] = Vector.empty
  var ensured = false
  def ensureTable(): Unit = ensured = true
  def isApplied(version: String): Boolean =
    rows.exists(r => r.version == version &&
      r.status == MigrationStatus.Applied)
  def getApplied(): Seq[AppliedMigration] =
    rows.filter(_.status == MigrationStatus.Applied).sortBy(_.version)
  def getChecksum(version: String): String =
    rows.find(_.version == version).map(_.checksum)
      .getOrElse(throw MigrationNotFound(version))
  def recordApplied(row: AppliedMigration): Unit =
    rows = rows.filterNot(_.version == row.version) :+
      row.copy(status = MigrationStatus.Applied)
  def recordRolledBack(version: String): Unit = {
    if (!rows.exists(_.version == version)) throw MigrationNotFound(version)
    rows = rows.map(r =>
      if (r.version == version) r.copy(status = MigrationStatus.RolledBack)
      else r)
  }
}
