package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MERGE-capable writable DSv2 catalog — the piece that lets Spark's
  * native `MERGE INTO` SQL run without Delta/Iceberg (neither exists
  * in this environment): a `TableCatalog` whose tables implement
  * `SupportsRowLevelOperations`, so Catalyst's `RewriteMergeIntoTable`
  * produces the standard GROUP-BASED `ReplaceData` plan — scan the
  * target through the operation's scan, join with the source, apply
  * the WHEN clauses, write the rewritten rows back through the
  * operation's write. That rewrite (the part that matters at 100 TB)
  * is exactly the plan Iceberg's copy-on-write MERGE executes; only
  * the final storage commit here is memory-backed. Cluster-correct by
  * construction, not by local-mode accident: reads ship row batches
  * inside serialized `InputPartition`s, writes buffer UnsafeRow
  * copies per task and travel back in `WriterCommitMessage`s, and the
  * driver-side commit installs the new version atomically (a real
  * deployment swaps [[MemTableStore]] for a parquet/Iceberg commit —
  * the interfaces above it are unchanged).
  *
  * Group granularity is the whole table: the operation's scan reads
  * every row and the operation's write REPLACES every row. Per-file
  * grouping (Iceberg's) is the same contract at finer grain.
  */
class MemCatalog extends TableCatalog {
  private var catalogName: String = _

  /** When true, tables hand Catalyst a [[SupportsDelta]] row-level
    * operation, so MERGE/UPDATE/DELETE plan as delta-based WriteDelta
    * (merge-on-read) instead of group-based ReplaceData
    * (copy-on-write) — see [[MemDeltaCatalog]].
    */
  protected def deltaRowOps: Boolean = false

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    catalogName + "\u0000" + ident.namespace().mkString(".") +
      "\u0000" + ident.name()

  override def listTables(ns: Array[String]): Array[Identifier] =
    MemTableStore.tables.keySet().toArray(Array.empty[String])
      .filter(_.startsWith(catalogName + "\u0000"))
      .map { k =>
        val parts = k.split('\u0000')
        Identifier.of(parts(1).split('.').filter(_.nonEmpty), parts(2))
      }

  override def loadTable(ident: Identifier): Table = {
    val st = MemTableStore.tables.get(key(ident))
    if (st == null) throw new NoSuchTableException(ident)
    new MemTable(key(ident), st.schema, deltaOps = deltaRowOps)
  }

  /** TIME TRAVEL (`VERSION AS OF n`): every commit appends a snapshot
    * to the table's history; version n is the state after the n-th
    * commit (0 = the empty table CREATE installs). The returned table
    * is PINNED — its scans read the frozen snapshot, not the head —
    * which is exactly Iceberg/Delta's snapshot-isolation contract
    * re-expressed over the memory-backed store.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val st = MemTableStore.tables.get(key(ident))
    if (st == null) throw new NoSuchTableException(ident)
    val v =
      try version.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"non-integer version '$version' for ${ident.name()}")
      }
    require(v >= 0 && v < st.history.length,
      s"version $v out of range [0, ${st.history.length}) for ${ident.name()}")
    require(v >= st.expiredBelow,
      s"version $v of ${ident.name()} is EXPIRED (snapshot retention " +
        s"watermark ${st.expiredBelow}): its data files were removed " +
        "by expireSnapshots; only the commit-log metadata remains")
    new MemTable(key(ident), st.schema, pinned = Some(st.history(v)))
  }

  /** `TIMESTAMP AS OF`: commits carry a DETERMINISTIC synthetic clock
    * — version v committed at 2000-01-01T00:00:00Z + v seconds — so
    * timestamp travel is reproducible (a wall clock would make every
    * oracle hash flaky; a real deployment records real commit times
    * and the resolution rule below is unchanged). Spark hands micros;
    * the snapshot is the LATEST version committed at or before it.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val st = MemTableStore.tables.get(key(ident))
    if (st == null) throw new NoSuchTableException(ident)
    val v = ((timestampMicros / 1000000L) -
      MemTableStore.SyntheticEpochSeconds).toInt
    val pinnedV = math.min(math.max(v, -1), st.history.length - 1)
    require(pinnedV >= 0,
      s"timestamp predates every commit of ${ident.name()}")
    require(pinnedV >= st.expiredBelow,
      s"version $pinnedV of ${ident.name()} is EXPIRED (snapshot " +
        s"retention watermark ${st.expiredBelow})")
    new MemTable(key(ident), st.schema,
      pinned = Some(st.history(pinnedV)))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2 TableCatalog contract: CREATE over an existing identifier
    // must throw, never silently discard the old table's data
    val prev = MemTableStore.tables
      .putIfAbsent(key(ident), new MemTableState(schema))
    if (prev != null)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          Seq(ident.namespace().mkString("."), ident.name()))
    new MemTable(key(ident), schema, deltaOps = deltaRowOps)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER not supported")

  override def dropTable(ident: Identifier): Boolean =
    MemTableStore.tables.remove(key(ident)) != null

  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME not supported")
}

/** Driver-side versioned store: commit swaps the row array atomically. */
object MemTableStore {
  val tables = new ConcurrentHashMap[String, MemTableState]()
  /** Driver-side history lookup for the commit-log surface (q109):
    * versions-scale metadata, the class of read DESCRIBE HISTORY does.
    */
  def lookup(catalog: String, ns: String,
      name: String): Option[MemTableState] =
    Option(tables.get(catalog + "\u0000" + ns + "\u0000" + name))
  /** 2000-01-01T00:00:00Z — the synthetic commit clock's epoch
    * (version v "commits" v seconds after it).
    */
  val SyntheticEpochSeconds: Long = 946684800L
}

/** Table-maintenance actions — the lakehouse OPTIMIZE / VACUUM rung
  * (q110). Both are driver-coordinated metadata operations, exactly
  * the class Iceberg's actions and Delta's OPTIMIZE/VACUUM are: the
  * work is O(files) + O(rows moved), never a query-plan concern, and
  * at 100 TB they run as background jobs against the commit log.
  */
object MemMaintenance {
  private def state(catalog: String, ns: String,
      name: String): MemTableState =
    MemTableStore.lookup(catalog, ns, name).getOrElse(
      throw new NoSuchElementException(s"no table $catalog.$ns.$name"))

  /** Greedy in-order bin-packing: accumulate consecutive files until
    * the bin reaches `targetRows`, then close it. A file already at or
    * above the target stays alone; runs of small files coalesce. The
    * rule is order-preserving and deterministic, so an oracle can
    * re-derive the packed layout from the input sizes alone.
    */
  def binPack(layout: Vector[Int], targetRows: Int): Vector[Int] = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val packed = Vector.newBuilder[Int]
    var acc = 0
    layout.foreach { f =>
      acc += f
      if (acc >= targetRows) { packed += acc; acc = 0 }
    }
    if (acc > 0) packed += acc
    packed.result()
  }

  /** OPTIMIZE (small-file compaction): commit a new version whose ROWS
    * are identical to the head's and whose file layout is the head's
    * bin-packed to `targetRows`. Returns (filesBefore, filesAfter).
    * Row content is invariant BY CONSTRUCTION — the commit re-installs
    * the same row array; only the layout metadata (and therefore scan
    * partitioning) changes, which is precisely parquet small-file
    * compaction's contract.
    */
  def optimize(catalog: String, ns: String, name: String,
      targetRows: Int): (Int, Int) = {
    val st = state(catalog, ns, name)
    st.synchronized {
      val before = st.fileSizes.last
      val packed = binPack(before, targetRows)
      st.commit(st.rows, "optimize", Some(packed))
      (before.length, packed.length)
    }
  }

  /** Snapshot expiry (retention): drop the data arrays of every
    * version older than the newest `keepLast`, keeping the commit-log
    * METADATA (kind, row count, file count) so DESCRIBE HISTORY stays
    * consistent — Iceberg's expire_snapshots contract. Time-travel to
    * an expired version fails with a clear error instead of reading
    * freed data. Returns the number of versions newly expired.
    */
  def expireSnapshots(catalog: String, ns: String, name: String,
      keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val st = state(catalog, ns, name)
    st.synchronized {
      val cut = math.max(st.history.length - keepLast, 0)
      val newlyExpired = math.max(cut - st.expiredBelow, 0)
      if (newlyExpired > 0) {
        st.history = st.history.zipWithIndex.map { case (h, v) =>
          if (v < cut) null else h
        }
        st.expiredBelow = cut
      }
      newlyExpired
    }
  }
}

/** Per-file leading-column stats: non-null (min, max) + non-null
  * count — the footer stats zone-map skipping (q111) and metadata
  * aggregate answering (q112) read.
  */
final case class MemFileStat(mn: Long, mx: Long, nonNull: Long)

final class MemTableState(val schema: StructType) {
  @volatile var rows: Array[UnsafeRow] = Array.empty
  /** snapshot after each commit; the INDEX is the version number
    * (history(0) = the empty state the CREATE installs). Appends are
    * synchronized with the head swap so version numbering is gapless.
    * Entries below [[expiredBelow]] are nulled out by snapshot expiry
    * (data dropped, metadata retained) — guard with the watermark
    * before dereferencing.
    */
  @volatile var history: Vector[Array[UnsafeRow]] = Vector(Array.empty)
  /** operation kind per version, parallel to `history` — the commit
    * log DESCRIBE HISTORY reads (q109): "create" for version 0, then
    * "append" / "replace" (group-based row-level rewrite) / "delta"
    * (merge-on-read write) / "optimize" (bin-packing compaction,
    * rows unchanged) per commit.
    */
  @volatile var kinds: Vector[String] = Vector("create")
  /** row count per version — METADATA, parallel to `history`, and the
    * only row-count source that survives snapshot expiry (the commit
    * log stays consistent after the data arrays are dropped).
    */
  @volatile var rowCounts: Vector[Long] = Vector(0L)
  /** file layout per version: the row counts of the version's data
    * files in order (they sum to rowCounts(v)). Appends ADD files —
    * one per writer task — which is how a real lakehouse accretes
    * small files; OPTIMIZE coarsens the layout without touching rows.
    * Head scans plan ONE InputPartition per file, so compaction
    * visibly changes read parallelism the way file-level compaction
    * does on parquet.
    */
  @volatile var fileSizes: Vector[Vector[Int]] = Vector(Vector.empty)
  /** retention watermark: versions < expiredBelow are expired — their
    * history entries are nulled, time-travel to them fails cleanly,
    * their commit-log metadata (kind, row count, file count) remains.
    */
  @volatile var expiredBelow: Int = 0
  /** per-file stats of the LEADING column for the HEAD version,
    * parallel to fileSizes.last — the zone map + value counts parquet
    * footers carry, recorded at write time (commit computes them from
    * the slices it lays out). Only maintained when the leading column
    * is bigint. (mn, mx) cover the NON-NULL values (SQL min/max
    * semantics, and range predicates never match null rows so
    * skipping on the non-null range stays correct); nonNull is the
    * file's non-null value count. A file with nonNull == 0 has no
    * valid range — (MaxValue, MinValue), which every intersect test
    * rejects.
    */
  @volatile var fileStats: Vector[MemFileStat] = Vector.empty
  def commit(newRows: Array[UnsafeRow],
      kind: String = "append",
      layout: Option[Vector[Int]] = None): Unit = synchronized {
    val lay = layout.getOrElse {
      if (kind == "append") {
        val added = newRows.length - rows.length
        fileSizes.last ++ (if (added > 0) Vector(added) else Vector.empty)
      } else if (newRows.nonEmpty) Vector(newRows.length)
      else Vector.empty[Int]
    }
    require(lay.map(_.toLong).sum == newRows.length,
      s"file layout ${lay.sum} rows != committed ${newRows.length}")
    rows = newRows
    history = history :+ newRows
    kinds = kinds :+ kind
    rowCounts = rowCounts :+ newRows.length.toLong
    fileSizes = fileSizes :+ lay
    fileStats =
      if (schema.isEmpty ||
          schema.fields(0).dataType !=
            org.apache.spark.sql.types.LongType) Vector.empty
      else {
        val out = Vector.newBuilder[MemFileStat]
        var off = 0
        lay.foreach { f =>
          var mn = Long.MaxValue
          var mx = Long.MinValue
          var nn = 0L
          var i = off
          while (i < off + f) {
            if (!newRows(i).isNullAt(0)) {
              val v = newRows(i).getLong(0)
              if (v < mn) mn = v
              if (v > mx) mx = v
              nn += 1
            }
            i += 1
          }
          out += (if (nn == 0) MemFileStat(Long.MaxValue, Long.MinValue, 0L)
            else MemFileStat(mn, mx, nn))
          off += f
        }
        out.result()
      }
  }
}

final class MemTable(key: String, tschema: StructType,
    pinned: Option[Array[UnsafeRow]] = None, deltaOps: Boolean = false)
    extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = key.split('\u0000').mkString(".")
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    // plain reads may zone-map-skip files; row-level-operation scans
    // (below) build their own MemScanBuilder with skipping OFF — the
    // group-based rewrite contract must see every row of the table
    new MemScanBuilder(key, tschema, pinned, skipping = pinned.isEmpty)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, tschema, info.schema(),
      truncateFirst = false)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (deltaOps)
      () => new MemDeltaRowLevelOperation(key, tschema, info.command())
    else
      () => new MemRowLevelOperation(key, tschema, info.command())
}

/** Whole-table group: scan everything, write replaces everything. */
final class MemRowLevelOperation(key: String, tschema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(key, tschema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, tschema, info.schema(),
      truncateFirst = true)
}

/** Scan builder with zone-map FILE SKIPPING (q111): when `skipping`
  * is on (plain table reads — never row-level-operation scans, whose
  * group contract must see every row), range/equality filters on the
  * leading bigint column are folded into one conjunctive [lo, hi]
  * window and the scan PRUNES whole files whose recorded (min, max)
  * cannot intersect it — parquet footer-stats skipping re-expressed
  * over the mem store. EVERY filter is also returned as residual, so
  * Spark re-applies them row-by-row: pruning is a performance
  * contract, never a correctness dependency.
  */
final class MemScanBuilder(key: String, tschema: StructType,
    pinned: Option[Array[UnsafeRow]] = None, skipping: Boolean = false)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  private var zone: Option[(Long, Long)] = None
  private var accepted: Array[Filter] = Array.empty
  private var aggPushed: Option[(StructType, Array[Any])] = None

  /** q112 METADATA-ONLY aggregate answering: a global (ungrouped)
    * count(star)/count(lead)/min(lead)/max(lead) over a plain head
    * read is answered entirely from the commit's file stats — the
    * table's rows are never scanned, which at 100 TB is the
    * difference between a footer read and a full pass. Spark only
    * attempts aggregate pushdown when no post-scan filters remain,
    * and this source keeps every filter residual, so the metadata
    * path can never serve a filtered query. Complete pushdown: the
    * single returned row IS the final answer.
    */
  private def computeAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.types.{LongType, StructField}
    if (!skipping || zone.isDefined) return None
    if (agg.groupByExpressions().nonEmpty) return None
    if (tschema.isEmpty || tschema.fields(0).dataType != LongType)
      return None
    val st = MemTableStore.tables.get(key)
    if (st == null) return None
    val (layout, stats, total) = st.synchronized(
      (st.fileSizes.last, st.fileStats, st.rowCounts.last))
    if (stats.length != layout.length) return None
    val lead = tschema.fields(0).name
    def isLead(
        e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case nr: org.apache.spark.sql.connector.expressions
            .NamedReference =>
          nr.fieldNames().length == 1 && nr.fieldNames()(0) == lead
        case _ => false
      }
    val withVals = stats.filter(_.nonNull > 0)
    val nonNullTotal = stats.map(_.nonNull).sum
    val mnAll: Any =
      if (withVals.isEmpty) null else Long.box(withVals.map(_.mn).min)
    val mxAll: Any =
      if (withVals.isEmpty) null else Long.box(withVals.map(_.mx).max)
    val resolved = agg.aggregateExpressions().map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          Long.box(total): Any))
      case c: Count if !c.isDistinct && isLead(c.column()) =>
        Some((StructField("count_lead", LongType, nullable = false),
          Long.box(nonNullTotal): Any))
      case m: Min if isLead(m.column()) =>
        Some((StructField("min_lead", LongType, nullable = true), mnAll))
      case m: Max if isLead(m.column()) =>
        Some((StructField("max_lead", LongType, nullable = true), mxAll))
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) None
    else Some((StructType(resolved.map(_.get._1)),
      resolved.map(_.get._2).toArray))
  }
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = computeAgg(agg).isDefined
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate
        .Aggregation): Boolean = {
    aggPushed = computeAgg(agg)
    aggPushed.isDefined
  }
  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (skipping && tschema.nonEmpty &&
        tschema.fields(0).dataType ==
          org.apache.spark.sql.types.LongType) {
      val lead = tschema.fields(0).name
      var lo = Long.MinValue
      var hi = Long.MaxValue
      val used = filters.filter {
        case EqualTo(a, v) if a == lead => asLong(v).exists { l =>
          lo = math.max(lo, l); hi = math.min(hi, l); true
        }
        case GreaterThan(a, v) if a == lead => asLong(v).exists { l =>
          lo = math.max(lo, if (l == Long.MaxValue) l else l + 1); true
        }
        case GreaterThanOrEqual(a, v) if a == lead =>
          asLong(v).exists { l => lo = math.max(lo, l); true }
        case LessThan(a, v) if a == lead => asLong(v).exists { l =>
          hi = math.min(hi, if (l == Long.MinValue) l else l - 1); true
        }
        case LessThanOrEqual(a, v) if a == lead =>
          asLong(v).exists { l => hi = math.min(hi, l); true }
        case _ => false
      }
      if (used.nonEmpty) { zone = Some((lo, hi)); accepted = used }
    }
    filters // all residual: Spark re-applies every predicate
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def build(): Scan = aggPushed match {
    case Some((sch, vals)) => new MemAggScan(sch, vals)
    case None =>
      new MemScan(key, tschema, pinned, zone, runtimeFilterable = skipping)
  }
}

/** The metadata-answered aggregate scan (q112): one partition, one
  * row, zero data read — the values were resolved from file stats at
  * pushdown time.
  */
final class MemAggScan(sch: StructType, vals: Array[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = sch
  override def toBatch: Batch = this
  override def description(): String = "MemAggScan(metadata-only)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(MemAggPartition(vals))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val values = p.asInstanceOf[MemAggPartition].vals
          private var done = false
          override def next(): Boolean =
            if (done) false else { done = true; true }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(values.clone())
          override def close(): Unit = ()
        }
    }
}

final case class MemAggPartition(vals: Array[Any])
    extends InputPartition

final class MemScan(key: String, tschema: StructType,
    pinned: Option[Array[UnsafeRow]] = None,
    zone: Option[(Long, Long)] = None,
    runtimeFilterable: Boolean = false) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  /** q113 RUNTIME file pruning (Iceberg's DPP mechanism): after the
    * build side of a join executes, Spark hands this scan the join
    * keys as an `In` filter on the leading column; files whose
    * (min, max) range contains none of them are dropped at EXECUTION
    * time — pruning planning could never do, because the key set only
    * exists at runtime. Correctness is free: the join itself still
    * filters row-by-row; skipping a file that cannot contain any
    * build-side key removes only rows the join would discard.
    */
  @volatile private var runtimeKeys: Option[Array[Long]] = None
  /** NEVER advertised for row-level-operation scans (runtimeFilterable
    * is only set on plain head reads): the group here is the WHOLE
    * table, so the replace write rewrites exactly what the scan
    * produced — a runtime-pruned MERGE/DELETE target scan would
    * silently DROP every row of the pruned files at commit.
    */
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    if (runtimeFilterable && pinned.isEmpty && tschema.nonEmpty &&
        tschema.fields(0).dataType ==
          org.apache.spark.sql.types.LongType)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .column(tschema.fields(0).name))
    else Array.empty
  override def filter(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val lead = tschema.fields(0).name
    filters.foreach {
      case org.apache.spark.sql.sources.In(a, vs) if a == lead =>
        runtimeKeys = Some(vs.collect {
          case l: Long => l
          case i: Int => i.toLong
          case n: java.lang.Number => n.longValue()
        }.sorted)
      case _ => ()
    }
  }
  override def readSchema(): StructType = tschema
  override def toBatch: Batch = this
  override def description(): String =
    s"MemScan${zone.map(z => s" zone=[${z._1},${z._2}]").getOrElse("")}"
  override def planInputPartitions(): Array[InputPartition] = {
    // rows ride inside the serialized partitions — executor-correct;
    // a version-pinned table reads its frozen snapshot, never the head
    pinned match {
      case Some(rows) =>
        val chunks = if (rows.isEmpty) Array(Array.empty[UnsafeRow])
          else rows.grouped(math.max(1, rows.length / 8)).toArray
        chunks.map(c => MemPartition(c): InputPartition)
      case None =>
        // head read: ONE InputPartition per data FILE (the layout the
        // last commit recorded), so small-file accretion degrades scan
        // parallelism the way it does on parquet and OPTIMIZE (q110)
        // visibly restores it. With a pushed zone window, files whose
        // recorded (min, max) cannot intersect it are SKIPPED whole.
        val st = MemTableStore.tables.get(key)
        val (rows, layout, stats) = st.synchronized(
          (st.rows, st.fileSizes.last, st.fileStats))
        if (rows.isEmpty || layout.isEmpty)
          Array(MemPartition(Array.empty[UnsafeRow]): InputPartition)
        else {
          val statsOk = stats.length == layout.length
          val keys = runtimeKeys
          def anyKeyIn(mn: Long, mx: Long): Boolean = keys match {
            case None => true
            case Some(ks) =>
              val idx = java.util.Arrays.binarySearch(ks, mn)
              val at = if (idx >= 0) idx else -idx - 1
              at < ks.length && ks(at) <= mx
          }
          val out = Array.newBuilder[InputPartition]
          var off = 0
          var kept = 0
          layout.zipWithIndex.foreach { case (f, i) =>
            val keep = (zone match {
              case Some((lo, hi)) if statsOk =>
                stats(i).mx >= lo && stats(i).mn <= hi
              case _ => true
            }) && (!statsOk || anyKeyIn(stats(i).mn, stats(i).mx))
            if (keep) { out += MemPartition(rows.slice(off, off + f)); kept += 1 }
            off += f
          }
          MemScanTelemetry.record(key, layout.length, kept)
          if (kept == 0)
            Array(MemPartition(Array.empty[UnsafeRow]): InputPartition)
          else out.result()
        }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory
}

final case class MemPartition(rows: Array[UnsafeRow])
    extends InputPartition

/** Driver-side scan-planning telemetry: the last head-read's
  * (files in layout, files actually planned) per table. Partition
  * planning runs on the driver, so this is exact — it is how q113's
  * census OBSERVES runtime file pruning (the executed plan's
  * partition count is fixed at compile time for everything except
  * the scan, and runtime filtering changes it after planning).
  */
object MemScanTelemetry {
  private val last = new ConcurrentHashMap[String, (Int, Int)]()
  def record(key: String, total: Int, planned: Int): Unit =
    last.put(key, (total, planned))
  def lastScan(catalog: String, ns: String,
      name: String): Option[(Int, Int)] =
    Option(last.get(catalog + "\u0000" + ns + "\u0000" + name))
}

final class MemReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MemPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

final class MemWriteBuilder(key: String, tschema: StructType,
    writeSchema: StructType, truncateFirst: Boolean)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = truncateFirst
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new MemBatchWrite(key, tschema, writeSchema, doTruncate)
  }
}

final class MemBatchWrite(key: String, tschema: StructType,
    writeSchema: StructType, replace: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(tschema, writeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.flatMap {
      case MemCommit(rows) => rows
      case _ => Array.empty[UnsafeRow]
    }
    val st = MemTableStore.tables.get(key)
    // read-modify-swap under the state's own lock: two concurrent
    // appends must both land (st.commit alone only made the swap
    // atomic, not the `st.rows ++` read feeding it). Each non-empty
    // writer task's payload becomes ONE data file in the layout —
    // exactly how a parquet append accretes task-grain files.
    val msgSizes = messages.collect {
      case MemCommit(r) if r.nonEmpty => r.length
    }.toVector
    st.synchronized {
      if (replace) st.commit(incoming, "replace", Some(msgSizes))
      else st.commit(st.rows ++ incoming, "append",
        Some(st.fileSizes.last ++ msgSizes))
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemCommit(rows: Array[UnsafeRow])
    extends WriterCommitMessage

/** Delta-flavored [[MemCatalog]]: identical store, but row-level
  * operations advertise [[SupportsDelta]], so Catalyst's
  * RewriteMergeIntoTable / RewriteUpdateTable / RewriteDeleteFromTable
  * plan the DELTA-BASED `WriteDelta` (merge-on-read) instead of the
  * group-based `ReplaceData` (copy-on-write) MemCatalog runs. The
  * difference is the whole point at 100 TB: copy-on-write REWRITES
  * every row of every touched group (q88's posture — simple reads,
  * expensive writes), while merge-on-read ships only the CHANGED rows
  * as typed (insert / update / delete) deltas and leaves unmatched
  * rows untouched (cheap writes; a real lakehouse pays at read time by
  * merging delete files). q106 runs q88's exact MERGE through this
  * catalog and hash-proves the two postures converge to the same
  * table; PlanGateSpec pins WriteDelta (not ReplaceData) in its plan.
  *
  * Row identity is the table's FIRST column (`rowId`), the mem-store
  * analogue of Iceberg's identifier fields — q88/q89-shaped tables key
  * on their leading bigint.
  */
class MemDeltaCatalog extends MemCatalog {
  override protected def deltaRowOps: Boolean = true
}

/** Delta (merge-on-read) row-level operation: same whole-table scan,
  * but the write receives typed per-row actions instead of a full
  * replacement image.
  */
final class MemDeltaRowLevelOperation(key: String, tschema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation
    with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(key, tschema)
  override def newWriteBuilder(
      info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new MemDeltaWrite(key, tschema, info.schema())
    }
  override def rowId(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(tschema.fields(0).name))
}

final class MemDeltaWrite(key: String, tschema: StructType,
    writeSchema: StructType) extends DeltaWrite {
  override def toBatch: DeltaBatchWrite =
    new MemDeltaBatchWrite(key, tschema, writeSchema)
}

/** Commit applies the typed deltas to the head snapshot: deletes and
  * updates resolve by rowId against a position map (O(state) build,
  * O(1) per delta — the mem analogue of a positional delete file
  * merge), inserts append. Untouched rows are NEVER rewritten — the
  * merge-on-read contract the group-based path can't make.
  */
final class MemDeltaBatchWrite(key: String, tschema: StructType,
    writeSchema: StructType) extends DeltaBatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new MemDeltaWriterFactory(tschema, writeSchema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val st = MemTableStore.tables.get(key)
    val idType = tschema.fields(0).dataType
    // the whole read-apply-swap holds the state's lock: reading
    // st.rows, building the position map, and committing the result
    // must be atomic against a concurrent row-level commit to the
    // same table, or one commit's deltas are silently lost
    st.synchronized {
    val rows = st.rows
    // position map by row id (first column); boxed Integer so an
    // absent key reads as null, not an unboxed 0
    val pos = new java.util.HashMap[Any, Integer](rows.length * 2)
    var i = 0
    while (i < rows.length) {
      pos.put(rows(i).get(0, idType), Integer.valueOf(i)); i += 1
    }
    val out: Array[UnsafeRow] = rows.clone()
    val deleted = new java.util.HashSet[Integer]()
    val inserts = scala.collection.mutable.ArrayBuffer[UnsafeRow]()
    messages.foreach {
      case MemDeltaCommit(dels, upds, ins) =>
        dels.foreach { idRow =>
          val p = pos.get(idRow.get(0, idType))
          if (p != null) deleted.add(p)
        }
        upds.foreach { case (idRow, dataRow) =>
          val p = pos.get(idRow.get(0, idType))
          if (p != null) out(p.intValue()) = dataRow
        }
        inserts ++= ins
      case _ => ()
    }
    val kept = out.zipWithIndex.collect {
      case (r, idx) if !deleted.contains(Integer.valueOf(idx)) => r
    }
    st.commit(kept ++ inserts, "delta")
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Typed per-task delta payload: deleted ids, (id → new row) updates,
  * inserted rows — the only bytes a merge-on-read write ships.
  */
final case class MemDeltaCommit(deletes: Array[UnsafeRow],
    updates: Array[(UnsafeRow, UnsafeRow)], inserts: Array[UnsafeRow])
    extends WriterCommitMessage

final class MemDeltaWriterFactory(tschema: StructType,
    writeSchema: StructType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      // id rows arrive in rowId layout (one leading-column field);
      // data rows arrive POSITIONALLY in table-column order
      // (WriteDeltaExec's rowProjection binds the table attributes by
      // ordinal; LogicalWriteInfo.schema() is EMPTY on the delta path,
      // so MemWriterFactory's by-name reprojection has nothing to bind
      // against). Re-project by name only when the write schema
      // actually carries the table's fields.
      private val idProj = UnsafeProjection.create(Array(
        org.apache.spark.sql.catalyst.expressions.BoundReference(
          0, tschema.fields(0).dataType, tschema.fields(0).nullable)
          : org.apache.spark.sql.catalyst.expressions.Expression))
      private val dataProj = {
        val namesMatch = tschema.forall(f =>
          writeSchema.exists(_.name == f.name))
        val exprs =
          if (namesMatch) tschema.map { f =>
            val i = writeSchema.fieldIndex(f.name)
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(i, writeSchema(i).dataType,
                writeSchema(i).nullable)
          }
          else tschema.zipWithIndex.map { case (f, i) =>
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(i, f.dataType, f.nullable)
          }
        UnsafeProjection.create(exprs)
      }
      private val dels = scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      private val upds =
        scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]()
      private val ins = scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels += idProj(id).copy()
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        require(row.numFields >= tschema.length,
          s"delta update row has ${row.numFields} fields for a " +
            s"${tschema.length}-column table")
        upds += ((idProj(id).copy(), dataProj(row).copy()))
      }
      override def insert(row: InternalRow): Unit = {
        require(row.numFields >= tschema.length,
          s"delta insert row has ${row.numFields} fields for a " +
            s"${tschema.length}-column table")
        ins += dataProj(row).copy()
      }
      override def commit(): WriterCommitMessage =
        MemDeltaCommit(dels.toArray, upds.toArray, ins.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

final class MemWriterFactory(tschema: StructType,
    writeSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // incoming rows arrive in the WRITE schema's layout (a MERGE
      // rewrite may order/augment fields differently from the table);
      // store them re-projected BY NAME into table-schema order so
      // the read side's layout assumption always holds
      private val byName = {
        val exprs = tschema.map { f =>
          val i = writeSchema.fieldIndex(f.name)
          org.apache.spark.sql.catalyst.expressions
            .BoundReference(i, writeSchema(i).dataType,
              writeSchema(i).nullable)
        }
        UnsafeProjection.create(exprs)
      }
      // Spark 4.1's group-based ReplaceData (MERGE rewrite) declares
      // the 3-column write schema in LogicalWriteInfo but, when no
      // metadata projection is needed, feeds the writer MergeRowsExec's
      // RAW physical output: one bookkeeping column PREPENDED to the
      // table columns (observed empirically; ReplaceDataExec only
      // applies its rowProjection on the metadata path — verified in
      // the shipped bytecode). Bind the TRAILING table-arity fields by
      // position in that case; the q88 oracle hash over all three
      // MERGE actions pins the semantics end-to-end.
      private def trailing(n: Int) = {
        val off = n - tschema.length
        // the observed Spark 4.1 layout is EXACTLY one prepended
        // bookkeeping column; any other width means the physical
        // row-level-operation output changed across a Spark upgrade
        // (or the metadata-projection path fired) — fail loudly
        // instead of binding the wrong columns positionally
        require(off == 1,
          s"unexpected row-level-operation write layout: $n fields " +
            s"for a ${tschema.length}-column table (expected exactly " +
            "one prepended bookkeeping column from MergeRowsExec); " +
            "re-verify the physical output layout before binding")
        UnsafeProjection.create(tschema.zipWithIndex.map { case (f, i) =>
          org.apache.spark.sql.catalyst.expressions
            .BoundReference(off + i, f.dataType, f.nullable)
        })
      }
      private var wide: UnsafeProjection = null
      private val buf = scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      override def write(row: InternalRow): Unit = {
        val p =
          if (row.numFields == writeSchema.length) byName
          else {
            require(row.numFields > tschema.length,
              s"row has ${row.numFields} fields, table has ${tschema.length}")
            if (wide == null) wide = trailing(row.numFields)
            wide
          }
        buf += p(row).copy()
      }
      override def commit(): WriterCommitMessage = MemCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
