package graft.rules

import graft.classify.SqlClassifier._
import graft.model.{Finding, Severity}

/** Danger-detection rule registry.
  *
  * Reimplements the reference's nine analysis rules
  * (`internal/analyzer/rules/registry.go:6-19`) over the classified-
  * statement ADT. Each rule is a pure function
  * `(Stmt, RuleContext) => Seq[Finding]` — they analyze *foreign* SQL
  * text, not Spark plans, so no Catalyst involvement is needed
  * (SURVEY.md §2.2); the analyzer runs them inside a Dataset flatMap.
  */
final case class RuleContext(targetPgVersion: Int, stmtIndex: Int)

trait Rule extends Serializable {
  def id: String
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding]
  protected def finding(severity: Int, table: String, stmt: Stmt,
      ctx: RuleContext, message: String, suggestion: String,
      lockType: String): Finding =
    Finding(id, severity, table, truncateSql(stmt.sql), ctx.stmtIndex,
      message, suggestion, lockType)
}

/** R1 — CREATE INDEX without CONCURRENTLY takes a SHARE lock blocking
  * writes for the whole build (reference:
  * `internal/analyzer/rules/create_index.go:16-39`).
  */
object CreateIndexNotConcurrent extends Rule {
  val id = "create-index-not-concurrent"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: CreateIndexStmt if !s.concurrent =>
      Seq(finding(Severity.High, s.table.render, s, ctx,
        "CREATE INDEX without CONCURRENTLY blocks writes to the table for the duration of the build",
        "Use CREATE INDEX CONCURRENTLY (outside a transaction)",
        "SHARE"))
    case _ => Nil
  }
}

/** R2 — ALTER TABLE ... ADD COLUMN with DEFAULT: full table rewrite on
  * PG<11 for any default; on any version a volatile default (NOW(),
  * random()) still rewrites (reference:
  * `internal/analyzer/rules/alter_add_column.go:18-92`; version gate at
  * :74-76, threshold const :9).
  */
object AddColumnVolatileDefault extends Rule {
  val id = "add-column-volatile-default"
  val pgVersionSafeNonVolatileDefault = 11
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AddColumn(col, _, Some(d), _, _)
            if d.volatile || ctx.targetPgVersion < pgVersionSafeNonVolatileDefault =>
          val why =
            if (d.volatile)
              s"ADD COLUMN $col with a volatile DEFAULT forces a full table rewrite"
            else
              s"ADD COLUMN $col with DEFAULT forces a full table rewrite on PostgreSQL < $pgVersionSafeNonVolatileDefault"
          finding(Severity.High, s.table.render, s, ctx, why,
            "Add the column without DEFAULT, then backfill in batches and set the default afterwards",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R3 — ADD CONSTRAINT CHECK/FOREIGN KEY without NOT VALID validates the
  * whole table under ACCESS EXCLUSIVE (reference:
  * `internal/analyzer/rules/alter_add_constraint.go:16-75`; other
  * constraint kinds ignored at :54-57).
  */
object AddConstraintWithoutNotValid extends Rule {
  val id = "add-constraint-without-not-valid"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AddConstraint(name, kind, false, _)
            if kind == CheckConstraint || kind == ForeignKeyConstraint =>
          val kindStr = if (kind == CheckConstraint) "CHECK" else "FOREIGN KEY"
          finding(Severity.High, s.table.render, s, ctx,
            s"ADD $kindStr constraint ${if (name.nonEmpty) name + " " else ""}without NOT VALID scans and validates the entire table while holding a lock",
            "Add the constraint with NOT VALID, then VALIDATE CONSTRAINT in a separate transaction",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R4 — ALTER COLUMN ... TYPE rewrites the table and all its indexes
  * (reference: `internal/analyzer/rules/alter_column_type.go:16-54`).
  */
object AlterColumnTypeRule extends Rule {
  val id = "alter-column-type"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AlterColumnType(col, newType) =>
          finding(Severity.High, s.table.render, s, ctx,
            s"ALTER COLUMN $col TYPE $newType rewrites the table and its indexes under ACCESS EXCLUSIVE lock",
            "Stage it: add a new column, backfill in batches, swap with a rename, drop the old column",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R5 — SET NOT NULL: full table scan; HIGH on PG<12, MEDIUM on PG>=12
  * where an existing CHECK constraint lets PG skip the scan (reference:
  * `internal/analyzer/rules/alter_set_not_null.go:18-64`; version const
  * :9, downgrade :47-50).
  */
object SetNotNullRule extends Rule {
  val id = "set-not-null"
  val pgVersionSafeSetNotNull = 12
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case SetNotNull(col) =>
          val sev =
            if (ctx.targetPgVersion >= pgVersionSafeSetNotNull) Severity.Medium
            else Severity.High
          finding(sev, s.table.render, s, ctx,
            s"SET NOT NULL on $col requires a full table scan under ACCESS EXCLUSIVE lock",
            "Add a CHECK (col IS NOT NULL) NOT VALID constraint, VALIDATE it, then SET NOT NULL (instant on PG >= 12)",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R6 — DROP TABLE / TRUNCATE destroy data irreversibly: CRITICAL, one
  * finding per table (reference:
  * `internal/analyzer/rules/drop_table.go:18-105`; multi-table name
  * extraction :60-69,82-105).
  */
object DropTableRule extends Rule {
  val id = "drop-table"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: DropTableStmt =>
      s.tables.map { t =>
        finding(Severity.Critical, t.render, s, ctx,
          s"DROP TABLE ${t.render} permanently deletes the table and all its data",
          "Ensure a verified backup exists; consider renaming the table first and dropping it later",
          "ACCESS EXCLUSIVE")
      }
    case s: TruncateStmt =>
      s.tables.map { t =>
        finding(Severity.Critical, t.render, s, ctx,
          s"TRUNCATE ${t.render} permanently deletes all rows",
          "Ensure a verified backup exists; consider a soft-delete or batched DELETE instead",
          "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R7 — VACUUM FULL rewrites the whole table under ACCESS EXCLUSIVE
  * (reference: `internal/analyzer/rules/vacuum_full.go:16-71`; `full`
  * option detection :43-56; `<all tables>` :58-71).
  */
object VacuumFullRule extends Rule {
  val id = "vacuum-full"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: VacuumStmt if s.full =>
      val tbl = s.table.map(_.render).getOrElse("<all tables>")
      Seq(finding(Severity.High, tbl, s, ctx,
        s"VACUUM FULL on $tbl rewrites the entire table under ACCESS EXCLUSIVE lock",
        "Use plain VACUUM (or pg_repack for space reclamation without the exclusive lock)",
        "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R8 — explicit LOCK TABLE blocks concurrent access; one finding per
  * relation (reference: `internal/analyzer/rules/lock_table.go:16-50`).
  */
object LockTableRule extends Rule {
  val id = "lock-table"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: LockStmt =>
      s.tables.map { t =>
        finding(Severity.High, t.render, s, ctx,
          s"Explicit LOCK TABLE on ${t.render} blocks concurrent access until the transaction ends",
          "Avoid explicit table locks in migrations; rely on DDL's implicit locking with lock_timeout set",
          "EXPLICIT")
      }
    case _ => Nil
  }
}

/** R9 — RENAME TABLE / RENAME COLUMN break running application code:
  * MEDIUM; RENAME INDEX/constraint are safe (reference:
  * `internal/analyzer/rules/rename.go:16-55`; safe fallthrough :54).
  */
object RenameRule extends Rule {
  val id = "rename"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: RenameStmt if s.kind == RenameTable =>
      Seq(finding(Severity.Medium, s.table.render, s, ctx,
        s"RENAME TABLE ${s.from} TO ${s.to} breaks queries from running application versions",
        "Stage it: create a view with the old name during the transition, or deploy code reading both names first",
        "ACCESS EXCLUSIVE"))
    case s: RenameStmt if s.kind == RenameColumn =>
      Seq(finding(Severity.Medium, s.table.render, s, ctx,
        s"RENAME COLUMN ${s.from} TO ${s.to} on ${s.table.render} breaks queries from running application versions",
        "Stage it: add the new column, dual-write, backfill, then drop the old column after cutover",
        "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R10 (beyond the reference's nine) — `DO $$ … $$` procedural blocks
  * are OPAQUE to static analysis: neither this classifier nor the
  * reference's pg_query descends into the body's (possibly dynamic)
  * SQL, so an `ALTER TABLE` spelled inside one would sail through the
  * danger gate unseen. Rather than silently classifying safe, the
  * block is flagged LOW: reviewable, never blocking (the gate trips at
  * HIGH), and honest about the analyzer's blind spot.
  */
object OpaqueDoBlockRule extends Rule {
  val id = "opaque-do-block"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: DoStmt =>
      Seq(finding(Severity.Low, "", s, ctx,
        "DO block body is opaque to static analysis; DDL inside it cannot be checked by the danger rules",
        "Inline DDL as top-level statements so each is analyzable, or review the block manually",
        "UNKNOWN"))
    case _ => Nil
  }
}

/** R11 (R10's sibling) — `CREATE [OR REPLACE] FUNCTION | PROCEDURE`
  * bodies are the other opaque container: neither this classifier nor
  * the reference's node walk descends into a routine body, so DDL
  * spelled inside one sails past the gate. Flagged LOW (reviewable,
  * never blocking), same honesty contract as opaque-do-block.
  */
object OpaqueRoutineBodyRule extends Rule {
  val id = "opaque-routine-body"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: CreateRoutineStmt =>
      Seq(finding(Severity.Low, s.name.render, s, ctx,
        s"CREATE ${s.routine} body is opaque to static analysis; DDL inside it cannot be checked by the danger rules",
        "Keep DDL out of routine bodies (run it as top-level statements), or review the body manually",
        "UNKNOWN"))
    case _ => Nil
  }
}

/** R28 (R10/R11's third sibling) — an `ALTER <non-TABLE object>`
  * statement the classifier cannot type lands in OtherStmt and would
  * otherwise pass SILENTLY — but ALTER forms are exactly where lock
  * and rewrite hazards live (ALTER INDEX ... SET TABLESPACE copies
  * the index under ACCESS EXCLUSIVE; ALTER MATERIALIZED VIEW forms
  * take strong locks). pg_query (the reference's parser,
  * `internal/parser/parser.go:18-33`) would type these; our subset
  * grammar cannot, so the honest posture is the opaque-container
  * warning, not silence: LOW, reviewable, never blocking the gate.
  * DML / DCL / SELECT heads stay silent — those are genuinely outside
  * every danger rule's scope, same as the reference registry.
  */
object UnclassifiedAlterRule extends Rule {
  val id = "unclassified-alter"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: OtherStmt if s.head == "ALTER" =>
      Seq(finding(Severity.Low, "", s, ctx,
        "ALTER statement form is outside the analyzer's grammar — its lock/rewrite behavior was NOT analyzed",
        "Review manually: ALTER INDEX/MATERIALIZED VIEW/TYPE forms can rewrite storage or take ACCESS EXCLUSIVE locks",
        "UNKNOWN"))
    case _ => Nil
  }
}

/** R12 — REINDEX without CONCURRENTLY rebuilds the index under an
  * ACCESS EXCLUSIVE lock on the index (and a write-blocking lock on
  * its table) for the whole rebuild. The reference's pg_query types
  * ReindexStmt but its registry ignores it
  * (`internal/analyzer/rules/registry.go:6-19`) — this and R13-R15
  * extend the registry to the classic zero-downtime lock hazards that
  * walk straight through it.
  */
object ReindexNotConcurrentRule extends Rule {
  val id = "reindex-not-concurrent"
  val pgVersionReindexConcurrently = 12
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: ReindexStmt if !s.concurrent =>
      val tgt = s.target.map(_.render)
        .getOrElse(s"<${s.kind.toLowerCase}>")
      val fix =
        if (ctx.targetPgVersion >= pgVersionReindexConcurrently)
          "Use REINDEX CONCURRENTLY (outside a transaction)"
        else
          "REINDEX CONCURRENTLY requires PostgreSQL >= 12; build a replacement index with CREATE INDEX CONCURRENTLY, then drop and rename"
      Seq(finding(Severity.High, tgt, s, ctx,
        s"REINDEX ${s.kind} $tgt without CONCURRENTLY blocks writes (and readers of the index) for the whole rebuild",
        fix, "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R13 — CLUSTER rewrites the entire table in index order under
  * ACCESS EXCLUSIVE: reads AND writes blocked for the duration. Bare
  * `CLUSTER` re-clusters every previously clustered table in the
  * database.
  */
object ClusterRule extends Rule {
  val id = "cluster"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: ClusterStmt =>
      val tbl = s.table.map(_.render).getOrElse("<all clustered tables>")
      Seq(finding(Severity.High, tbl, s, ctx,
        s"CLUSTER on $tbl rewrites the whole table under ACCESS EXCLUSIVE lock, blocking reads and writes",
        "Use pg_repack for online physical reordering, or accept unordered heap and rely on the index",
        "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R14 — REFRESH MATERIALIZED VIEW without CONCURRENTLY locks the MV
  * ACCESS EXCLUSIVE for the full recompute — even SELECTs block. The
  * concurrent form (needs a unique index on the MV) refreshes without
  * blocking readers.
  */
object RefreshMatViewNotConcurrentRule extends Rule {
  val id = "refresh-matview-not-concurrent"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: RefreshMatViewStmt if !s.concurrent =>
      Seq(finding(Severity.High, s.view.render, s, ctx,
        s"REFRESH MATERIALIZED VIEW ${s.view.render} without CONCURRENTLY blocks all reads of the view for the whole recompute",
        "Create a UNIQUE index on the materialized view and use REFRESH MATERIALIZED VIEW CONCURRENTLY",
        "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R15 — ALTER TABLE ... ADD PRIMARY KEY builds the unique index AND
  * scans every row for NOT NULL validation under ACCESS EXCLUSIVE.
  * The safe recipe is two steps: CREATE UNIQUE INDEX CONCURRENTLY,
  * then `ADD CONSTRAINT ... PRIMARY KEY USING INDEX` (a metadata-only
  * attach on an already-NOT-NULL column) — the USING INDEX form is
  * therefore not flagged.
  */
object AddPrimaryKeyRule extends Rule {
  val id = "add-primary-key"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AddConstraint(name, PrimaryKeyConstraint, _, false) =>
          finding(Severity.High, s.table.render, s, ctx,
            s"ADD PRIMARY KEY ${if (name.nonEmpty) name + " " else ""}builds a unique index and validates NOT NULL over the whole table under ACCESS EXCLUSIVE lock",
            "CREATE UNIQUE INDEX CONCURRENTLY first, then ADD CONSTRAINT ... PRIMARY KEY USING INDEX",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R16 — DETACH PARTITION without CONCURRENTLY takes ACCESS EXCLUSIVE
  * on the partitioned PARENT: every query on the whole partitioned
  * table blocks for the detach. CONCURRENTLY (PG≥14) detaches in two
  * transactions without blocking readers.
  */
object DetachPartitionNotConcurrentRule extends Rule {
  val id = "detach-partition-not-concurrent"
  val pgVersionDetachConcurrently = 14
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case DetachPartition(part, false) =>
          val fix =
            if (ctx.targetPgVersion >= pgVersionDetachConcurrently)
              "Use DETACH PARTITION ... CONCURRENTLY (outside a transaction)"
            else
              "DETACH PARTITION CONCURRENTLY requires PostgreSQL >= 14; schedule the detach in a low-traffic window with lock_timeout set"
          finding(Severity.High, s.table.render, s, ctx,
            s"DETACH PARTITION $part without CONCURRENTLY takes ACCESS EXCLUSIVE on the partitioned table, blocking every query on it",
            fix, "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R17 — ATTACH PARTITION holds SHARE UPDATE EXCLUSIVE on the parent
  * while it SCANS the attached table to validate the partition bound
  * — unless a pre-existing CHECK constraint already proves it, which
  * static analysis cannot see; flagged MEDIUM with the skip-the-scan
  * recipe.
  */
object AttachPartitionValidationRule extends Rule {
  val id = "attach-partition-validation"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AttachPartition(part) =>
          finding(Severity.Medium, s.table.render, s, ctx,
            s"ATTACH PARTITION $part scans the attached table to validate the bound while holding SHARE UPDATE EXCLUSIVE on the parent",
            "Add a CHECK constraint matching the partition bound to the table BEFORE attaching (the scan is skipped), then drop it after",
            "SHARE UPDATE EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R18 — CREATE TRIGGER takes SHARE ROW EXCLUSIVE on the table:
  * brief, but it blocks writes while held and queues behind any
  * long-running transaction touching the table. LOW (reviewable,
  * never blocking the gate).
  */
object CreateTriggerRule extends Rule {
  val id = "create-trigger"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: CreateTriggerStmt =>
      Seq(finding(Severity.Low, s.table.render, s, ctx,
        s"CREATE TRIGGER ${s.name} takes SHARE ROW EXCLUSIVE on ${s.table.render} — writes block while it is held and the DDL queues behind long transactions",
        "Set lock_timeout and create the trigger in a low-traffic window; for volume triggers consider batching the backfill separately",
        "SHARE ROW EXCLUSIVE"))
    case _ => Nil
  }
}

/** R19 — DROP INDEX without CONCURRENTLY takes ACCESS EXCLUSIVE on
  * the table: brief, but every query on the table blocks behind it
  * and it queues behind long transactions. MEDIUM (the lock window is
  * metadata-short, unlike a rebuild).
  */
object DropIndexNotConcurrentRule extends Rule {
  val id = "drop-index-not-concurrent"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: DropIndexStmt if !s.concurrent =>
      val tgt = s.indexes.map(_.render).mkString(", ")
      Seq(finding(Severity.Medium, tgt, s, ctx,
        s"DROP INDEX $tgt without CONCURRENTLY takes ACCESS EXCLUSIVE on the table while the index is removed",
        "Use DROP INDEX CONCURRENTLY (outside a transaction) with lock_timeout set",
        "ACCESS EXCLUSIVE"))
    case _ => Nil
  }
}

/** R20 — `ALTER TABLE … SET TABLESPACE | SET LOGGED | SET UNLOGGED`:
  * each physically REWRITES the whole table (and, for TABLESPACE,
  * copies every byte to the new volume) under ACCESS EXCLUSIVE.
  */
object TableStorageRewriteRule extends Rule {
  val id = "table-storage-rewrite"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case SetTableStorage(kind) =>
          finding(Severity.High, s.table.render, s, ctx,
            s"SET $kind rewrites the entire table under ACCESS EXCLUSIVE lock",
            "Stage the move: create a new table in the target state, backfill in batches, swap with a rename",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R21 — ADD COLUMN ... GENERATED: both server-computed forms force a
  * FULL table rewrite when added to an existing table under ACCESS
  * EXCLUSIVE — STORED computes the expression for every row, IDENTITY
  * assigns a sequence value to every row (PG 11's fast-default path
  * covers constant defaults only). VIRTUAL generated columns (PG 18+)
  * are computed on read and classify with `generated = None` — safe.
  */
object AddGeneratedColumnRule extends Rule {
  val id = "add-generated-column"
  /** PG 18 flipped the default for an omitted STORED/VIRTUAL keyword:
    * pre-18 the grammar only accepts (and implies) STORED — a full
    * rewrite; 18+ the omitted keyword means VIRTUAL — metadata-only.
    */
  val pgVersionVirtualGeneratedDefault = 18
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AddColumn(col, _, _, _, Some(kind))
            if kind != DefaultGenerated ||
              ctx.targetPgVersion < pgVersionVirtualGeneratedDefault =>
          val why = kind match {
            case StoredGenerated =>
              s"ADD COLUMN $col GENERATED ALWAYS AS (...) STORED computes the expression for every existing row — a full table rewrite"
            case DefaultGenerated =>
              s"ADD COLUMN $col GENERATED ALWAYS AS (...) without STORED/VIRTUAL implies STORED on PostgreSQL < $pgVersionVirtualGeneratedDefault — a full table rewrite (on $pgVersionVirtualGeneratedDefault+ the omitted keyword defaults to VIRTUAL and is safe)"
            case IdentityGenerated =>
              s"ADD COLUMN $col GENERATED AS IDENTITY assigns a sequence value to every existing row — a full table rewrite"
          }
          finding(Severity.High, s.table.render, s, ctx, why,
            "Add a plain column, backfill in batches, then attach the generation afterwards (or keep the computation in queries/views)",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R22 — DROP COLUMN is metadata-fast but irreversibly discards the
  * column's data AND breaks any running application version still
  * reading it (squawk's ban-drop-column / strong_migrations'
  * remove_column class — the reference registry ignores it). MEDIUM:
  * reviewable, never gate-blocking; the lock window itself is short.
  */
object DropColumnRule extends Rule {
  val id = "drop-column"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case DropColumn(col) =>
          finding(Severity.Medium, s.table.render, s, ctx,
            s"DROP COLUMN $col irreversibly discards the column's data and breaks running application versions that still read it",
            "Deploy application code that no longer references the column first; drop it in a later migration once no running version reads it",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** R23 — ADD CONSTRAINT ... UNIQUE (without USING INDEX) builds the
  * unique index inside ALTER TABLE's ACCESS EXCLUSIVE lock — R15's
  * sibling for UNIQUE constraints. Safe recipe: CREATE UNIQUE INDEX
  * CONCURRENTLY, then ADD CONSTRAINT ... UNIQUE USING INDEX (a
  * metadata-only attach) — the USING INDEX form is not flagged.
  */
object AddUniqueConstraintRule extends Rule {
  val id = "add-unique-constraint"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] = stmt match {
    case s: AlterTableStmt =>
      s.cmds.collect {
        case AddConstraint(name, UniqueConstraint, _, false) =>
          finding(Severity.High, s.table.render, s, ctx,
            s"ADD UNIQUE constraint ${if (name.nonEmpty) name + " " else ""}builds the unique index over the whole table under ACCESS EXCLUSIVE lock",
            "CREATE UNIQUE INDEX CONCURRENTLY first, then ADD CONSTRAINT ... UNIQUE USING INDEX",
            "ACCESS EXCLUSIVE")
      }
    case _ => Nil
  }
}

/** Shared scan for the column-type advisory rules (R25-R27): every
  * (table, column, type) a statement introduces — CREATE TABLE's
  * parsed column list plus ALTER TABLE ADD COLUMN.
  */
private[rules] object TypedColumns {
  /** Canonical type spelling for the advisory rules: lowercase, paren
    * groups tightened, runs of whitespace collapsed — so the ADD
    * COLUMN parser's space-joined tokens ("timestamp ( 3 )") and the
    * CREATE TABLE parser's tight form ("timestamp(3)") match the same
    * rule regex.
    */
  def norm(tpe: String): String = tpe.toLowerCase
    .replaceAll("\\s*\\(\\s*", "(").replaceAll("\\s*\\)", ")")
    .replaceAll("\\s+", " ").trim

  def of(stmt: Stmt): Seq[(String, String, String)] = stmt match {
    case c: CreateTableStmt =>
      c.columns.map { case (n, t) => (c.table.render, n, t) }
    case a: AlterTableStmt => a.cmds.collect {
      case AddColumn(n, tpe, _, _, _) => (a.table.render, n, tpe)
    }
    case _ => Nil
  }
}

/** R25 — 32-bit integer keys (id / *_id typed int/serial) exhaust at
  * 2.1B rows, and the later int→bigint fix is R4's full-rewrite
  * ACCESS EXCLUSIVE migration on what is by then the biggest table
  * (squawk's prefer-big-int / prefer-identity class). LOW: advisory,
  * the cheapest moment to fix this is the CREATE TABLE.
  */
object PreferBigintKeyRule extends Rule {
  val id = "prefer-bigint-key"
  private val narrow = Set("int", "integer", "int4", "serial")
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] =
    TypedColumns.of(stmt).collectFirst {
      case (tbl, col, tpe)
          if (col.equalsIgnoreCase("id") ||
            col.toLowerCase.endsWith("_id")) &&
            narrow.contains(tpe.toLowerCase) =>
        finding(Severity.Low, tbl, stmt, ctx,
          s"key column $col is 32-bit ($tpe): it exhausts at 2.1 billion rows and the later widening is a full-table-rewrite migration",
          "Use bigint / bigserial (or GENERATED AS IDENTITY on bigint) for key columns from the start",
          "NONE")
    }.toSeq
}

/** R26 — `timestamp` WITHOUT time zone stores wall-clock values whose
  * meaning depends on an ambient timezone; cross-region readers and
  * DST transitions corrupt silently (squawk prefer-timestamptz). LOW.
  */
object PreferTimestamptzRule extends Rule {
  val id = "prefer-timestamptz"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] =
    TypedColumns.of(stmt).collectFirst {
      case (tbl, col, tpe)
          // bare `timestamp` AND the explicit `timestamp without time
          // zone` spelling are the same (hazardous) type; `timestamp
          // with time zone` / timestamptz stay safe
          if TypedColumns.norm(tpe)
            .matches("timestamp(\\(\\d+\\))?( without time zone)?") =>
        finding(Severity.Low, tbl, stmt, ctx,
          s"column $col is `timestamp` without time zone — its values mean different instants in different timezones and DST transitions corrupt silently",
          "Use timestamptz (timestamp with time zone); it stores an unambiguous instant",
          "NONE")
    }.toSeq
}

/** R27 — char(n) is blank-PADDED: comparisons and lengths behave
  * unexpectedly, and the padding wastes storage (squawk
  * ban-char-field). `character varying` / varchar is NOT this type.
  * LOW.
  */
object BanCharFieldRule extends Rule {
  val id = "ban-char-field"
  def check(stmt: Stmt, ctx: RuleContext): Seq[Finding] =
    TypedColumns.of(stmt).collectFirst {
      case (tbl, col, tpe)
          if TypedColumns.norm(tpe).matches("char(acter)?(\\(\\d+\\))?") =>
        finding(Severity.Low, tbl, stmt, ctx,
          s"column $col is blank-padded $tpe — equality and length semantics surprise, and the padding costs storage",
          "Use text (or varchar(n) if a length bound is genuinely required)",
          "NONE")
    }.toSeq
}

/** File-level rule: sees the WHOLE migration's classified statement
  * list at once. Per-statement rules cannot express cross-statement
  * hazards — R24's atomicity loss is a property of the file, not of
  * any one statement.
  */
trait FileRule extends Serializable {
  def id: String
  def checkFile(stmts: Seq[Stmt], targetPgVersion: Int): Seq[Finding]
}

/** R24 — mixing a CONCURRENTLY statement with anything else in one
  * migration file silently costs the other statements their
  * atomicity: CONCURRENTLY DDL cannot run inside a transaction block,
  * so the executor runs the WHOLE file in autocommit mode (reference
  * `internal/executor/executor.go:280-309` +
  * `internal/executor/concurrent.go:15-40`, mirrored by
  * `exec/Executor.scala`) — a failure mid-file then leaves a
  * partially-applied migration with no rollback. Neither engine's
  * registry flags this today. MEDIUM on each CONCURRENTLY statement
  * of a multi-statement file; a single-statement CONCURRENTLY file
  * (the recommended shape) is safe.
  */
object MixedConcurrentAtomicityRule extends FileRule {
  val id = "mixed-concurrent-atomicity"
  private def concurrentTable(s: Stmt): Option[String] = s match {
    case c: CreateIndexStmt if c.concurrent => Some(c.table.render)
    case c: DropIndexStmt if c.concurrent =>
      Some(c.indexes.headOption.map(_.render).getOrElse("<index>"))
    case c: ReindexStmt if c.concurrent =>
      Some(c.target.map(_.render).getOrElse("<index>"))
    case c: RefreshMatViewStmt if c.concurrent => Some(c.view.render)
    case a: AlterTableStmt if a.cmds.exists {
          case DetachPartition(_, true) => true
          case _ => false
        } => Some(a.table.render)
    case _ => None
  }
  def checkFile(stmts: Seq[Stmt], targetPgVersion: Int): Seq[Finding] =
    if (stmts.length < 2) Nil
    else stmts.zipWithIndex.flatMap { case (s, idx) =>
      concurrentTable(s).map { tbl =>
        Finding(id, Severity.Medium, tbl, truncateSql(s.sql), idx,
          s"a CONCURRENTLY statement cannot run inside a transaction, so the executor runs this ENTIRE ${stmts.length}-statement file in autocommit mode — the other ${stmts.length - 1} statement(s) lose atomicity and a mid-file failure leaves a partial migration with no rollback",
          "Move the CONCURRENTLY statement into its own migration file so the remaining statements keep transactional atomicity",
          "NONE")
      }
    }
}

/** Default registry — the nine reference rules, the two opaque-
  * container rules (do-block, routine-body), the four extended
  * lock-hazard rules (reindex, cluster, refresh-matview, add-primary-
  * key), the three partition/trigger rules (detach, attach,
  * create-trigger), the two storage rules (drop-index,
  * table-storage-rewrite), and the three column/constraint rules
  * (add-generated-column, drop-column, add-unique-constraint), unique
  * IDs (reference: `internal/analyzer/rules/registry.go:6-19`).
  */
object Registry {
  val defaultRules: Seq[Rule] = Seq(
    CreateIndexNotConcurrent,
    AddColumnVolatileDefault,
    AddConstraintWithoutNotValid,
    AlterColumnTypeRule,
    SetNotNullRule,
    DropTableRule,
    VacuumFullRule,
    LockTableRule,
    RenameRule,
    OpaqueDoBlockRule,
    OpaqueRoutineBodyRule,
    UnclassifiedAlterRule,
    ReindexNotConcurrentRule,
    ClusterRule,
    RefreshMatViewNotConcurrentRule,
    AddPrimaryKeyRule,
    DetachPartitionNotConcurrentRule,
    AttachPartitionValidationRule,
    CreateTriggerRule,
    DropIndexNotConcurrentRule,
    TableStorageRewriteRule,
    AddGeneratedColumnRule,
    DropColumnRule,
    AddUniqueConstraintRule,
    PreferBigintKeyRule,
    PreferTimestamptzRule,
    BanCharFieldRule)

  /** File-level rules (run once per migration over the whole
    * statement list) — R24 mixed-CONCURRENTLY atomicity.
    */
  val defaultFileRules: Seq[FileRule] = Seq(MixedConcurrentAtomicityRule)
}
