package graft

import graft.analyzer.Analyzer
import graft.model.{Migration, Severity}
import graft.rules._
import org.scalatest.funsuite.AnyFunSuite

/** Per-rule tests — the case matrix from the reference's rule tests
  * (`internal/analyzer/rules/` per-rule test files) plus the 24-fixture acceptance
  * set (FIXTURES.md §1).
  */
class RulesSpec extends AnyFunSuite {

  def analyze(sql: String, pg: Int = 14) =
    new Analyzer(targetPgVersion = pg)
      .analyze(Migration("001", "t", sql, "", "f.sql"))

  // --- fixture acceptance set -------------------------------------------

  val fixtureExpectations: Seq[(String, String, Int, Seq[String])] = Seq(
    ("V001", "CREATE TABLE users (id BIGSERIAL PRIMARY KEY, email TEXT NOT NULL, created_at TIMESTAMPTZ DEFAULT NOW());",
      Severity.Safe, Nil),
    ("V002", "CREATE INDEX idx_users_email ON users (email);",
      Severity.High, Seq("create-index-not-concurrent")),
    ("V003", "ALTER TABLE users ADD COLUMN status TEXT DEFAULT 'active';",
      Severity.Safe, Nil), // PG>=11 constant default
    ("V004", "ALTER TABLE users ADD CONSTRAINT chk_email CHECK (email ~* '^.+@.+$');",
      Severity.High, Seq("add-constraint-without-not-valid")),
    ("V005", "ALTER TABLE users ALTER COLUMN email TYPE VARCHAR(255);",
      Severity.High, Seq("alter-column-type")),
    ("V006", "ALTER TABLE users ALTER COLUMN status SET NOT NULL;",
      Severity.Medium, Seq("set-not-null")), // PG>=12
    ("V007", "DROP TABLE users;", Severity.Critical, Seq("drop-table")),
    ("V008", "VACUUM FULL users;", Severity.High, Seq("vacuum-full")),
    ("V009", "LOCK TABLE users IN ACCESS EXCLUSIVE MODE;",
      Severity.High, Seq("lock-table")),
    ("V010", "ALTER TABLE users RENAME COLUMN email TO email_address;",
      Severity.Medium, Seq("rename")),
    ("V011", "CREATE INDEX CONCURRENTLY idx_users_status ON users (status);",
      Severity.Safe, Nil),
    ("V012", "ALTER TABLE users ADD COLUMN bio TEXT;", Severity.Safe, Nil),
    ("V013", "REINDEX TABLE users;", Severity.High,
      Seq("reindex-not-concurrent")),
    ("V014", "CLUSTER users USING idx_users_email;", Severity.High,
      Seq("cluster")),
    ("V015", "REFRESH MATERIALIZED VIEW user_stats;", Severity.High,
      Seq("refresh-matview-not-concurrent")),
    ("V016", "ALTER TABLE users ADD CONSTRAINT users_pkey PRIMARY KEY (id);",
      Severity.High, Seq("add-primary-key")),
    ("V017", "ALTER TABLE measurements DETACH PARTITION measurements_2023;",
      Severity.High, Seq("detach-partition-not-concurrent")),
    ("V018", "ALTER TABLE measurements ATTACH PARTITION measurements_2024 " +
      "FOR VALUES FROM ('2024-01-01') TO ('2025-01-01');",
      Severity.Medium, Seq("attach-partition-validation")),
    ("V019", "CREATE TRIGGER audit_trg AFTER INSERT ON users " +
      "FOR EACH ROW EXECUTE FUNCTION audit();",
      Severity.Low, Seq("create-trigger")),
    ("V020", "DROP INDEX idx_users_email;",
      Severity.Medium, Seq("drop-index-not-concurrent")),
    ("V021", "ALTER TABLE users SET UNLOGGED;",
      Severity.High, Seq("table-storage-rewrite")),
    ("V022", "ALTER TABLE users ADD COLUMN display_name text " +
      "GENERATED ALWAYS AS (coalesce(nickname, full_name)) STORED;",
      Severity.High, Seq("add-generated-column")),
    ("V023", "ALTER TABLE users DROP COLUMN legacy_flags;",
      Severity.Medium, Seq("drop-column")),
    ("V024", "ALTER TABLE users ADD CONSTRAINT users_email_key " +
      "UNIQUE (email);",
      Severity.High, Seq("add-unique-constraint")),
    ("V025", "CREATE INDEX CONCURRENTLY idx_users_flags ON users (flags);\n" +
      "UPDATE users SET flags = 0 WHERE flags IS NULL;",
      Severity.Medium, Seq("mixed-concurrent-atomicity")),
    ("V026", "CREATE TABLE legacy_events (id integer PRIMARY KEY, " +
      "code char(8), happened_at timestamp NOT NULL, " +
      "recorded_at timestamp without time zone, " +
      "archived_at timestamptz, note varchar(40));",
      Severity.Low, Seq("prefer-bigint-key", "prefer-timestamptz",
        "ban-char-field")),
    ("V027", "ALTER INDEX idx_users_email SET TABLESPACE fastspace;",
      Severity.Low, Seq("unclassified-alter")))

  for ((v, sql, expSev, expRules) <- fixtureExpectations)
    test(s"fixture $v → ${Severity.label(expSev)}") {
      val r = analyze(sql)
      assert(r.maxSeverity == expSev,
        s"severity mismatch for $sql: got ${r.findings}")
      assert(r.findings.map(_.rule).distinct.sorted == expRules.sorted)
    }

  // --- version-dependent behavior ---------------------------------------

  test("R2: constant DEFAULT flagged HIGH on PG<11, safe on PG>=11") {
    val sql = "ALTER TABLE users ADD COLUMN status TEXT DEFAULT 'active';"
    assert(analyze(sql, pg = 10).maxSeverity == Severity.High)
    assert(analyze(sql, pg = 11).maxSeverity == Severity.Safe)
  }

  test("R2: volatile DEFAULT (NOW()) flagged HIGH on any version") {
    val sql = "ALTER TABLE users ADD COLUMN ts TIMESTAMPTZ DEFAULT NOW();"
    assert(analyze(sql, pg = 16).maxSeverity == Severity.High)
    assert(analyze(sql, pg = 10).maxSeverity == Severity.High)
  }

  test("R2: cast-of-constant DEFAULT is non-volatile") {
    val sql = "ALTER TABLE users ADD COLUMN s TEXT DEFAULT 'x'::text;"
    assert(analyze(sql, pg = 14).maxSeverity == Severity.Safe)
    assert(analyze(sql, pg = 10).maxSeverity == Severity.High)
  }

  test("R5: SET NOT NULL is HIGH on PG<12, MEDIUM on PG>=12") {
    val sql = "ALTER TABLE users ALTER COLUMN c SET NOT NULL;"
    assert(analyze(sql, pg = 11).maxSeverity == Severity.High)
    assert(analyze(sql, pg = 12).maxSeverity == Severity.Medium)
  }

  // --- rule specifics ----------------------------------------------------

  test("R1: unique and partial indexes still flagged; concurrent safe") {
    assert(analyze("CREATE UNIQUE INDEX u ON t (a);").maxSeverity == Severity.High)
    assert(analyze("CREATE INDEX p ON t (a) WHERE a > 0;").maxSeverity == Severity.High)
    assert(analyze("CREATE UNIQUE INDEX CONCURRENTLY u ON t (a);").maxSeverity == Severity.Safe)
  }

  test("R1: schema-qualified table reported") {
    val r = analyze("CREATE INDEX i ON myschema.users (a);")
    assert(r.findings.head.table == "myschema.users")
  }

  test("R3: UNIQUE/PRIMARY KEY constraints are ignored by R3 " +
      "(UNIQUE is R23's finding and PRIMARY KEY R15's — neither is a " +
      "not-valid one)") {
    val u = analyze("ALTER TABLE t ADD CONSTRAINT u UNIQUE (a);")
    assert(u.findings.map(_.rule) == Seq("add-unique-constraint"), u.findings)
    val pk = analyze("ALTER TABLE t ADD CONSTRAINT p PRIMARY KEY (a);")
    assert(pk.findings.map(_.rule) == Seq("add-primary-key"), pk.findings)
  }

  test("R3: NOT VALID suppresses the finding") {
    assert(analyze("ALTER TABLE t ADD CONSTRAINT c CHECK (a > 0) NOT VALID;").maxSeverity == Severity.Safe)
    assert(analyze("ALTER TABLE t ADD CONSTRAINT f FOREIGN KEY (b) REFERENCES o(id) NOT VALID;").maxSeverity == Severity.Safe)
  }

  test("R6: one CRITICAL finding per dropped/truncated table") {
    val r1 = analyze("DROP TABLE a, b;")
    assert(r1.findings.length == 2 &&
      r1.findings.forall(_.severity == Severity.Critical))
    val r2 = analyze("TRUNCATE x, y;")
    assert(r2.findings.map(_.table) == Seq("x", "y"))
    assert(analyze("DROP TABLE IF EXISTS a;").maxSeverity == Severity.Critical)
  }

  test("R7: VACUUM without FULL is safe; paren form detected") {
    assert(analyze("VACUUM users;").maxSeverity == Severity.Safe)
    assert(analyze("VACUUM ANALYZE users;").maxSeverity == Severity.Safe)
    assert(analyze("VACUUM (FULL) users;").maxSeverity == Severity.High)
    assert(analyze("VACUUM FULL;").findings.head.table == "<all tables>")
  }

  test("R8: one finding per locked relation, lock type EXPLICIT") {
    val r = analyze("LOCK TABLE a, b IN SHARE MODE;")
    assert(r.findings.length == 2 && r.findings.forall(_.lockType == "EXPLICIT"))
  }

  test("R9: RENAME INDEX / CONSTRAINT are safe") {
    assert(analyze("ALTER TABLE t RENAME CONSTRAINT a TO b;").maxSeverity == Severity.Safe)
    assert(analyze("ALTER INDEX i RENAME TO j;").maxSeverity == Severity.Safe)
    assert(analyze("ALTER TABLE t RENAME TO t2;").maxSeverity == Severity.Medium)
  }

  test("multi-statement migration: findings across statements with indexes") {
    val r = analyze(
      "CREATE INDEX i ON t (a); DROP TABLE old_t; SELECT 1;")
    assert(r.maxSeverity == Severity.Critical)
    assert(r.findings.map(f => (f.rule, f.stmtIndex)).toSet ==
      Set(("create-index-not-concurrent", 0), ("drop-table", 1)))
  }

  test("registry: the reference's nine rules + the two opaque-" +
      "container rules + the four extended lock-hazard rules + the " +
      "three partition/trigger rules + the two storage rules + the " +
      "three column/constraint rules + the three column-type " +
      "advisories, unique ids") {
    assert(Registry.defaultRules.length == 27)
    assert(Registry.defaultRules.map(_.id).distinct.length == 27)
  }

  test("R19: DROP INDEX non-concurrent is MEDIUM (brief ACCESS " +
      "EXCLUSIVE); CONCURRENTLY is safe") {
    val r = analyze("DROP INDEX idx_users_email;")
    assert(r.findings.map(_.rule) == Seq("drop-index-not-concurrent"))
    assert(r.maxSeverity == Severity.Medium)
    assert(!r.hasHighOrCritical)
    assert(analyze("DROP INDEX CONCURRENTLY idx_users_email;")
      .maxSeverity == Severity.Safe)
  }

  test("R20: SET TABLESPACE / SET LOGGED / SET UNLOGGED each flag a " +
      "HIGH full-rewrite; plain storage-parameter SET (...) stays " +
      "unflagged") {
    for (cmd <- Seq("SET TABLESPACE fast_ssd", "SET LOGGED",
        "SET UNLOGGED")) {
      val r = analyze(s"ALTER TABLE events $cmd;")
      assert(r.findings.map(_.rule) == Seq("table-storage-rewrite"),
        s"$cmd → ${r.findings}")
      assert(r.maxSeverity == Severity.High)
      assert(r.findings.head.table == "events")
    }
    // reloptions SET (fillfactor=70) is metadata-only — not a rewrite
    assert(analyze("ALTER TABLE events SET (fillfactor = 70);")
      .maxSeverity == Severity.Safe)
  }

  test("R21: ADD COLUMN GENERATED ... STORED and GENERATED AS " +
      "IDENTITY are HIGH full rewrites; VIRTUAL (PG 18) and a plain " +
      "ADD COLUMN are safe; commas inside the generation expression " +
      "do not split the command") {
    val stored = analyze("ALTER TABLE users ADD COLUMN display_name " +
      "text GENERATED ALWAYS AS (coalesce(nickname, full_name)) STORED;")
    assert(stored.findings.map(_.rule) == Seq("add-generated-column"),
      s"got ${stored.findings}")
    assert(stored.maxSeverity == Severity.High)
    assert(stored.findings.head.table == "users")
    assert(stored.findings.head.lockType == "ACCESS EXCLUSIVE")
    for (idForm <- Seq("GENERATED ALWAYS AS IDENTITY",
        "GENERATED BY DEFAULT AS IDENTITY (START WITH 10)")) {
      val r = analyze(s"ALTER TABLE users ADD COLUMN uid bigint $idForm;")
      assert(r.findings.map(_.rule) == Seq("add-generated-column"),
        s"$idForm → ${r.findings}")
      assert(r.maxSeverity == Severity.High)
    }
    assert(analyze("ALTER TABLE users ADD COLUMN v int " +
      "GENERATED ALWAYS AS (a + b) VIRTUAL;").maxSeverity == Severity.Safe)
    assert(analyze("ALTER TABLE users ADD COLUMN bio text;")
      .maxSeverity == Severity.Safe)
    // the comma inside coalesce(...) must not terminate the ADD
    // COLUMN sub-command: exactly ONE finding, and a trailing second
    // command is still parsed
    val multi = analyze("ALTER TABLE users ADD COLUMN d text " +
      "GENERATED ALWAYS AS (coalesce(a, b)) STORED, " +
      "ALTER COLUMN e TYPE bigint;")
    assert(multi.findings.map(_.rule).sorted ==
      Seq("add-generated-column", "alter-column-type"))
    // omitted STORED/VIRTUAL keyword: implies STORED (HIGH) below
    // PG 18, defaults VIRTUAL (safe) from 18 on
    val bare = "ALTER TABLE users ADD COLUMN d int " +
      "GENERATED ALWAYS AS (a + b);"
    for (pg <- Seq(14, 17)) {
      val r = analyze(bare, pg)
      assert(r.findings.map(_.rule) == Seq("add-generated-column"),
        s"pg$pg → ${r.findings}")
      assert(r.maxSeverity == Severity.High)
    }
    for (pg <- Seq(18, 19))
      assert(analyze(bare, pg).maxSeverity == Severity.Safe,
        s"pg$pg should treat omitted keyword as VIRTUAL")
  }

  test("R22: DROP COLUMN is MEDIUM (irreversible + app-breaking) in " +
      "every spelling; DROP CONSTRAINT stays safe") {
    for (form <- Seq("DROP COLUMN legacy_flags",
        "DROP legacy_flags", "DROP COLUMN IF EXISTS legacy_flags CASCADE")) {
      val r = analyze(s"ALTER TABLE users $form;")
      assert(r.findings.map(_.rule) == Seq("drop-column"),
        s"$form → ${r.findings}")
      assert(r.maxSeverity == Severity.Medium)
      assert(!r.hasHighOrCritical)
      assert(r.findings.head.table == "users")
    }
    assert(analyze("ALTER TABLE users DROP CONSTRAINT users_email_key;")
      .maxSeverity == Severity.Safe)
  }

  test("R23: ADD UNIQUE constraint is HIGH (index build under ACCESS " +
      "EXCLUSIVE); the USING INDEX attach form — the rule's own " +
      "recipe — is safe; unnamed ADD UNIQUE also flags") {
    val named = analyze("ALTER TABLE users ADD CONSTRAINT " +
      "users_email_key UNIQUE (email);")
    assert(named.findings.map(_.rule) == Seq("add-unique-constraint"))
    assert(named.maxSeverity == Severity.High)
    assert(named.findings.head.table == "users")
    val unnamed = analyze("ALTER TABLE users ADD UNIQUE (email);")
    assert(unnamed.findings.map(_.rule) == Seq("add-unique-constraint"))
    assert(analyze("ALTER TABLE users ADD CONSTRAINT users_email_key " +
      "UNIQUE USING INDEX users_email_idx;").maxSeverity == Severity.Safe)
  }

  test("R24: a CONCURRENTLY statement mixed with anything else in one " +
      "file is MEDIUM on the concurrent statement (the whole file runs " +
      "autocommit — siblings lose atomicity); a single-statement " +
      "CONCURRENTLY file and an all-plain file are safe; every " +
      "concurrent spelling triggers; composes with per-statement rules") {
    // single-statement CONCURRENTLY file: the recommended shape — safe
    assert(analyze("CREATE INDEX CONCURRENTLY i ON users (a);")
      .maxSeverity == Severity.Safe)
    // multi-statement, no CONCURRENTLY: per-statement rules only
    assert(!analyze("UPDATE a SET x = 1;\nUPDATE b SET y = 2;")
      .findings.map(_.rule).contains("mixed-concurrent-atomicity"))
    // create index concurrently + backfill: MEDIUM on stmt 0
    val r = analyze("CREATE INDEX CONCURRENTLY idx_users_flags ON " +
      "users (flags);\nUPDATE users SET flags = 0;")
    assert(r.findings.map(_.rule) == Seq("mixed-concurrent-atomicity"),
      s"got ${r.findings}")
    assert(r.maxSeverity == Severity.Medium)
    assert(r.findings.head.table == "users")
    assert(r.findings.head.stmtIndex == 0)
    assert(r.findings.head.lockType == "NONE")
    // concurrent statement second: stmtIndex follows it
    val r2 = analyze("UPDATE users SET flags = 0;\n" +
      "DROP INDEX CONCURRENTLY idx_users_flags;")
    assert(r2.findings.map(f => (f.rule, f.stmtIndex)) ==
      Seq(("mixed-concurrent-atomicity", 1)))
    // every concurrent spelling triggers when mixed
    for (c <- Seq("REINDEX TABLE CONCURRENTLY users",
        "REFRESH MATERIALIZED VIEW CONCURRENTLY user_stats",
        "ALTER TABLE m DETACH PARTITION p CONCURRENTLY"))
      assert(analyze(s"$c;\nUPDATE t SET x = 1;").findings
        .map(_.rule).contains("mixed-concurrent-atomicity"), c)
    // composes: the sibling's own rule still fires alongside R24
    val both = analyze("CREATE INDEX CONCURRENTLY i ON users (a);\n" +
      "DROP TABLE legacy;")
    assert(both.findings.map(_.rule).sorted ==
      Seq("drop-table", "mixed-concurrent-atomicity"))
    assert(both.maxSeverity == Severity.Critical)
  }

  test("R16: DETACH PARTITION non-concurrent is HIGH (ACCESS " +
      "EXCLUSIVE on the parent); CONCURRENTLY and FINALIZE-after-" +
      "concurrent are safe; suggestion is version-aware across the " +
      "PG-14 boundary") {
    val r = analyze(
      "ALTER TABLE measurements DETACH PARTITION measurements_2023;")
    assert(r.findings.map(_.rule) ==
      Seq("detach-partition-not-concurrent"))
    assert(r.maxSeverity == Severity.High)
    assert(r.findings.head.table == "measurements")
    assert(r.findings.head.lockType == "ACCESS EXCLUSIVE")
    assert(analyze("ALTER TABLE m DETACH PARTITION p CONCURRENTLY;")
      .maxSeverity == Severity.Safe)
    val pre = analyze("ALTER TABLE m DETACH PARTITION p;", pg = 13)
    val post = analyze("ALTER TABLE m DETACH PARTITION p;", pg = 14)
    assert(pre.maxSeverity == Severity.High &&
      post.maxSeverity == Severity.High)
    assert(pre.findings.head.suggestion.contains("requires PostgreSQL >= 14"))
    assert(post.findings.head.suggestion.contains("CONCURRENTLY"))
  }

  test("R17: ATTACH PARTITION is MEDIUM (validation scan under SHARE " +
      "UPDATE EXCLUSIVE) with the pre-declared-CHECK recipe") {
    val r = analyze("ALTER TABLE measurements ATTACH PARTITION " +
      "measurements_2024 FOR VALUES FROM ('2024-01-01') TO ('2025-01-01');")
    assert(r.findings.map(_.rule) == Seq("attach-partition-validation"))
    assert(r.maxSeverity == Severity.Medium)
    assert(r.findings.head.lockType == "SHARE UPDATE EXCLUSIVE")
    assert(r.findings.head.suggestion.contains("CHECK constraint"))
    assert(!r.hasHighOrCritical) // never blocks the gate
  }

  test("R18: CREATE [OR REPLACE] [CONSTRAINT] TRIGGER flags LOW with " +
      "the table extracted past the event list (INSTEAD OF / UPDATE " +
      "OF col don't confuse the ON scan)") {
    val r = analyze("CREATE TRIGGER audit_trg AFTER INSERT OR " +
      "UPDATE OF email ON app.users FOR EACH ROW EXECUTE FUNCTION " +
      "audit();")
    assert(r.findings.map(_.rule) == Seq("create-trigger"))
    assert(r.maxSeverity == Severity.Low)
    assert(r.findings.head.table == "app.users")
    assert(r.findings.head.lockType == "SHARE ROW EXCLUSIVE")
    val r2 = analyze("CREATE OR REPLACE TRIGGER t INSTEAD OF DELETE " +
      "ON v FOR EACH ROW EXECUTE FUNCTION f();")
    assert(r2.findings.head.table == "v")
    val r3 = analyze("CREATE CONSTRAINT TRIGGER ct AFTER UPDATE ON " +
      "orders DEFERRABLE FOR EACH ROW EXECUTE FUNCTION chk();")
    assert(r3.findings.head.table == "orders")
    assert(!r.hasHighOrCritical)
  }

  test("COMMENT ON is typed (CommentStmt) and safe — not an " +
      "anonymous OtherStmt") {
    import graft.classify.SqlClassifier
    assert(SqlClassifier.classify(
      "COMMENT ON TABLE users IS 'core accounts'")
      .isInstanceOf[SqlClassifier.CommentStmt])
    assert(analyze("COMMENT ON COLUMN users.email IS 'pii';")
      .maxSeverity == Severity.Safe)
  }

  test("R12: REINDEX non-concurrent is HIGH for every target form; " +
      "CONCURRENTLY (keyword slot or PG14 option list) is safe; " +
      "suggestion is version-aware across the PG-12 boundary") {
    val r = analyze("REINDEX TABLE users;")
    assert(r.findings.map(_.rule) == Seq("reindex-not-concurrent"))
    assert(r.maxSeverity == Severity.High)
    assert(r.findings.head.lockType == "ACCESS EXCLUSIVE")
    assert(r.findings.head.table == "users")
    assert(analyze("REINDEX INDEX idx_users_email;")
      .findings.head.table == "idx_users_email")
    assert(analyze("REINDEX SCHEMA public;").maxSeverity == Severity.High)
    assert(analyze("REINDEX DATABASE app;").maxSeverity == Severity.High)
    // both concurrent spellings are the safe form
    assert(analyze("REINDEX TABLE CONCURRENTLY users;")
      .maxSeverity == Severity.Safe)
    assert(analyze("REINDEX (VERBOSE, CONCURRENTLY) TABLE users;")
      .maxSeverity == Severity.Safe)
    // version matrix: HIGH on both sides of PG 12, but the recipe
    // differs (REINDEX CONCURRENTLY does not exist before 12)
    val pre = analyze("REINDEX TABLE users;", pg = 11)
    val post = analyze("REINDEX TABLE users;", pg = 14)
    assert(pre.maxSeverity == Severity.High &&
      post.maxSeverity == Severity.High)
    assert(pre.findings.head.suggestion.contains("CREATE INDEX CONCURRENTLY"),
      pre.findings.head.suggestion)
    assert(post.findings.head.suggestion.contains("REINDEX CONCURRENTLY"),
      post.findings.head.suggestion)
  }

  test("R13: CLUSTER is HIGH (full rewrite); bare CLUSTER reports all " +
      "clustered tables; legacy `CLUSTER index ON table` reports the " +
      "table") {
    val r = analyze("CLUSTER users USING idx_users_email;")
    assert(r.findings.map(_.rule) == Seq("cluster"))
    assert(r.maxSeverity == Severity.High)
    assert(r.findings.head.table == "users")
    assert(analyze("CLUSTER;").findings.head.table ==
      "<all clustered tables>")
    assert(analyze("CLUSTER VERBOSE users;").findings.head.table == "users")
    assert(analyze("CLUSTER idx_users_email ON users;")
      .findings.head.table == "users")
  }

  test("R14: REFRESH MATERIALIZED VIEW non-concurrent is HIGH " +
      "(blocks reads); CONCURRENTLY is safe; plain REFRESH-anything-" +
      "else stays unclassified") {
    val r = analyze("REFRESH MATERIALIZED VIEW app.user_stats;")
    assert(r.findings.map(_.rule) == Seq("refresh-matview-not-concurrent"))
    assert(r.maxSeverity == Severity.High)
    assert(r.findings.head.table == "app.user_stats")
    assert(analyze(
      "REFRESH MATERIALIZED VIEW CONCURRENTLY user_stats WITH DATA;")
      .maxSeverity == Severity.Safe)
  }

  test("R15: ADD PRIMARY KEY is HIGH (index build + NOT NULL scan " +
      "under ACCESS EXCLUSIVE); the USING INDEX attach form — the " +
      "rule's own recipe — is safe; unnamed table-constraint form " +
      "flags too") {
    val r = analyze(
      "ALTER TABLE users ADD CONSTRAINT users_pkey PRIMARY KEY (id);")
    assert(r.findings.map(_.rule) == Seq("add-primary-key"))
    assert(r.maxSeverity == Severity.High)
    assert(r.findings.head.table == "users")
    assert(analyze("ALTER TABLE users ADD PRIMARY KEY (id);")
      .findings.map(_.rule) == Seq("add-primary-key"))
    // the recipe's two halves: neither triggers add-primary-key. As a
    // SINGLE file the pair now (correctly) draws R24 — the CONCURRENTLY
    // build forces the whole file to autocommit, so the attach loses
    // atomicity; the real recipe is two migration files.
    val recipe = analyze(
      "CREATE UNIQUE INDEX CONCURRENTLY users_pkey_idx ON users (id);\n" +
        "ALTER TABLE users ADD CONSTRAINT users_pkey PRIMARY KEY " +
        "USING INDEX users_pkey_idx;")
    assert(recipe.findings.map(_.rule) ==
      Seq("mixed-concurrent-atomicity"), recipe.findings)
    assert(recipe.maxSeverity == Severity.Medium)
    // split into its own file, each half is finding-free
    assert(analyze("CREATE UNIQUE INDEX CONCURRENTLY users_pkey_idx " +
      "ON users (id);").maxSeverity == Severity.Safe)
    assert(analyze("ALTER TABLE users ADD CONSTRAINT users_pkey " +
      "PRIMARY KEY USING INDEX users_pkey_idx;")
      .maxSeverity == Severity.Safe)
  }

  test("R25-R27: column-type advisories — 32-bit keys, naive " +
      "timestamp, and blank-padded char flag LOW on both CREATE TABLE " +
      "and ADD COLUMN; bigserial/timestamptz/varchar/text are silent") {
    // the well-designed table from V001's class: no findings
    assert(analyze("CREATE TABLE ok (id bigserial PRIMARY KEY, " +
      "name text, created_at timestamptz, tag varchar(20));")
      .maxSeverity == Severity.Safe)
    // R25: id/_id with 32-bit types, both statement forms
    for (sql <- Seq(
        "CREATE TABLE t (id integer PRIMARY KEY);",
        "CREATE TABLE t (user_id serial);",
        "ALTER TABLE t ADD COLUMN account_id int;")) {
      val r = analyze(sql)
      assert(r.findings.map(_.rule) == Seq("prefer-bigint-key"), sql)
      assert(r.maxSeverity == Severity.Low)
    }
    // a non-key int column is NOT flagged
    assert(analyze("CREATE TABLE t (retries integer);")
      .maxSeverity == Severity.Safe)
    // R26: bare timestamp (incl. precision), trailing column options,
    // and the explicit `without time zone` spelling; timestamptz and
    // `timestamp with time zone` are silent
    for (sql <- Seq("CREATE TABLE t (at timestamp);",
        "CREATE TABLE t (at timestamp(3));",
        "ALTER TABLE t ADD COLUMN at timestamp;",
        "CREATE TABLE t (at timestamp NOT NULL);",
        "CREATE TABLE t (at timestamp without time zone);",
        "ALTER TABLE t ADD COLUMN at timestamp(6) without time zone " +
          "DEFAULT '2020-01-01';"))
      assert(analyze(sql).findings.map(_.rule) ==
        Seq("prefer-timestamptz"), sql)
    assert(analyze("CREATE TABLE t (at timestamp with time zone);")
      .maxSeverity == Severity.Safe)
    assert(analyze("ALTER TABLE t ADD COLUMN at timestamp with time zone;")
      .maxSeverity == Severity.Safe)
    // R27: char(n)/character(n); varchar and character varying silent
    for (sql <- Seq("CREATE TABLE t (code char(8));",
        "CREATE TABLE t (code character(8));"))
      assert(analyze(sql).findings.map(_.rule) ==
        Seq("ban-char-field"), sql)
    assert(analyze("CREATE TABLE t (code character varying(8));")
      .maxSeverity == Severity.Safe)
    // table-level constraints don't confuse the column parse
    val multi = analyze("CREATE TABLE t (id integer, code char(3), " +
      "PRIMARY KEY (id), CONSTRAINT c CHECK (id > 0));")
    assert(multi.findings.map(_.rule).sorted ==
      Seq("ban-char-field", "prefer-bigint-key"))
  }

  test("R10: DO block flags LOW opaque-procedural (reviewable, never " +
      "blocking) — DDL hidden in the body no longer passes as " +
      "silent-safe") {
    val r = analyze(
      "DO $$ BEGIN ALTER TABLE users DROP COLUMN email; END $$;")
    assert(r.findings.map(_.rule) == Seq("opaque-do-block"), r.findings)
    assert(r.maxSeverity == Severity.Low)
    assert(!r.hasHighOrCritical) // the gate trips at HIGH, not LOW
    // the tagged form ($tag$) and a DO mixed into a multi-statement
    // migration both classify
    val r2 = analyze("CREATE TABLE t (n INT);\n" +
      "DO $body$ BEGIN PERFORM 1; END $body$;")
    assert(r2.findings.map(f => (f.rule, f.stmtIndex)) ==
      Seq(("opaque-do-block", 1)), r2.findings)
  }

  test("R11: CREATE FUNCTION / PROCEDURE bodies flag LOW opaque-" +
      "routine-body — the other opaque container (DDL inside a " +
      "routine body no longer passes as silent-safe)") {
    val r = analyze(
      """CREATE OR REPLACE FUNCTION app.migrate_col() RETURNS void
        |LANGUAGE plpgsql AS $$
        |BEGIN
        |  ALTER TABLE users ALTER COLUMN id TYPE bigint;
        |END $$;""".stripMargin)
    assert(r.findings.map(_.rule) == Seq("opaque-routine-body"),
      r.findings)
    assert(r.findings.head.table == "app.migrate_col")
    assert(r.maxSeverity == Severity.Low)
    assert(!r.hasHighOrCritical)
    // PROCEDURE form, mixed into a migration; CREATE TABLE/INDEX
    // classification is untouched by the new branch
    val r2 = analyze("CREATE TABLE t (n INT);\n" +
      "CREATE PROCEDURE fixup() LANGUAGE sql AS $p$ SELECT 1 $p$;\n" +
      "CREATE INDEX CONCURRENTLY idx_t ON t (id);")
    assert(r2.findings.map(f => (f.rule, f.stmtIndex)) ==
      Seq(("opaque-routine-body", 1),
        ("mixed-concurrent-atomicity", 2)), r2.findings)
  }

  test("R3 recipe end-to-end: ADD CONSTRAINT ... NOT VALID then " +
      "VALIDATE CONSTRAINT — both halves finding-free (the safe " +
      "pattern R3's own suggestion prescribes)") {
    val r = analyze(
      "ALTER TABLE t ADD CONSTRAINT c CHECK (a > 0) NOT VALID;\n" +
        "ALTER TABLE t VALIDATE CONSTRAINT c;")
    assert(r.maxSeverity == Severity.Safe, r.findings)
    assert(r.findings.isEmpty, r.findings)
  }

  test("hasHighOrCritical gate") {
    assert(analyze("DROP TABLE t;").hasHighOrCritical)
    assert(!analyze("ALTER TABLE t RENAME TO u;").hasHighOrCritical)
    assert(!analyze("SELECT 1;").hasHighOrCritical)
  }
}
