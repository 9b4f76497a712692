package graft

import graft.exec.{JdbcLock, JdbcRunner}
import graft.model.LockNotAcquired
import org.scalatest.funsuite.AnyFunSuite

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException}
import scala.collection.mutable.ArrayBuffer

/** PG-dialect contract tests for the JDBC passthrough surfaces.
  *
  * The `pg_try_advisory_lock` / `SET lock_timeout` SQL in
  * JdbcLock/JdbcRunner is PostgreSQL-only (the reference's target,
  * `internal/database/advisory_lock.go:12-65`) and was previously
  * exercised only against embedded Derby — which never takes the PG
  * branch, so the PG-only strings could drift silently. No PG server
  * exists in this sandbox, so the wire is RECORDED instead: a
  * spec-local JDBC driver (`jdbc:graftmock:`) hands out proxy
  * connections that report a configurable product name and append
  * every statement to a log. The specs pin the exact SQL strings the
  * PG path must emit (byte-for-byte, matching the reference's
  * advisory-lock calls and timeout envelope) and the fallback matrix:
  * a non-PG product must see NO pg_* SQL and take the portable
  * lock-table / setQueryTimeout path instead.
  */
object MockJdbc {
  final class Recorder(val product: String,
      var advisoryGranted: Boolean = true,
      var insertBlocks: Boolean = false) {
    val log = ArrayBuffer[String]()
    var closed = false
    var autoCommit = true
  }

  /** One registry for live recorders, keyed by the mock URL's suffix. */
  val recorders = scala.collection.concurrent.TrieMap[String, Recorder]()

  private def rs(rec: Recorder, rows: Int, bool: Boolean): AnyRef = {
    var left = rows
    proxy(classOf[java.sql.ResultSet]) { (m, _) =>
      m.getName match {
        case "next" => if (left > 0) { left -= 1; java.lang.Boolean.TRUE }
          else java.lang.Boolean.FALSE
        case "getBoolean" => java.lang.Boolean.valueOf(bool)
        case "close" | "clearWarnings" => null
        case "wasNull" => java.lang.Boolean.FALSE
        case _ => defaultFor(m)
      }
    }
  }

  private def statement(rec: Recorder): AnyRef =
    proxy(classOf[java.sql.Statement]) { (m, args) =>
      m.getName match {
        case "executeQuery" =>
          val sql = args(0).asInstanceOf[String]
          rec.log += s"Q:$sql"
          rs(rec, 1, rec.advisoryGranted)
        case "execute" =>
          rec.log += s"X:${args(0)}"
          java.lang.Boolean.FALSE
        case "setQueryTimeout" =>
          rec.log += s"T:${args(0)}"
          null
        case "close" => null
        case _ => defaultFor(m)
      }
    }

  private def prepared(rec: Recorder, sql: String): AnyRef =
    proxy(classOf[java.sql.PreparedStatement]) { (m, args) =>
      m.getName match {
        case "setQueryTimeout" => rec.log += s"T:${args(0)}"; null
        case "setLong" => rec.log += s"P:${args(1)}"; null
        case "executeUpdate" =>
          rec.log += s"U:$sql"
          if (rec.insertBlocks)
            throw new SQLException("lock wait timeout", "40XL1")
          java.lang.Integer.valueOf(1)
        case "close" => null
        case _ => defaultFor(m)
      }
    }

  private def metadata(rec: Recorder): AnyRef =
    proxy(classOf[java.sql.DatabaseMetaData]) { (m, _) =>
      m.getName match {
        case "getDatabaseProductName" => rec.product
        case "getTables" => rs(rec, 0, bool = false)
        case _ => defaultFor(m)
      }
    }

  def connection(rec: Recorder): Connection =
    proxy(classOf[Connection]) { (m, args) =>
      m.getName match {
        case "createStatement" => statement(rec)
        case "prepareStatement" =>
          prepared(rec, args(0).asInstanceOf[String])
        case "getMetaData" => metadata(rec)
        case "setAutoCommit" =>
          rec.autoCommit = args(0).asInstanceOf[Boolean]
          rec.log += s"AC:${rec.autoCommit}"
          null
        case "getAutoCommit" => java.lang.Boolean.valueOf(rec.autoCommit)
        case "commit" => rec.log += "COMMIT"; null
        case "rollback" => rec.log += "ROLLBACK"; null
        case "close" => rec.closed = true; rec.log += "CLOSE"; null
        case "isClosed" => java.lang.Boolean.valueOf(rec.closed)
        case "getCatalog" | "getSchema" => null
        case _ => defaultFor(m)
      }
    }.asInstanceOf[Connection]

  private def defaultFor(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => java.lang.Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case _ => null
  }

  private def proxy(iface: Class[_])(
      f: (Method, Array[AnyRef]) => AnyRef): AnyRef =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "toString" => s"mock-${iface.getSimpleName}"
            case "hashCode" => java.lang.Integer
              .valueOf(System.identityHashCode(p))
            case "equals" => java.lang.Boolean.valueOf(p eq args(0))
            case _ => f(m, args)
          }
      })

  /** The recording driver; registered once, answers jdbc:graftmock:<key>. */
  object MockDriver extends java.sql.Driver {
    def connect(url: String,
        info: java.util.Properties): Connection =
      if (!acceptsURL(url)) null
      else connection(recorders(url.stripPrefix("jdbc:graftmock:")))
    def acceptsURL(url: String): Boolean =
      url != null && url.startsWith("jdbc:graftmock:")
    def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    def getMajorVersion = 1
    def getMinorVersion = 0
    def jdbcCompliant() = false
    def getParentLogger: java.util.logging.Logger =
      throw new java.sql.SQLFeatureNotSupportedException()
  }
  java.sql.DriverManager.registerDriver(MockDriver)

  def withRecorder[A](key: String, rec: Recorder)(
      body: String => A): A = {
    recorders(key) = rec
    try body(s"jdbc:graftmock:$key") finally recorders.remove(key)
  }
}

class PgContractSpec extends AnyFunSuite {
  import MockJdbc._

  test("JdbcLock on PostgreSQL: acquire/release emit EXACTLY the " +
      "reference's session advisory-lock SQL (advisory_lock.go:12-65) " +
      "and nothing else") {
    val rec = new Recorder("PostgreSQL")
    withRecorder("pg-lock", rec) { url =>
      val lock = new JdbcLock(url)
      lock.acquire()
      lock.release()
    }
    assert(rec.log.toSeq == Seq(
      "Q:SELECT pg_try_advisory_lock(123456789)",
      "X:SELECT pg_advisory_unlock(123456789)",
      "CLOSE"), rec.log)
  }

  test("JdbcLock on PostgreSQL: a false advisory grant maps to " +
      "LockNotAcquired and the connection is closed — no lock-table " +
      "fallback SQL leaks onto a PG wire") {
    val rec = new Recorder("PostgreSQL", advisoryGranted = false)
    withRecorder("pg-lock-refused", rec) { url =>
      intercept[LockNotAcquired.type] { new JdbcLock(url).acquire() }
    }
    assert(rec.log.toSeq == Seq(
      "Q:SELECT pg_try_advisory_lock(123456789)", "CLOSE"), rec.log)
    assert(rec.closed)
  }

  test("JdbcLock on a non-PG product: NO pg_* SQL; the portable " +
      "lock-table path runs (CREATE, open-txn INSERT with bounded " +
      "wait, rollback-on-release) — the fallback matrix's other row") {
    val rec = new Recorder("MockDB")
    withRecorder("generic-lock", rec) { url =>
      val lock = new JdbcLock(url, lockTimeoutMs = 5000)
      lock.acquire()
      lock.release()
    }
    assert(!rec.log.exists(_.contains("pg_")), rec.log)
    assert(rec.log.toSeq == Seq(
      "X:CREATE TABLE graft_migration_lock (id BIGINT PRIMARY KEY)",
      "AC:false",
      "T:5", // ceil(5000 ms) = 5 s portable bound on the lock wait
      "P:123456789",
      "U:INSERT INTO graft_migration_lock (id) VALUES (?)",
      "ROLLBACK", // release = drop the uncommitted row
      "CLOSE"), rec.log)
  }

  test("JdbcLock on a non-PG product: a blocked INSERT maps to " +
      "LockNotAcquired with rollback + close") {
    val rec = new Recorder("MockDB", insertBlocks = true)
    withRecorder("generic-lock-blocked", rec) { url =>
      intercept[LockNotAcquired.type] {
        new JdbcLock(url, lockTimeoutMs = 1000).acquire()
      }
    }
    assert(rec.log.takeRight(2).toSeq == Seq("ROLLBACK", "CLOSE"),
      rec.log)
  }

  test("JdbcRunner on PostgreSQL: the transactional envelope emits " +
      "EXACTLY the reference's timeout SETs before the migration SQL, " +
      "then commits (apply.go's lock/statement timeout contract)") {
    val rec = new Recorder("PostgreSQL")
    withRecorder("pg-run", rec) { url =>
      new JdbcRunner(url, lockTimeoutMs = 5000,
        statementTimeoutMs = 30000)
        .run("ALTER TABLE users ADD COLUMN a INT", transactional = true)
    }
    assert(rec.log.toSeq == Seq(
      "AC:false",
      "X:SET lock_timeout = '5000ms'",
      "X:SET statement_timeout = '30000ms'",
      "X:ALTER TABLE users ADD COLUMN a INT",
      "COMMIT",
      "CLOSE"), rec.log)
  }

  test("JdbcRunner on PostgreSQL: non-transactional (CONCURRENTLY) " +
      "path runs in autocommit with NO timeout SETs and NO commit") {
    val rec = new Recorder("PostgreSQL")
    withRecorder("pg-run-conc", rec) { url =>
      new JdbcRunner(url, 5000, 30000)
        .run("CREATE INDEX CONCURRENTLY i ON t (a)",
          transactional = false)
    }
    assert(rec.log.toSeq == Seq(
      "AC:true",
      "X:CREATE INDEX CONCURRENTLY i ON t (a)",
      "CLOSE"), rec.log)
  }

  test("JdbcRunner semicolon contract: PG receives the migration body " +
      "VERBATIM (simple-query protocol takes semicolons); a non-PG " +
      "dialect gets exactly one trailing semicolon stripped") {
    val pg = new Recorder("PostgreSQL")
    withRecorder("pg-semi", pg) { url =>
      new JdbcRunner(url, 5000, 30000)
        .run("CREATE TABLE t (id INT);", transactional = false)
    }
    assert(pg.log.contains("X:CREATE TABLE t (id INT);"), pg.log)
    val other = new Recorder("MockDB")
    withRecorder("generic-semi", other) { url =>
      new JdbcRunner(url, 5000, 30000)
        .run("CREATE TABLE t (id INT);\n", transactional = false)
    }
    assert(other.log.contains("X:CREATE TABLE t (id INT)"), other.log)
    assert(!other.log.exists(_.endsWith(";")), other.log)
  }

  test("JdbcRunner on a non-PG product: timeout rides the portable " +
      "setQueryTimeout (whole seconds, ceil), never PG SET syntax") {
    val rec = new Recorder("MockDB")
    withRecorder("generic-run", rec) { url =>
      new JdbcRunner(url, 5000, statementTimeoutMs = 30500)
        .run("CREATE TABLE t (id INT)", transactional = true)
    }
    assert(!rec.log.exists(_.contains("SET ")), rec.log)
    assert(rec.log.toSeq == Seq(
      "AC:false",
      "T:31", // ceil(30500 ms) = 31 s
      "X:CREATE TABLE t (id INT)",
      "COMMIT",
      "CLOSE"), rec.log)
  }
}
