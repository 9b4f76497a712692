package graft.queries

import org.apache.spark.sql.functions._
import Catalog._

/** Event-stream operators in their batch form: tumbling / sliding /
  * session windows and JSON extraction over `events`. The streaming
  * twins (readStream + watermark on the identical transforms) live in
  * [[graft.streaming.EventStreams]] and are exercised by the streaming
  * test suite — batch and stream share the window semantics, so the
  * DuckDB oracle on the batch form also validates the streaming logic.
  */
object EventOps {

  def queries: Seq[(String, Q)] = Seq(

    // ------------------------------------------------------------------
    // Tumbling 1-hour windows: window().start ≡ date_trunc('hour').
    // ------------------------------------------------------------------
    "e01_tumbling_hourly" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"),
            col("total_value"))
          .orderBy(col("ws"), col("event_type")),
      Some(s"""SELECT date_trunc('hour', ts) AS ws, event_type,
        count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev
        GROUP BY 1, 2
        ORDER BY ws, event_type"""),
      bench = true),

    // ------------------------------------------------------------------
    // Sliding windows (1 h long, every 30 min): each event lands in two
    // windows; the SQL twin materializes both memberships via UNION ALL.
    // ------------------------------------------------------------------
    "e02_sliding_windows" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("window.start").as("ws"), col("n"), col("total_value"))
          .orderBy(col("ws")),
      Some(s"""WITH both_windows AS (
          SELECT date_trunc('hour', ts) +
                 CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS ws, value FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev
          UNION ALL
          SELECT date_trunc('hour', ts) +
                 CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END - INTERVAL 30 MINUTE AS ws,
                 value FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev)
        SELECT ws, count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM both_windows
        GROUP BY ws
        ORDER BY ws""")),

    // ------------------------------------------------------------------
    // Session windows (30-minute gap) per user — Spark's session_window
    // vs the classic gaps-and-islands SQL.
    // ------------------------------------------------------------------
    "e03_sessions" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
          .select(col("user_id"),
            col("session_window.start").as("session_start"),
            col("n_events"), col("session_value"))
          .orderBy(col("user_id"), col("session_start")),
      Some(s"""WITH ordered AS (
          SELECT user_id, ts, value,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
                 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS new_session
          FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev),
        numbered AS (
          SELECT user_id, ts, value,
            sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM ordered)
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
          ${sqlDsum("value")} AS session_value
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start""")),

    // ------------------------------------------------------------------
    // JSON extraction from the props column + aggregation.
    // ------------------------------------------------------------------
    "e04_json_extract" -> Q(
      (s, d) =>
        t(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .groupBy(col("event_type"), pmod(col("k"), lit(10)).as("k_bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("k_bucket")),
      Some("""SELECT event_type,
        cast(json_extract_string(props, '$.k') as bigint) % 10 AS k_bucket,
        count(*) AS n
        FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev
        GROUP BY 1, 2
        ORDER BY event_type, k_bucket""")),

    // ------------------------------------------------------------------
    // As-of (point-in-time) join: each event matched to the same
    // customer's most recent order at-or-before the event — the
    // single-shuffle union+window implementation (AsOfJoin), verified
    // against DuckDB's native ASOF JOIN.
    // ------------------------------------------------------------------
    "e06_asof_join" -> Q(
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"))
        val ords = t(s, d, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("last_order"))
        graft.operators.AsOfJoin.leftAsOf(ev, ords,
          leftTs = "ts", rightTs = "o_orderdate",
          keyLeft = "user_id", keyRight = "o_custkey",
          payload = Seq("last_order"))
          .select(col("event_id"), col("user_id"), col("last_order"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, cast(ts as timestamp) AS ts
                          FROM events),
             ords AS (SELECT o_custkey, o_orderdate,
                        max(o_orderkey) AS last_order
                      FROM orders GROUP BY 1, 2)
        SELECT ev.event_id, ev.user_id, o.last_order
        FROM ev ASOF LEFT JOIN ords o
          ON ev.user_id = o.o_custkey AND ev.ts >= o.o_orderdate
        ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // Event dedup within a time window (batch twin of
    // dropDuplicatesWithinWatermark): first event per (user, type,
    // minute bucket).
    // ------------------------------------------------------------------
    "e05_dedup_window" -> Q(
      (s, d) =>
        t(s, d, "events")
          .groupBy(col("user_id"), col("event_type"),
            date_trunc("minute", col("ts")).as("minute"))
          .agg(min(col("event_id")).as("first_event_id"),
            count(lit(1)).as("n_in_bucket"))
          .orderBy(col("user_id"), col("event_type"), col("minute")),
      Some("""SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
        min(event_id) AS first_event_id, count(*) AS n_in_bucket
        FROM (SELECT event_id, cast(ts as timestamp) AS ts, user_id, event_type, value, props FROM events) ev
        GROUP BY 1, 2, 3
        ORDER BY user_id, event_type, minute""")))
}
