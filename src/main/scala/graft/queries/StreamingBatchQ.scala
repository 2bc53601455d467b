package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Batch-mode versions of the streaming window operators, so the exact
  * same window semantics get a DuckDB oracle. The true streaming path
  * (readStream + watermark + state) lives in graft.streaming.StreamingOps
  * and is pinned by MemoryStream tests; Spark defines window()/
  * session_window() identically in both modes, so this IS the oracle for
  * the streaming semantics too.
  */
object StreamingBatchQ {

  private val tsSec = "yyyy-MM-dd HH:mm:ss"

  /** Shared DuckDB gaps-and-islands prologue for every 30-minute-gap
    * session oracle (g_window_session, st_session_replay,
    * st_timer_sessions, st_session_window_replay). The `>= INTERVAL '30
    * minutes'` break is load-bearing — it must match Spark's
    * session_window / session-fold merge boundary exactly — so the four
    * oracles compose on ONE copy instead of drifting apart. Yields CTEs
    * x (per-event break flags) and y (user_id, ts, sid). */
  private[graft] val sessionIslandsCte: String =
    """WITH x AS (SELECT user_id, ts, event_id,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |        OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (SELECT user_id, ts,
      |   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x)""".stripMargin

  val gTumble: Q = Q(
    "g_window_tumbling",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(window(col("ts").cast("timestamp"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
        .select(
          date_format(col("window.start"), tsSec).as("w_start"),
          col("event_type"), col("n_events"), col("value_cents"))
        .orderBy("w_start", "event_type"),
    Some("""SELECT strftime(time_bucket(INTERVAL '10 minutes', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS w_start,
           | event_type, COUNT(*) AS n_events,
           | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin))

  /** Sliding window 10min/5min: every event belongs to exactly two
    * windows; the oracle materializes both candidate starts. */
  val gSlide: Q = Q(
    "g_window_sliding",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(window(col("ts").cast("timestamp"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
        .select(
          date_format(col("window.start"), tsSec).as("w_start"),
          col("n_events"), col("value_cents"))
        .orderBy("w_start"),
    Some("""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, COUNT(*) AS n_events,
           | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM (SELECT value,
           |   unnest([time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)),
           |           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '5 minutes']) AS ws
           | FROM events) t
           |GROUP BY ws ORDER BY w_start""".stripMargin))

  /** Session windows (30 min gap) per user; oracle via the classic
    * gaps-and-islands formulation. New session iff gap >= 30 min —
    * matching Spark's exclusive session end (start + gap). */
  val gSession: Q = Q(
    "g_window_session",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(session_window(col("ts").cast("timestamp"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          date_format(col("session_window.start"), tsSec).as("w_start"),
          col("n_events"))
        .orderBy("user_id", "w_start"),
    Some(sessionIslandsCte + """
           |SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS w_start, COUNT(*) AS n_events
           |FROM y GROUP BY user_id, sid ORDER BY user_id, w_start""".stripMargin))

  /** Batch twin of the stream-stream time-bound join, calling the SAME
    * operator (`StreamingOps.timeBoundJoin` — withWatermark is a no-op on
    * batch frames), so the streaming join's pairing semantics get a
    * DuckDB oracle: each 'view' pairs with same-user 'click's within 30
    * minutes after it. */
  val gStreamJoinTwin: Q = Q(
    "g_stream_join_twin",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val joined = graft.streaming.StreamingOps.timeBoundJoin(
        e.filter(col("event_type") === "view"),
        e.filter(col("event_type") === "click"))
      joined.select(
        col("user_id"), col("l_id"), col("r_id"),
        date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_s"),
        date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_s"))
        .orderBy("user_id", "l_id", "r_id")
    },
    Some("""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           | strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_s,
           | strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_s
           |FROM events l JOIN events r
           |  ON l.user_id = r.user_id
           | AND l.event_type = 'view' AND r.event_type = 'click'
           | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTES
           |ORDER BY l.user_id, l_id, r_id""".stripMargin))

  /** Batch twin of the LEFT OUTER stream-stream time-bound join (round
    * 10), calling the SAME operator (`StreamingOps.leftOuterTimeBoundJoin`
    * — watermarks are no-ops on batch frames): every 'view' pairs with
    * same-user 'click's within 30 minutes after it, and views with no such
    * click survive with null click columns. In batch the outer semantics
    * are the familiar relational ones — the streaming-only wrinkle (outer
    * rows emitted at state eviction, not arrival) is pinned separately by
    * `StreamingOpsSpec`; this twin is what makes the JOIN RESULT itself
    * DuckDB-checkable. */
  val gStreamOuterTwin: Q = Q(
    "g_stream_outer_twin",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val joined = graft.streaming.StreamingOps.leftOuterTimeBoundJoin(
        e.filter(col("event_type") === "view"),
        e.filter(col("event_type") === "click"))
      joined.select(
        col("user_id"), col("l_id"), col("r_id"),
        date_format(col("l_ts"), "yyyy-MM-dd HH:mm:ss").as("l_ts_s"),
        date_format(col("r_ts"), "yyyy-MM-dd HH:mm:ss").as("r_ts_s"))
        .orderBy("user_id", "l_id", "r_id")
    },
    Some("""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
           | strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS l_ts_s,
           | strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS r_ts_s
           |FROM (SELECT * FROM events WHERE event_type = 'view') l
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
           |  ON l.user_id = r.user_id
           | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTES
           |ORDER BY l.user_id, l_id, r_id""".stripMargin))

  val all: Seq[Q] = Seq(gTumble, gSlide, gSession, gStreamJoinTwin, gStreamOuterTwin)
}
