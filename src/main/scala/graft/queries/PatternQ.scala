package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Event-sequence and join-edge patterns: funnel analysis (the canonical
  * product-analytics query over an event stream) and null-safe equality.
  */
object PatternQ {

  /** Three-stage funnel view→click→purchase, each step within 24h of the
    * previous step's first occurrence. Each stage = one filtered
    * aggregation joined to the previous stage's (tiny, per-user) result —
    * the fact table is scanned once per stage with the event_type filter
    * pushed down; stage outputs are one row per surviving user, so the
    * joins broadcast at any fact scale. */
  val gFunnel: Q = Q(
    "g_funnel",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      // Each stage frame is checkpointed: stage N feeds both its own
      // user count and stage N+1's build, so without materialization the
      // chain re-derives earlier stages per reference (6 events scans in
      // the round-7 executed plan; 3 — one pushed type-filter scan per
      // stage — after). Stage frames are one row per surviving user.
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        .localCheckpoint()
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") >= col("v_ts") &&
          col("ts") <= col("v_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        .localCheckpoint()
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") >= col("c_ts") &&
          col("ts") <= col("c_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val one = (df: org.apache.spark.sql.DataFrame, stage: Int, name: String) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).cast("long").as("stage"), lit(name).as("name"), col("n_users"))
      one(v, 1, "view").unionAll(one(c, 2, "click")).unionAll(one(p, 3, "purchase"))
        .orderBy("stage")
    },
    Some("""WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1),
           |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts FROM events e JOIN v ON e.user_id = v.user_id
           |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts AND e.ts <= v.v_ts + INTERVAL 24 HOURS GROUP BY 1),
           |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts FROM events e JOIN c ON e.user_id = c.user_id
           |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts AND e.ts <= c.c_ts + INTERVAL 24 HOURS GROUP BY 1)
           |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name, (SELECT COUNT(*) FROM v) AS n_users
           |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
           |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
           |ORDER BY stage""".stripMargin))

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    * match each other — the join form dedup-by-nullable-key needs.
    * Hash-joinable in Spark (EqualNullSafe is an equi-join key), so no
    * nested-loop fallback. */
  val jNullSafe: Q = Q(
    "j_null_safe",
    (spark, dir) => {
      val a = Tables(spark, dir, "nation")
        .select(col("n_nationkey"), nullif(col("n_nationkey") % 5, lit(4)).as("k"))
      val b = Tables(spark, dir, "region")
        .select(col("r_regionkey"), nullif(col("r_regionkey") % 5, lit(4)).as("k"))
      a.join(b, a("k") <=> b("k"))
        .select(col("n_nationkey"), col("r_regionkey"))
        .orderBy("n_nationkey", "r_regionkey")
    },
    Some("""WITH a AS (SELECT n_nationkey, nullif(n_nationkey % 5, 4) AS k FROM nation),
           |b AS (SELECT r_regionkey, nullif(r_regionkey % 5, 4) AS k FROM region)
           |SELECT a.n_nationkey, b.r_regionkey
           |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
           |ORDER BY n_nationkey, r_regionkey""".stripMargin))

  /** Gaps-and-islands: per-user activity STREAKS (runs of consecutive
    * active days). The classic two-window trick: island_id = day −
    * dense-rank-of-day (constant within a consecutive run), then one agg
    * per (user, island). Both windows partition by user_id — a single
    * user_id shuffle, then narrow; island count ≤ active days, so output
    * is linear. Surfaces each user's LONGEST streak. */
  val wIslands: Q = Q(
    "w_islands",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val days = Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val islands = days
        .withColumn("island", datediff(col("day"), lit("1995-01-01")) - dense_rank().over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("streak_days"),
          date_format(min(col("day")), "yyyy-MM-dd").as("streak_start"))
      val best = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("streak_days").desc, col("streak_start"))
      islands.withColumn("rn", row_number().over(best))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("streak_days"), col("streak_start"))
        .orderBy("user_id")
    },
    Some("""WITH days AS (
           |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           |i AS (
           |  SELECT user_id, day,
           |    datediff('day', DATE '1995-01-01', day)
           |      - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS island
           |  FROM days),
           |s AS (
           |  SELECT user_id, island, COUNT(*) AS streak_days,
           |    strftime(MIN(day), '%Y-%m-%d') AS streak_start
           |  FROM i GROUP BY 1, 2),
           |r AS (
           |  SELECT user_id, streak_days, streak_start,
           |    row_number() OVER (PARTITION BY user_id
           |      ORDER BY streak_days DESC, streak_start) AS rn
           |  FROM s)
           |SELECT user_id, streak_days, streak_start
           |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin))

  val all: Seq[Q] = Seq(gFunnel, jNullSafe, wIslands)
}
