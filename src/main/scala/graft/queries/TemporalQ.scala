package graft.queries

import graft._
import graft.ops.ColumnOps.cents
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal modeling operators (round 6): SCD type-2 dimension-history
  * build and cohort retention — the two canonical "time as data" shapes
  * a warehouse serves (change tracking and longitudinal analysis).
  */
object TemporalQ {

  /** SCD type-2 build: a customer's order-status change stream →
    * validity intervals [valid_from, valid_to) with consecutive
    * identical states collapsed (true SCD2: a row per CHANGE, not per
    * event). Classic gaps-and-islands: change flags via lag, island ids
    * via running sum, one agg per island, then lead() closes each
    * interval with the next island's start — open intervals get the
    * sentinel high date and is_current=1. Both windows partition by the
    * dimension key, so the build scales horizontally (no global sort);
    * at 100 TB this exact plan is the nightly dimension rebuild, with
    * the per-key event counts bounded by change frequency. */
  /** The SCD2 interval frame shared by x_scd2 (which orders and emits
    * it) and j_pit_scd2 (which joins facts against it): one row per
    * (customer, status island) with string validity bounds. */
  private[queries] def scd2Frame(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val wSeq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    // island id tie-breaks valid_from: two status changes on the same
    // date are distinct islands and must close in sequence order
    val wIsl = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("island"))
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") <= 150)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderstatus").as("status"), to_date(col("o_orderdate")).as("d"))
      .withColumn("chg",
        when(lag(col("status"), 1).over(wSeq).isNull ||
          lag(col("status"), 1).over(wSeq) =!= col("status"), 1L).otherwise(0L))
      .withColumn("island", sum(col("chg")).over(wSeq))
      .groupBy(col("o_custkey"), col("island"), col("status"))
      .agg(min(col("d")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to_raw", lead(col("valid_from"), 1).over(wIsl))
      .select(col("o_custkey"), col("status"),
        date_format(col("valid_from"), "yyyy-MM-dd").as("valid_from"),
        date_format(coalesce(col("valid_to_raw"), lit("9999-12-31").cast("date")),
          "yyyy-MM-dd").as("valid_to"),
        when(col("valid_to_raw").isNull, 1L).otherwise(0L).as("is_current"),
        col("n_events"), col("island"))
  }

  /** The same chain as SQL CTEs (through `fin`), shared by both oracles. */
  private val scd2CoreSql: String =
    """seq AS (
      |  SELECT o_custkey, o_orderkey, o_orderstatus AS status,
      |         CAST(o_orderdate AS DATE) AS d,
      |         CASE WHEN LAG(o_orderstatus) OVER w IS NULL
      |                OR LAG(o_orderstatus) OVER w <> o_orderstatus
      |              THEN 1 ELSE 0 END AS chg
      |  FROM orders WHERE o_custkey <= 150
      |  WINDOW w AS (PARTITION BY o_custkey
      |    ORDER BY CAST(o_orderdate AS DATE), o_orderkey)),
      |isl AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY d, o_orderkey) AS island
      |  FROM seq),
      |grp AS (
      |  SELECT o_custkey, island, status, MIN(d) AS valid_from,
      |         COUNT(*) AS n_events
      |  FROM isl GROUP BY 1, 2, 3),
      |fin AS (
      |  SELECT o_custkey, status,
      |         strftime(valid_from, '%Y-%m-%d') AS valid_from,
      |         strftime(COALESCE(LEAD(valid_from) OVER (PARTITION BY o_custkey
      |             ORDER BY valid_from, island), DATE '9999-12-31'), '%Y-%m-%d') AS valid_to,
      |         CAST(CASE WHEN LEAD(valid_from) OVER (PARTITION BY o_custkey
      |             ORDER BY valid_from, island) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
      |         n_events, island
      |  FROM grp)""".stripMargin

  val xScd2: Q = Q(
    "x_scd2",
    (spark, dir) =>
      scd2Frame(spark, dir)
        // island is the per-customer sequence number, so it makes the sort
        // total even when two islands share a valid_from date (seen at
        // sf0.001: custkey 123 has two islands both starting 1995-02-16).
        .orderBy(col("o_custkey"), col("valid_from"), col("island"))
        .drop("island"),
    Some(s"""WITH $scd2CoreSql
            |SELECT o_custkey, status, valid_from, valid_to, is_current, n_events
            |FROM fin ORDER BY o_custkey, valid_from, island""".stripMargin))

  /** Point-in-time (PIT) join — the feature-store lookup over the SCD2
    * history: each fact row (an order at date d) joins the dimension row
    * whose validity interval contains d. The join is an EQUI-join on the
    * dimension key (custkey) with the interval containment as a cheap
    * post-join filter; per-key fan-out is bounded by that customer's
    * CHANGE count, never the fact count, so the plan is an ordinary
    * key-partitioned join at any scale — no range/nested-loop join, no
    * leakage of future state (d < valid_to enforces as-of semantics).
    * Zero-length islands (two changes on one date) match nothing, so an
    * order on a change date lands in exactly one interval. String yyyy-
    * MM-dd bounds compare identically to dates in both engines. */
  val jPitScd2: Q = Q(
    "j_pit_scd2",
    (spark, dir) => {
      val facts = Tables(spark, dir, "orders")
        .filter(col("o_custkey") <= 150)
        .select(col("o_custkey"),
          date_format(to_date(col("o_orderdate")), "yyyy-MM-dd").as("d"),
          graft.ops.ColumnOps.cents(col("o_totalprice")).as("price_cents"))
      facts.join(scd2Frame(spark, dir), Seq("o_custkey"))
        .filter(col("d") >= col("valid_from") && col("d") < col("valid_to"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price_cents")).as("sum_price_cents"))
        .orderBy(col("status"))
    },
    Some(s"""WITH $scd2CoreSql,
            |facts AS (
            |  SELECT o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
            |         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
            |  FROM orders WHERE o_custkey <= 150)
            |SELECT fin.status, COUNT(*) AS n_orders,
            |       CAST(SUM(facts.price_cents) AS BIGINT) AS sum_price_cents
            |FROM facts JOIN fin ON facts.o_custkey = fin.o_custkey
            |WHERE facts.d >= fin.valid_from AND facts.d < fin.valid_to
            |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Cohort retention: users grouped by first-activity month (cohort),
    * counted per months-elapsed — the longitudinal engagement matrix.
    * Months-elapsed is computed with integer year/month arithmetic
    * (12*Δyear + Δmonth), identical in both engines — never float date
    * diffs. Two hash aggs (first-seen per user, then cohort × offset);
    * the per-user grain is the only big shuffle and it is one row per
    * user — the shape that survives any event volume. */
  val xRetentionCohort: Q = Q(
    "x_retention_cohort",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), date_trunc("month", col("ts")).cast("date").as("m"))
      // cohort month via a user-partitioned window instead of a self-join
      // with a per-user aggregate: one events scan instead of two, and the
      // window partitions are bounded by per-user activity, not data size.
      ev.withColumn("cohort_m",
          min(col("m")).over(Window.partitionBy(col("user_id"))))
        .select(col("user_id"), col("cohort_m"),
          ((year(col("m")) - year(col("cohort_m"))) * 12 +
            (month(col("m")) - month(col("cohort_m")))).cast("long").as("months_since"))
        .distinct()
        .groupBy(col("cohort_m"), col("months_since"))
        .agg(count(lit(1)).as("active_users"))
        .select(date_format(col("cohort_m"), "yyyy-MM").as("cohort_month"),
          col("months_since"), col("active_users"))
        .orderBy(col("cohort_month"), col("months_since"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS m FROM events),
           |fm AS (
           |  SELECT user_id, MIN(m) AS cohort_m FROM ev GROUP BY 1),
           |act AS (
           |  SELECT DISTINCT ev.user_id, fm.cohort_m,
           |         (12 * (year(ev.m) - year(fm.cohort_m))
           |          + (month(ev.m) - month(fm.cohort_m))) AS months_since
           |  FROM ev JOIN fm ON ev.user_id = fm.user_id)
           |SELECT strftime(cohort_m, '%Y-%m') AS cohort_month,
           |       CAST(months_since AS BIGINT) AS months_since,
           |       COUNT(*) AS active_users
           |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Exponentially-weighted moving average of daily revenue (round 10),
    * exact fixed-point formulation: per return flag the Q16 EWMA
    * ewma_fp16 = Σ_{d=0..15} cents(day−d) · 2^(15−d) — dyadic weights as
    * INTEGER coefficients, so the whole smoothing is int64 arithmetic and
    * bit-identical across engines (a float α-recursion would be
    * order-dependent and unhashable). Calendar-day (RANGE) semantics:
    * a missing day contributes zero, it does not shift the window.
    *
    * Scale shape: no windowed weighted sum exists in SQL, and a window
    * partitioned by the 3-value flag would serialize the growing day
    * grain into 3 tasks. Instead each daily total EXPLODES into its ≤16
    * forward target days (bounded 16× fan-out of the bounded daily
    * grain) and one hash aggregate on (flag, target_day) re-assembles
    * every window — an equi-join-free, skew-free shape that parallelizes
    * over the full (flag, day) grain at any scale. The inner join back
    * to the daily frame keeps only days that exist in the series. */
  val wEwma: Q = Q(
    "w_ewma",
    (spark, dir) => {
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
        .localCheckpoint() // feeds both the contribution explode and the day filter
      val contrib = daily
        .withColumn("d", explode(sequence(lit(0), lit(15))))
        .select(col("l_returnflag").as("t_flag"),
          date_add(col("day"), col("d")).cast("timestamp").as("tday"),
          expr("day_cents * shiftleft(CAST(1 AS BIGINT), 15 - d)").as("w_cents"))
        .groupBy(col("t_flag"), col("tday"))
        .agg(sum(col("w_cents")).as("ewma_fp16"))
      daily.join(contrib,
          col("l_returnflag") === col("t_flag") && col("day") === col("tday"))
        .select(col("l_returnflag"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_cents"), col("ewma_fp16"))
        .orderBy(col("l_returnflag"), col("day"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT a.l_returnflag, strftime(a.day, '%Y-%m-%d') AS day, a.day_cents,
           |  CAST(SUM(b.day_cents * (CAST(1 AS BIGINT) << (15 - date_diff('day', b.day, a.day)))) AS BIGINT) AS ewma_fp16
           |FROM daily a JOIN daily b
           |  ON a.l_returnflag = b.l_returnflag
           | AND date_diff('day', b.day, a.day) BETWEEN 0 AND 15
           |GROUP BY a.l_returnflag, a.day, a.day_cents
           |ORDER BY a.l_returnflag, day""".stripMargin))

  /** Rolling 30-day OLS trend of daily revenue (round 10): per return
    * flag and day, the least-squares slope of (epoch_day, day_cents)
    * over the trailing 30 calendar days, emitted as the EXACT rational
    * slope_num = n·Σxy − Σx·Σy over slope_den = n·Σx² − (Σx)² — all
    * int64 (x is centered at epoch day 10000 to keep n·Σxy well inside
    * 2^63 through sf100), no float division to hash-diverge. den = 0
    * (single-day windows) stays meaningful: num is 0 there too.
    *
    * Scale shape: same explode-to-target-days pattern as [[wEwma]] — a
    * bounded 30× fan-out of the daily grain into one hash aggregate on
    * (flag, target_day), instead of a 3-task flag-partitioned window or
    * an O(days²) range self-join. Linear, skew-free, and the sums are
    * map-side combinable. */
  val wTrend: Q = Q(
    "w_trend",
    (spark, dir) => {
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
        .withColumn("x", (datediff(col("day"), lit("1970-01-01").cast("timestamp")) - 10000).cast("long"))
        .localCheckpoint()
      val sums = daily
        .withColumn("d", explode(sequence(lit(0), lit(29))))
        .select(col("l_returnflag").as("t_flag"),
          date_add(col("day"), col("d")).cast("timestamp").as("tday"),
          col("x"), col("day_cents"))
        .groupBy(col("t_flag"), col("tday"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"),
          sum(col("day_cents")).as("sy"),
          sum(col("x") * col("day_cents")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
      daily.join(sums,
          col("l_returnflag") === col("t_flag") && col("day") === col("tday"))
        .select(col("l_returnflag"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_days"),
          (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
        .orderBy(col("l_returnflag"), col("day"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents,
           |    CAST(date_diff('day', TIMESTAMP '1970-01-01', date_trunc('day', l_shipdate)) - 10000 AS BIGINT) AS x
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT a.l_returnflag, strftime(a.day, '%Y-%m-%d') AS day,
           |  CAST(COUNT(*) AS BIGINT) AS n_days,
           |  CAST(COUNT(*) * SUM(b.x * b.day_cents) - SUM(b.x) * SUM(b.day_cents) AS BIGINT) AS slope_num,
           |  CAST(COUNT(*) * SUM(b.x * b.x) - SUM(b.x) * SUM(b.x) AS BIGINT) AS slope_den
           |FROM daily a JOIN daily b
           |  ON a.l_returnflag = b.l_returnflag
           | AND date_diff('day', b.day, a.day) BETWEEN 0 AND 29
           |GROUP BY a.l_returnflag, a.day
           |ORDER BY a.l_returnflag, day""".stripMargin))

  /** Time-series anomaly flags (round 10): a day is anomalous when its
    * revenue deviates from its own trailing-30-day baseline by more than
    * 3σ — with the whole test in EXACT integer arithmetic: with n, S, Q
    * the count/sum/sum-of-squares of the trailing window (ENDING
    * YESTERDAY — the day under test never contaminates its baseline),
    *   (x − μ)² > 9σ²  ⟺  (n·x − S)² > 9·(n·Q − S²),
    * the n²-scaled form that eliminates both divisions. Revenue is
    * bucketed to exact 1000-dollar units (cents DIV 100000) so the
    * squares stay inside int64 through sf100. Baselines with n < 10
    * days are skipped (cold start).
    *
    * Scale shape: same bounded 30× explode-to-target-day aggregate as
    * [[wTrend]] — no window, no self-join on a range predicate; the
    * anomaly filter is a map-side predicate over the joined daily frame. */
  val tsAnomaly: Q = Q(
    "ts_anomaly",
    (spark, dir) => {
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
        .withColumn("xk", expr("day_cents DIV 100000"))
        .localCheckpoint()
      val sums = daily
        .withColumn("d", explode(sequence(lit(1), lit(30)))) // 1..30: window ends yesterday
        .select(col("l_returnflag").as("t_flag"),
          date_add(col("day"), col("d")).cast("timestamp").as("tday"),
          col("xk"))
        .groupBy(col("t_flag"), col("tday"))
        .agg(count(lit(1)).as("n_base"),
          sum(col("xk")).as("sk"),
          sum(col("xk") * col("xk")).as("skk"))
      daily.join(sums,
          col("l_returnflag") === col("t_flag") && col("day") === col("tday"))
        .filter(col("n_base") >= 10)
        .withColumn("dev2", (col("n_base") * col("xk") - col("sk")) *
          (col("n_base") * col("xk") - col("sk")))
        .withColumn("thr", lit(9L) * (col("n_base") * col("skk") - col("sk") * col("sk")))
        .filter(col("dev2") > col("thr"))
        .select(col("l_returnflag"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_cents"), col("n_base"), col("dev2"), col("thr"))
        .orderBy(col("l_returnflag"), col("day"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM lineitem GROUP BY 1, 2),
           |d2 AS (SELECT l_returnflag, day, day_cents, day_cents // 100000 AS xk FROM daily)
           |SELECT a.l_returnflag, strftime(a.day, '%Y-%m-%d') AS day, a.day_cents,
           |  CAST(COUNT(*) AS BIGINT) AS n_base,
           |  CAST((COUNT(*) * a.xk - SUM(b.xk)) * (COUNT(*) * a.xk - SUM(b.xk)) AS BIGINT) AS dev2,
           |  CAST(9 * (COUNT(*) * SUM(b.xk * b.xk) - SUM(b.xk) * SUM(b.xk)) AS BIGINT) AS thr
           |FROM d2 a JOIN d2 b
           |  ON a.l_returnflag = b.l_returnflag
           | AND date_diff('day', b.day, a.day) BETWEEN 1 AND 30
           |GROUP BY a.l_returnflag, a.day, a.day_cents, a.xk
           |HAVING COUNT(*) >= 10
           |   AND (COUNT(*) * a.xk - SUM(b.xk)) * (COUNT(*) * a.xk - SUM(b.xk))
           |       > 9 * (COUNT(*) * SUM(b.xk * b.xk) - SUM(b.xk) * SUM(b.xk))
           |ORDER BY a.l_returnflag, day""".stripMargin))

  /** OHLC downsampling (round 10): the classic time-series resample —
    * daily revenue re-bucketed to monthly bars with open (first day's
    * value), high, low, close (last day's value) per return flag. Open/
    * close are order-statistics-by-time, computed as `min_by`/`max_by`
    * over the day column (DuckDB `arg_min`/`arg_max`) — no window, no
    * sort; days are unique within a (flag, month) bar so the selectors
    * are total. All values are exact cents.
    *
    * Scale shape: two hash aggregates over the calendar-bounded daily
    * grain (the lineitem scan is the only big input and it combines
    * map-side). The same plan resamples any bar width at any data size —
    * resolution changes the group key only. */
  val tsOhlc: Q = Q(
    "ts_ohlc",
    (spark, dir) => {
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
      daily
        .groupBy(col("l_returnflag"),
          date_format(date_trunc("MONTH", col("day")), "yyyy-MM").as("month"))
        .agg(
          min_by(col("day_cents"), col("day")).as("open_cents"),
          max(col("day_cents")).as("high_cents"),
          min(col("day_cents")).as("low_cents"),
          max_by(col("day_cents"), col("day")).as("close_cents"),
          count(lit(1)).as("n_days"))
        .orderBy(col("l_returnflag"), col("month"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM lineitem GROUP BY 1, 2)
           |SELECT l_returnflag, strftime(date_trunc('month', day), '%Y-%m') AS month,
           |  arg_min(day_cents, day) AS open_cents,
           |  MAX(day_cents) AS high_cents,
           |  MIN(day_cents) AS low_cents,
           |  arg_max(day_cents, day) AS close_cents,
           |  COUNT(*) AS n_days
           |FROM daily GROUP BY 1, 2
           |ORDER BY l_returnflag, month""".stripMargin))

  /** Funnel timing (round 10): per signup-day cohort, the distribution of
    * the signup→first-purchase lag — n converted users, min/max lag and
    * the exact doubled median (2·median of ints is integral, the
    * [[StatsQ.aMadOutliers]] trick). Lags are computed on exact epoch
    * MICROseconds (unix_micros ↔ epoch_us) then floored to whole minutes:
    * minutes keep the metric meaningful AND bound the median aggregate's
    * per-group state by the calendar span (≈43k distinct values for a
    * 30-day window) instead of the user count — the reason this exact
    * median stays cheap at any event volume. Only purchases at-or-after
    * the signup count; a user's first signup wins.
    *
    * Scale shape: two per-user hash aggregates (min signup, min
    * qualifying purchase) partitioned on user_id, then a hash aggregate
    * to the calendar-bounded cohort grain. No window touches a growing
    * partition. */
  val xConversionLag: Q = Q(
    "x_conversion_lag",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("sts"))
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .join(signup, Seq("user_id"))
        .filter(col("ts") >= col("sts"))
        .groupBy(col("user_id"), col("sts"))
        .agg(min(col("ts")).as("pts"))
      firstPurchase
        .withColumn("lag_min",
          expr("(unix_micros(pts) - unix_micros(sts)) div 60000000"))
        // native day key per user row; the string cohort label is minted
        // on the calendar-bounded cohort frame
        .groupBy(date_trunc("DAY", col("sts")).as("d"))
        .agg(count(lit(1)).as("n_converted"),
          min(col("lag_min")).as("min_lag_min"),
          max(col("lag_min")).as("max_lag_min"),
          (median(col("lag_min")) * 2).cast("long").as("med_lag_min_x2"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("cohort_day"),
          col("n_converted"), col("min_lag_min"), col("max_lag_min"),
          col("med_lag_min_x2"))
        .orderBy(col("cohort_day"))
    },
    Some("""WITH s AS (
           |  SELECT user_id, MIN(ts) AS sts FROM events
           |  WHERE event_type = 'signup' GROUP BY 1),
           |p AS (
           |  SELECT e.user_id, s.sts, MIN(e.ts) AS pts
           |  FROM events e JOIN s ON e.user_id = s.user_id
           |  WHERE e.event_type = 'purchase' AND e.ts >= s.sts
           |  GROUP BY 1, 2),
           |lag AS (
           |  SELECT strftime(sts, '%Y-%m-%d') AS cohort_day,
           |         (epoch_us(pts) - epoch_us(sts)) // 60000000 AS lag_min
           |  FROM p)
           |SELECT cohort_day, COUNT(*) AS n_converted,
           |  CAST(MIN(lag_min) AS BIGINT) AS min_lag_min,
           |  CAST(MAX(lag_min) AS BIGINT) AS max_lag_min,
           |  CAST(2 * median(lag_min) AS BIGINT) AS med_lag_min_x2
           |FROM lag GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Period-over-period growth (round 10): monthly revenue per return
    * flag with month-over-month and year-over-year deltas in exact basis
    * points (integer division of cents — the only way a growth table
    * hash-matches across engines). Months with no comparable prior
    * period emit NULL growth, not zero. lag(1)/lag(12) run on the
    * calendar-bounded monthly frame (~84 rows per flag at ANY sf), so
    * the windows never see a growing partition.
    *
    * Scale shape: one map-side-combinable hash aggregate to the monthly
    * grain is the only full-data pass. */
  val xYoyGrowth: Q = Q(
    "x_yoy_growth",
    (spark, dir) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("m"))
      // group on the NATIVE truncated timestamp and format yyyy-MM only on
      // the bounded monthly frame: per-row date_format in the groupBy key
      // cost 9x at the 100x probe (60M string formats vs 60M date_truncs)
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("MONTH", col("l_shipdate")).as("m"))
        .agg(sum(cents(col("l_extendedprice"))).as("mcents"))
        .withColumn("prev_m", lag(col("mcents"), 1).over(w))
        .withColumn("prev_y", lag(col("mcents"), 12).over(w))
        .select(col("l_returnflag"), date_format(col("m"), "yyyy-MM").as("month"),
          col("mcents"),
          expr("(mcents - prev_m) * 10000 div prev_m").as("mom_bp"),
          expr("(mcents - prev_y) * 10000 div prev_y").as("yoy_bp"))
        .orderBy(col("l_returnflag"), col("month"))
    },
    Some("""WITH m AS (
           |  SELECT l_returnflag, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS mcents
           |  FROM lineitem GROUP BY 1, 2),
           |l AS (
           |  SELECT l_returnflag, month, mcents,
           |         LAG(mcents, 1) OVER w AS prev_m,
           |         LAG(mcents, 12) OVER w AS prev_y
           |  FROM m WINDOW w AS (PARTITION BY l_returnflag ORDER BY month))
           |SELECT l_returnflag, month, mcents,
           |  CAST((mcents - prev_m) * 10000 // prev_m AS BIGINT) AS mom_bp,
           |  CAST((mcents - prev_y) * 10000 // prev_y AS BIGINT) AS yoy_bp
           |FROM l ORDER BY l_returnflag, month""".stripMargin))

  /** CUSUM change-point detection (round 10): flag the days where the
    * cumulative upward drift of daily revenue exceeds five mean-days —
    * the classical S_t = max(0, S_{t−1} + y_t) control chart. The
    * recursion LOOKS inherently sequential, but it has the exact closed
    * form S_t = P_t − min_{0≤k≤t} P_k (P = prefix sum of the centered
    * series), so two plain windows — running sum then running min —
    * compute it distributed. Everything is int64: the centered term is
    * scaled by 20n (y = 20n·xk − 21·tot encodes xk − mean − 5%·mean with
    * zero fractions), revenue is bucketed to 1000-dollar units first
    * (the ts_anomaly trick) so prefix sums stay far inside the domain,
    * and the alarm threshold 100·tot is five mean-days in the same
    * units.
    *
    * Scale shape: the only full-data pass is the daily hash aggregate;
    * both windows and the per-flag totals run on the calendar-bounded
    * daily frame. At a grain that grows with data the prefix would move
    * to [[graft.ops.DistributedPrefix]] blocks — same closed form. */
  val tsCusum: Q = Q(
    "ts_cusum",
    (spark, dir) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("day"))
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
        .withColumn("xk", expr("day_cents DIV 100000"))
        // bounded daily frame feeds BOTH the totals and the chart join —
        // materialize once or the lineitem scan + aggregate inline twice
        .localCheckpoint()
      val tot = daily.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("xk")).as("tot"))
      daily.join(broadcast(tot), Seq("l_returnflag"))
        .withColumn("yv", lit(20L) * col("n") * col("xk") - lit(21L) * col("tot"))
        .withColumn("pv", sum(col("yv")).over(w))
        .withColumn("cusum", col("pv") - least(min(col("pv")).over(w), lit(0L)))
        .filter(col("cusum") > lit(100L) * col("tot"))
        .select(col("l_returnflag"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("day_cents"), col("cusum"), (lit(100L) * col("tot")).as("thresh"))
        .orderBy(col("l_returnflag"), col("day"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM lineitem GROUP BY 1, 2),
           |d2 AS (SELECT l_returnflag, day, day_cents, day_cents // 100000 AS xk FROM daily),
           |t AS (SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(xk) AS BIGINT) AS tot
           |      FROM d2 GROUP BY 1),
           |y AS (SELECT d2.l_returnflag, day, day_cents, tot,
           |        20 * n * xk - 21 * tot AS yv
           |      FROM d2 JOIN t USING (l_returnflag)),
           |p AS (SELECT *, SUM(yv) OVER w AS pv FROM y
           |      WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)),
           |s AS (SELECT l_returnflag, day, day_cents, tot,
           |        pv - LEAST(MIN(pv) OVER (PARTITION BY l_returnflag ORDER BY day), 0) AS cusum
           |      FROM p)
           |SELECT l_returnflag, strftime(day, '%Y-%m-%d') AS day, day_cents,
           |  CAST(cusum AS BIGINT) AS cusum,
           |  CAST(100 * tot AS BIGINT) AS thresh
           |FROM s WHERE cusum > 100 * tot
           |ORDER BY l_returnflag, day""".stripMargin))

  /** Cohort lifetime-value curves — [[xRetentionCohort]]'s value twin:
    * per (acquisition-cohort day, days since acquisition) the period
    * revenue, the running cumulative revenue, and cumulative LTV per
    * acquired user — the longitudinal unit-economics table every growth
    * model reads. Daily grain because the events fixture spans one
    * month with near-universal day-1 adoption (weekly/monthly cohorts
    * degenerate to one row); on a multi-year feed swap day→month, same
    * plan. All money is exact cents; LTV is integer division, so the
    * curve is hash-exact.
    *
    * Plan: one events scan with a user-partitioned min window (cohort
    * day without a self-join, same move as retention), one hash agg to
    * the calendar-bounded (cohort, age) grid, cohort sizes as a second
    * bounded agg joined back, and the cumulative window runs over the
    * bounded grid — never raw events. */
  val xCohortLtv: Q = Q(
    "x_cohort_ltv",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"),
          cents(col("value")).as("rev"))
        .withColumn("cohort_d",
          min(col("d")).over(Window.partitionBy(col("user_id"))))
        .withColumn("days_since",
          datediff(col("d"), col("cohort_d")).cast("long"))
      // Single scan subtree (ScanAudit): the cohort SIZE needs no second
      // pass — every user is active at age 0 by construction (day 0 IS
      // their first day), so distinct-users-at-age-0 equals the cohort
      // size, and a first_value window over the bounded grid propagates
      // it to every age row.
      val grid = ev.groupBy(col("cohort_d"), col("days_since"))
        .agg(sum(col("rev")).as("rev_cents"),
          countDistinct(col("user_id")).as("age_users"))
      val wC = Window.partitionBy(col("cohort_d")).orderBy(col("days_since"))
      grid
        .withColumn("cohort_users", first(col("age_users")).over(wC))
        .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wC))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
          col("days_since"), col("rev_cents"), col("cum_rev_cents"),
          col("cohort_users"),
          // FLOOR division, exact in integers: Spark `div` truncates toward
          // zero while the DuckDB oracle's `//` floors, which diverges for
          // negative cumulative revenue (refund-heavy cohorts). pmod >= 0
          // makes the numerator exactly divisible, so `div` is exact here
          // and equals floor for any sign of cum_rev_cents.
          expr("(cum_rev_cents - pmod(cum_rev_cents, cohort_users)) div cohort_users")
            .as("ltv_cents"))
        .orderBy(col("cohort_day"), col("days_since"))
    },
    Some("""WITH ev AS (
           |  SELECT user_id, CAST(ts AS DATE) AS d,
           |         CAST(round(value*100) AS BIGINT) AS rev
           |  FROM events),
           |fm AS (SELECT user_id, MIN(d) AS cohort_d FROM ev GROUP BY 1),
           |j AS (
           |  SELECT ev.user_id, fm.cohort_d, ev.rev,
           |         (ev.d - fm.cohort_d) AS days_since
           |  FROM ev JOIN fm ON ev.user_id = fm.user_id),
           |grid AS (
           |  SELECT cohort_d, days_since, SUM(rev) AS rev_cents,
           |         COUNT(DISTINCT user_id) AS age_users
           |  FROM j GROUP BY 1, 2),
           |c AS (
           |  SELECT cohort_d, days_since, rev_cents,
           |         SUM(rev_cents) OVER (PARTITION BY cohort_d
           |           ORDER BY days_since) AS cum_rev_cents,
           |         FIRST_VALUE(age_users) OVER (PARTITION BY cohort_d
           |           ORDER BY days_since) AS cohort_users
           |  FROM grid)
           |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_day,
           |       CAST(days_since AS BIGINT) AS days_since,
           |       CAST(rev_cents AS BIGINT) AS rev_cents,
           |       CAST(cum_rev_cents AS BIGINT) AS cum_rev_cents,
           |       cohort_users,
           |       CAST(cum_rev_cents // cohort_users AS BIGINT) AS ltv_cents
           |FROM c ORDER BY cohort_day, days_since""".stripMargin))

  /** Day-of-week seasonality profile per event type — the weekly-rhythm
    * baseline behind anomaly thresholds and traffic forecasts. ISO day
    * numbering (Monday=1) because it is the one convention both engines
    * express exactly (Spark `weekday()+1`, DuckDB `isodow`); shares in
    * truncating basis points of the type's total, so the profile is
    * hash-exact. One scan into a (5 types × 7 days)-bounded hash agg;
    * the share window runs over the bounded grid. */
  val tsSeasonality: Q = Q(
    "ts_seasonality",
    (spark, dir) => {
      Tables(spark, dir, "events")
        .select(col("event_type"), (weekday(col("ts")) + 1).cast("long").as("iso_dow"))
        .groupBy(col("event_type"), col("iso_dow"))
        .agg(count(lit(1)).as("n"))
        .withColumn("type_total", sum(col("n")).over(
          Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("iso_dow"), col("n"),
          expr("n * 10000 div type_total").as("share_bp"))
        .orderBy(col("event_type"), col("iso_dow"))
    },
    Some("""WITH g AS (
           |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
           |         COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |t AS (
           |  SELECT event_type, iso_dow, n,
           |         SUM(n) OVER (PARTITION BY event_type) AS type_total
           |  FROM g)
           |SELECT event_type, iso_dow, n,
           |       CAST(n * 10000 // type_total AS BIGINT) AS share_bp
           |FROM t ORDER BY event_type, iso_dow""".stripMargin))

  val all: Seq[Q] = Seq(xScd2, jPitScd2, xRetentionCohort, wEwma, wTrend, tsAnomaly, tsOhlc,
    xConversionLag, xYoyGrowth, tsCusum, xCohortLtv, tsSeasonality)
}
