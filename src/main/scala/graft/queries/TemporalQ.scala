package graft.queries

import graft._
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
  val xScd2: Q = Q(
    "x_scd2",
    (spark, dir) => {
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
        // island is the per-customer sequence number, so it makes the sort
        // total even when two islands share a valid_from date (seen at
        // sf0.001: custkey 123 has two islands starting 1995-02-16).
        .orderBy(col("o_custkey"), col("valid_from"), col("island"))
        .drop("island")
    },
    Some("""WITH seq AS (
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
           |  SELECT o_custkey, status, valid_from, island,
           |         LEAD(valid_from) OVER (PARTITION BY o_custkey
           |           ORDER BY valid_from, island) AS valid_to_raw,
           |         n_events
           |  FROM grp)
           |SELECT o_custkey, status,
           |       strftime(valid_from, '%Y-%m-%d') AS valid_from,
           |       strftime(COALESCE(valid_to_raw, DATE '9999-12-31'), '%Y-%m-%d') AS valid_to,
           |       CAST(CASE WHEN valid_to_raw IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           |       n_events
           |FROM fin ORDER BY o_custkey, valid_from, island""".stripMargin))

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
      val firstM = ev.groupBy(col("user_id")).agg(min(col("m")).as("cohort_m"))
      ev.join(firstM, Seq("user_id"))
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

  val all: Seq[Q] = Seq(xScd2, xRetentionCohort)
}
