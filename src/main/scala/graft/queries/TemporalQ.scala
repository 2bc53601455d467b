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

  val all: Seq[Q] = Seq(xScd2, jPitScd2, xRetentionCohort)
}
