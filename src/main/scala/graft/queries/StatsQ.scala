package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Statistical / conditional aggregates and time-series utilities.
  * Determinism discipline (Q.scala scaladoc): aggregate inputs are exact
  * integers; any float appears only in a fixed post-aggregation chain on
  * those integers, so Spark and DuckDB produce bit-identical doubles.
  */
object StatsQ {

  /** Variance/stddev from exact integer moments (n, Σx, Σx²) — the
    * numerically-honest formulation: the shuffle moves three longs per
    * group (tiny agg state at 100 TB), and the float math happens once per
    * group on exact inputs instead of once per row. */
  val aStats: Q = Q(
    "a_stats",
    (spark, dir) => {
      val c = cents(col("l_extendedprice"))
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(c).as("sum_cents"),
          sum(c * c).as("s2"))
        .select(
          col("l_returnflag"), col("n"), col("sum_cents"),
          round(col("s2") * lit(1.0) / col("n")
            - (col("sum_cents") * lit(1.0) / col("n")) * (col("sum_cents") * lit(1.0) / col("n")))
            .cast("long").as("var_cents2"))
        .orderBy("l_returnflag")
    },
    Some("""WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
           |   SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS s1,
           |   SUM(CAST(round(l_extendedprice*100) AS BIGINT)*CAST(round(l_extendedprice*100) AS BIGINT)) AS s2
           | FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, n, CAST(s1 AS BIGINT) AS sum_cents,
           |  CAST(round(s2*1.0/n - (s1*1.0/n)*(s1*1.0/n)) AS BIGINT) AS var_cents2
           |FROM s ORDER BY l_returnflag""".stripMargin))

  /** min_by/max_by (argmin/argmax). The ordering measure embeds the unique
    * orderkey as a tiebreaker — min_by/max_by on tied measures is
    * nondeterministic in BOTH engines, so a deterministic composite is the
    * only oracle-safe formulation. */
  val aMinmaxBy: Q = Q(
    "a_minmax_by",
    (spark, dir) => {
      val measure = cents(col("l_extendedprice")) * 100000 + col("l_orderkey")
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_orderkey"), measure).as("max_price_key"),
          min_by(col("l_orderkey"), measure).as("min_price_key"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  max_by(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*100000 + l_orderkey) AS max_price_key,
           |  min_by(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*100000 + l_orderkey) AS min_price_key
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin))

  /** Conditional aggregates: count_if / bool_and / bool_or. Booleans leave
    * the query as 0/1 longs — engines stringify booleans differently. */
  val aCondAgg: Q = Q(
    "a_cond_agg",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_quantity") > 25).as("n_big"),
          bool_and(col("l_quantity") > 0).cast("long").as("all_pos"),
          bool_or(col("l_discount") > lit(0.09)).cast("long").as("any_high_disc"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           |  CAST(bool_and(l_quantity > 0) AS BIGINT) AS all_pos,
           |  CAST(bool_or(l_discount > 0.09) AS BIGINT) AS any_high_disc
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin))

  /** Sorted collect: collect_list → sort_array → join. The ONLY
    * deterministic way to oracle-check a collection aggregate; unsorted
    * collect_list order is partitioning-dependent (worse at 1000
    * executors, where it is never stable). */
  val aCollect: Q = Q(
    "a_collect_sorted",
    (spark, dir) =>
      Tables(spark, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("names"))
        .orderBy("n_regionkey"),
    Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
           |FROM nation GROUP BY 1 ORDER BY n_regionkey""".stripMargin))

  /** percent_rank / cume_dist. Both engines compute (rank-1)/(n-1) and
    * rank/n as one double division on exact integers — bit-identical; the
    * micro-scaling makes the compare integral anyway. */
  val wPercentRank: Q = Q(
    "w_percent_rank",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"),
          round(percent_rank().over(w) * 1000000).cast("long").as("pr_micro"),
          round(cume_dist().over(w) * 1000000).cast("long").as("cd_micro"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro,
           |  CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro
           |FROM orders WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
           |ORDER BY o_orderkey""".stripMargin))

  /** Time-series gap-fill / resample: dense daily calendar from
    * sequence(min,max) ⟕ per-day counts, missing days as 0. The calendar
    * side is O(date span), independent of fact size — at 100 TB it is a
    * few thousand rows broadcast against the aggregated (already tiny)
    * per-day counts; the fact table is touched exactly once. */
  val tsGapfill: Q = Q(
    "ts_gapfill",
    (spark, dir) => {
      val days = Tables(spark, dir, "orders")
        .select(to_date(col("o_orderdate")).as("day"))
      val bounds = days.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val calendar = bounds
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      val counts = days.groupBy(col("day")).agg(count(lit(1)).as("n"))
      calendar.join(counts, Seq("day"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy("day_s")
    },
    Some("""WITH b AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS lo, MAX(CAST(o_orderdate AS DATE)) AS hi FROM orders),
           |d AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM b),
           |c AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n FROM orders GROUP BY 1)
           |SELECT strftime(d.day, '%Y-%m-%d') AS day_s, COALESCE(c.n, 0) AS n_orders
           |FROM d LEFT JOIN c ON d.day = c.day ORDER BY day_s""".stripMargin))

  val all: Seq[Q] = Seq(aStats, aMinmaxBy, aCondAgg, aCollect, wPercentRank, tsGapfill)
}
