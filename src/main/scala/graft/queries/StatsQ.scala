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
    * numerically-honest formulation: the shuffle moves three small values
    * per group (tiny agg state at 100 TB), and the float math happens once
    * per group on exact inputs instead of once per row.
    *
    * The squared-cents sum accumulates in DECIMAL, not long: cents² is
    * ~1.3e13 per row, so a per-flag Long sum overflows past ~7e5 rows per
    * group — the sf100 sweep caught exactly this (ANSI ARITHMETIC_OVERFLOW
    * at 60M rows). decimal(30,0) holds 1e30: headroom to ~1e16 rows.
    * DuckDB's SUM(BIGINT) already promotes to HUGEINT, so the oracle was
    * never at risk; both sides convert the same exact integer to the same
    * double in the fixed post-agg chain. */
  val aStats: Q = Q(
    "a_stats",
    (spark, dir) => {
      val c = cents(col("l_extendedprice"))
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(c).as("sum_cents"),
          sum((c * c).cast("decimal(20,0)")).as("s2"))
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
    * only oracle-safe formulation. The multiplier must exceed any
    * orderkey or the tiebreaker outranks the price: 1e7 covers sf1
    * (keys to 6M) and keeps max cents (~1e7) × 1e7 + key < 2^63. */
  val aMinmaxBy: Q = Q(
    "a_minmax_by",
    (spark, dir) => {
      val measure = cents(col("l_extendedprice")) * 10000000L + col("l_orderkey")
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          max_by(col("l_orderkey"), measure).as("max_price_key"),
          min_by(col("l_orderkey"), measure).as("min_price_key"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  max_by(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*10000000 + l_orderkey) AS max_price_key,
           |  min_by(l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT)*10000000 + l_orderkey) AS min_price_key
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
    * micro-scaling makes the compare integral anyway.
    *
    * The ordering key (o_totalprice, o_orderkey) is unique within a
    * status, so there are no window peers and both positions reduce to
    * the running row count — computed via a
    * [[graft.ops.DistributedPrefix]] price-range-blocked running count
    * instead of `Window.partitionBy(status)` (3 schema values: the plain
    * window caps at 3 tasks over an sf-proportional grain). */
  val wPercentRank: Q = Q(
    "w_percent_rank",
    (spark, dir) => {
      // NOT checkpointed: a 3-column pruned scan re-reads cheaper than a
      // 3.8M-row checkpoint materializes (measured 2x at 256x) — the
      // checkpoint discipline pays only when the re-derivation is
      // expensive (text tokenize), not for a columnar projection
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // one pass: per-status counts carry the price extrema, the global
      // bounds reduce the 3-row frame (no second scan of base)
      val sizes = base.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("__n"),
        min(col("o_totalprice")).as("__mn"), max(col("o_totalprice")).as("__mx"))
        .localCheckpoint()
      val bounds = sizes.agg(min(col("__mn")).as("blo"), max(col("__mx")).as("bhi"))
      graft.ops.DistributedPrefix.runningSum(
          base.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("o_totalprice"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("o_totalprice"), col("o_orderkey")),
          value = lit(1L),
          out = "rn",
          groupCols = Seq("o_orderstatus"))
        .join(broadcast(sizes), Seq("o_orderstatus"))
        .select(
          col("o_orderkey"),
          round(when(col("__n") === 1L, lit(0.0))
            .otherwise((col("rn") - 1L).cast("double") / (col("__n") - 1L).cast("double"))
            * 1000000).cast("long").as("pr_micro"),
          round(col("rn").cast("double") / col("__n").cast("double") * 1000000)
            .cast("long").as("cd_micro"))
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

  /** Pearson correlation from exact integer moments (n, Σx, Σy, Σxy,
    * Σx², Σy²): six longs of agg state per group. The final chain casts
    * each exact integer to double explicitly on BOTH sides — the raw
    * integer products (n·Σy²) would overflow int64, and both engines
    * round the same exact integer to the same double, so the fixed IEEE
    * chain stays bit-identical. */
  val aCorr: Q = Q(
    "a_corr",
    (spark, dir) => {
      val x = col("l_quantity").cast("long")
      val y = cents(col("l_extendedprice"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          // Σxy and Σy² accumulate in decimal: y is cents-scale (~1e7),
          // so Σy² in Long overflows past ~7e5 rows per group (caught by
          // the sf100 sweep) and Σxy past ~sf3000. DuckDB promotes
          // SUM(BIGINT) to HUGEINT on its own.
          sum((x * y).cast("decimal(20,0)")).as("sxy"),
          sum(x * x).as("sx2"),
          sum((y * y).cast("decimal(20,0)")).as("sy2"))
        .select(
          col("l_returnflag"), col("n"),
          round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
            / sqrt((d(col("n")) * d(col("sx2")) - d(col("sx")) * d(col("sx")))
              * (d(col("n")) * d(col("sy2")) - d(col("sy")) * d(col("sy"))))
            * 1000000).cast("long").as("corr_micro"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           |  SUM(CAST(l_quantity AS BIGINT)) AS sx,
           |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
           |  SUM(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy,
           |  SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sx2,
           |  SUM(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS sy2
           | FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, n,
           |  CAST(round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / sqrt((CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
           |         * (CAST(n AS DOUBLE)*CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
           |    * 1000000) AS BIGINT) AS corr_micro
           |FROM m ORDER BY l_returnflag""".stripMargin))

  /** lag(... IGNORE NULLS): last preceding purchase per user — the
    * "carry last relevant event forward" analytic. */
  val wLagIgnoreNulls: Q = Q(
    "w_lag_ignore_nulls",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(spark, dir, "events")
        .select(
          col("event_id"),
          lag(when(col("event_type") === "purchase", col("event_id")), 1, null, ignoreNulls = true)
            .over(w).as("prev_purchase"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id,
           |  lag(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
           |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_purchase
           |FROM events ORDER BY event_id""".stripMargin))

  /** Least-squares regression (slope/intercept) per group from the same
    * five-long moment state as a_corr; identical explicit-double chain
    * discipline. price_cents ≈ slope·quantity + intercept. */
  val aRegr: Q = Q(
    "a_regr",
    (spark, dir) => {
      val x = col("l_quantity").cast("long")
      val y = cents(col("l_extendedprice"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      val withM = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * y).as("sxy"), sum(x * x).as("sx2"))
      val slope = (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (d(col("n")) * d(col("sx2")) - d(col("sx")) * d(col("sx")))
      withM.select(
        col("l_returnflag"),
        round(slope * 1000).cast("long").as("slope_milli"),
        round((d(col("sy")) - slope * d(col("sx"))) / d(col("n"))).cast("long").as("icept_cents"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           |  SUM(CAST(l_quantity AS BIGINT)) AS sx,
           |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
           |  SUM(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy,
           |  SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sx2
           | FROM lineitem GROUP BY 1)
           |SELECT l_returnflag,
           |  CAST(round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * 1000) AS BIGINT) AS slope_milli,
           |  CAST(round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (CAST(n AS DOUBLE)*CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS BIGINT) AS icept_cents
           |FROM m ORDER BY l_returnflag""".stripMargin))

  /** Deterministic mode: count per value, then argmax with a min-value
    * tiebreak folded into the measure (native mode() tie behavior
    * differs between engines, so the derived form is the only
    * oracle-safe one). Two hash aggs, both partial+final. */
  val aMode: Q = Q(
    "a_mode",
    (spark, dir) => {
      val counts = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("l_returnflag"))
        .agg(
          max_by(col("qty"), col("cnt") * 1000 - col("qty")).as("mode_qty"),
          max(col("cnt")).as("mode_cnt"))
        .orderBy("l_returnflag")
    },
    Some("""WITH c AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS cnt
           |           FROM lineitem GROUP BY 1, 2)
           |SELECT l_returnflag,
           |  max_by(qty, cnt * 1000 - qty) AS mode_qty,
           |  CAST(MAX(cnt) AS BIGINT) AS mode_cnt
           |FROM c GROUP BY 1 ORDER BY l_returnflag""".stripMargin))

  /** Rolling 7-day revenue via a time-INTERVAL range frame (vs
    * w_frame_range's numeric range): pre-aggregate per day first, so the
    * window walks one row per day instead of one per order — at 100 TB
    * the frame state is bounded by the date span, not the fact size.
    * Interval frames need the SQL surface (the Scala rangeBetween API is
    * numeric-only), so this goes through spark.sql. */
  val wFrameInterval: Q = Q(
    "w_frame_interval",
    (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql(
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS day_cents FROM orders GROUP BY 1)
          |SELECT date_format(day, 'yyyy-MM-dd') AS day_s,
          |  CAST(SUM(day_cents) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling7_cents
          |FROM d ORDER BY day_s""".stripMargin)
    },
    Some("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
           |  SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS day_cents FROM orders GROUP BY 1)
           |SELECT strftime(day, '%Y-%m-%d') AS day_s,
           |  CAST(SUM(day_cents) OVER (ORDER BY day RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling7_cents
           |FROM d ORDER BY day_s""".stripMargin))

  /** Population/sample covariance from exact integer moments (the
    * [[aCorr]] discipline: never engine covar_* aggregates, whose
    * double co-moment merges are partition-order-dependent — the exact
    * sums are associative, the final double chain is fixed). */
  val aCovar: Q = Q(
    "a_covar",
    (spark, dir) => {
      val x = col("l_quantity").cast("long")
      val y = cents(col("l_extendedprice"))
      val d = (c: org.apache.spark.sql.Column) => c.cast("double")
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"))
        .select(
          col("l_returnflag"), col("n"),
          round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
            / (d(col("n")) * d(col("n"))) * 100).cast("long").as("covp_hcents"),
          round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
            / (d(col("n")) * (d(col("n")) - 1.0)) * 100).cast("long").as("covs_hcents"))
        .orderBy("l_returnflag")
    },
    Some("""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           |  SUM(CAST(l_quantity AS BIGINT)) AS sx,
           |  SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS sy,
           |  SUM(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice*100) AS BIGINT)) AS sxy
           | FROM lineitem GROUP BY 1)
           |SELECT l_returnflag, n,
           |  CAST(round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) * 100) AS BIGINT) AS covp_hcents,
           |  CAST(round((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
           |    / (CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)) * 100) AS BIGINT) AS covs_hcents
           |FROM m ORDER BY l_returnflag""".stripMargin))

  /** Bitwise aggregates (bit_and/bit_or/bit_xor) — the primitives under
    * distributed bitmap and flag-set rollups; exact integers, fully
    * associative, map-side partial. */
  val aBitAgg: Q = Q(
    "a_bit_agg",
    (spark, dir) =>
      Tables(spark, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          bit_and(col("user_id")).as("band"),
          bit_or(col("user_id")).as("bor"),
          bit_xor(col("user_id")).as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
           | CAST(bit_and(user_id) AS BIGINT) AS band,
           | CAST(bit_or(user_id) AS BIGINT) AS bor,
           | CAST(bit_xor(user_id) AS BIGINT) AS bxor,
           | COUNT(*) AS n
           |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin))

  /** Exact weighted median per group — the aggregate Spark has no
    * built-in for (percentile() weights repetitions, but a true weighted
    * quantile over a weight COLUMN needs the cumulative-weight crossing
    * point). Definition: smallest value v with 2·cumWeight(v) ≥
    * totalWeight. Formulation — the crossing-block search, a refinement
    * of [[graft.ops.DistributedPrefix]] that never materializes the full
    * prefix (the round-7 `weak`: `Window.partitionBy(flag)` ran the
    * whole 594k-value grain through 3 tasks; even the blocked prefix
    * would sort all of it):
    *  1. block values by fixed 65536-cent windows (`shiftright(v, 16)` —
    *     monotone by construction, no bounds pass needed; money domains
    *     don't widen with row count, so the block count stays a few
    *     hundred at any sf);
    *  2. per-(flag, block) weight sums via ONE map-side-combined agg —
    *     the shuffle payload is #flags × #blocks rows, not the grain;
    *  3. the single crossing block per flag — the first whose cumulative
    *     range spans total/2 (exactly one exists: offsets are
    *     non-decreasing and weights positive) — from one window pass
    *     over that block-grain frame. This window partitions by flag
    *     alone, but its grain is the BLOCK count (a few hundred rows per
    *     flag, constant in sf), not the value grain;
    *  4. re-scan ONLY the crossing block's rows (broadcast join against
    *     the ~#flags-row crossing set ≈ 1/#blocks of the fact), pre-agg
    *     them to distinct values, and run the cumsum window there. The
    *     window grain is ≤ 65536 rows BY CONSTRUCTION (distinct
    *     cent-values inside one block), a constant bound at any scale.
    * Raw-row-vs-distinct-value equivalence: weights are positive, so a
    * block/row crosses total/2 iff its full tie-group does — min(v) over
    * crossing rows is the same either way. Exact longs end to end; no
    * float quantile interpolation to diverge on. */
  val aWeightedMedian: Q = Q(
    "a_weighted_median",
    (spark, dir) => {
      val raw = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("wt"))
        .withColumn("__blk", shiftright(col("v"), 16))
      val wBlk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("flag")).orderBy(col("__blk"))
      val wFlag = org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))
      val crossing = raw.groupBy(col("flag"), col("__blk"))
        .agg(sum(col("wt")).as("bsum"))
        .withColumn("cum_b", sum(col("bsum")).over(wBlk))
        .withColumn("total", sum(col("bsum")).over(wFlag))
        .filter((col("cum_b") - col("bsum")) * 2 < col("total")
          && col("cum_b") * 2 >= col("total"))
        .select(col("flag"), col("__blk"),
          (col("cum_b") - col("bsum")).as("off"), col("total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("flag"), col("__blk")).orderBy(col("v"))
      raw.join(broadcast(crossing), Seq("flag", "__blk"))
        .repartition(col("flag"), col("__blk"))
        .groupBy(col("flag"), col("__blk"), col("off"), col("total"), col("v"))
        .agg(sum(col("wt")).as("wt"))
        .withColumn("cum", sum(col("wt")).over(w) + col("off"))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy(col("flag"))
        .agg(min(col("v")).as("median_price_cents"),
          min(col("total")).as("total_weight"))
        .orderBy(col("flag"))
    },
    Some("""WITH pv AS (
           |  SELECT l_returnflag AS flag,
           |         CAST(round(l_extendedprice*100) AS BIGINT) AS v,
           |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
           |  FROM lineitem GROUP BY 1, 2),
           |c AS (
           |  SELECT flag, v, wt,
           |         SUM(wt) OVER (PARTITION BY flag ORDER BY v) AS cum,
           |         SUM(wt) OVER (PARTITION BY flag) AS total
           |  FROM pv)
           |SELECT flag, MIN(v) AS median_price_cents,
           |       CAST(MIN(total) AS BIGINT) AS total_weight
           |FROM c WHERE cum * 2 >= total
           |GROUP BY flag ORDER BY flag""".stripMargin))

  /** Robust (median/MAD) outlier detection (round 10) — the z-score's
    * breakdown-resistant sibling: a (nation, month) revenue bucket is an
    * outlier when |x − median| > 3·MAD, the Hampel identifier. The whole
    * test is EXACT int64: with both medians doubled — med2 = 2·median(x)
    * and mad4 = 2·median(|2x − med2|) — an interpolated median of ints is
    * (a+b)/2, so its double is integral and casts exactly, and
    *   |x − med| > 3·MAD  ⟺  2·|2x − med2| > 3·mad4
    * clears every fraction. No float compare ever reaches the gate.
    *
    * Scale shape: the only full-data pass is the first hash aggregate to
    * the calendar-bounded (nation, month) grain; both medians run on that
    * bounded frame (25 nations × ~84 months at any sf), re-joined by
    * nation. The customer join partitions on custkey — no broadcast of a
    * growing side. */
  val aMadOutliers: Q = Q(
    "a_mad_outliers",
    (spark, dir) => {
      // native date_trunc key per row; yyyy-MM formatting only on the
      // bounded (nation, month) frame — the x_yoy_growth 100×-probe lesson
      val monthly = Tables(spark, dir, "orders")
        .join(Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          date_trunc("MONTH", col("o_orderdate")).as("m"))
        .agg(sum(cents(col("o_totalprice"))).as("mcents"))
        .withColumn("month", date_format(col("m"), "yyyy-MM"))
        .drop("m")
        .localCheckpoint() // bounded grain feeds median, dev and the final filter
      val med = monthly.groupBy(col("nation"))
        .agg((median(col("mcents")) * 2).cast("long").as("med2"))
      val dev = monthly.join(med, Seq("nation"))
        .withColumn("dev2", abs(col("mcents") * 2 - col("med2")))
      val mad = dev.groupBy(col("nation"))
        .agg((median(col("dev2")) * 2).cast("long").as("mad4"))
      dev.join(mad, Seq("nation"))
        .filter(col("dev2") * 2 > col("mad4") * 3)
        .select(col("nation").cast("long").as("nation"), col("month"),
          col("mcents"), col("med2"), col("dev2"), col("mad4"))
        .orderBy(col("nation"), col("month"))
    },
    Some("""WITH monthly AS (
           |  SELECT c_nationkey AS nation,
           |         strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           |         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mcents
           |  FROM orders JOIN customer ON o_custkey = c_custkey
           |  GROUP BY 1, 2),
           |med AS (
           |  SELECT nation, CAST(2 * median(mcents) AS BIGINT) AS med2
           |  FROM monthly GROUP BY 1),
           |dev AS (
           |  SELECT monthly.*, med.med2, abs(2 * mcents - med2) AS dev2
           |  FROM monthly JOIN med USING (nation)),
           |mad AS (
           |  SELECT nation, CAST(2 * median(dev2) AS BIGINT) AS mad4
           |  FROM dev GROUP BY 1)
           |SELECT CAST(nation AS BIGINT) AS nation, month, mcents, med2,
           |       CAST(dev2 AS BIGINT) AS dev2, mad4
           |FROM dev JOIN mad USING (nation)
           |WHERE 2 * dev2 > 3 * mad4
           |ORDER BY nation, month""".stripMargin))

  /** Winsorized aggregate (round 10) — the trimmed-robust-mean sibling of
    * [[aMadOutliers]]: per return flag, daily revenue clamped at the
    * exact 10th/90th-percentile ORDER STATISTICS (v[⌈n/10⌉], v[⌈9n/10⌉],
    * row_number semantics with (value, day) tie-break — no interpolation,
    * so every bound is an actual observed int64 and the clamped sum is
    * exact). Output per flag: raw vs winsorized totals and the bounds —
    * the "how much did the tails move the mean" audit.
    *
    * Scale shape: the only full-data pass is the daily hash aggregate;
    * the rank windows run on the calendar-bounded (flag, day) frame
    * (~2.5k rows per flag at ANY sf), so the per-flag sort never grows
    * with data — the a_weighted_median crossing-block machinery is not
    * needed at this grain. */
  val aWinsorized: Q = Q(
    "a_winsorized",
    (spark, dir) => {
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("flag")).orderBy(col("day_cents"), col("day"))
      val wFlag = org.apache.spark.sql.expressions.Window.partitionBy(col("flag"))
      val daily = Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"),
          date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(cents(col("l_extendedprice"))).as("day_cents"))
        .withColumn("rn", row_number().over(wRank))
        .withColumn("n", count(lit(1)).over(wFlag))
        // the bounded daily frame feeds BOTH the bounds aggregate and the
        // final clamp join — materialize once or Catalyst inlines the
        // lineitem scan + aggregate into each reference
        .localCheckpoint()
      val bounds = daily
        .groupBy(col("flag"))
        .agg(
          min(when(col("rn") === expr("(n + 9) div 10"), col("day_cents")))
            .as("lo_cents"),
          min(when(col("rn") === expr("(9 * n + 9) div 10"), col("day_cents")))
            .as("hi_cents"))
      daily.join(broadcast(bounds), Seq("flag"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("day_cents")).as("raw_cents"),
          sum(greatest(least(col("day_cents"), col("hi_cents")), col("lo_cents")))
            .as("winsor_cents"),
          min(col("lo_cents")).as("lo_cents"),
          min(col("hi_cents")).as("hi_cents"))
        .orderBy(col("flag"))
    },
    Some("""WITH daily AS (
           |  SELECT l_returnflag AS flag, date_trunc('day', l_shipdate) AS day,
           |    CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |  FROM lineitem GROUP BY 1, 2),
           |r AS (
           |  SELECT flag, day, day_cents,
           |         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY day_cents, day) AS rn,
           |         COUNT(*) OVER (PARTITION BY flag) AS n
           |  FROM daily),
           |b AS (
           |  SELECT flag,
           |         MIN(CASE WHEN rn = (n + 9) // 10 THEN day_cents END) AS lo_cents,
           |         MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN day_cents END) AS hi_cents
           |  FROM r GROUP BY 1)
           |SELECT r.flag, COUNT(*) AS n_days,
           |  CAST(SUM(day_cents) AS BIGINT) AS raw_cents,
           |  CAST(SUM(greatest(least(day_cents, hi_cents), lo_cents)) AS BIGINT) AS winsor_cents,
           |  MIN(lo_cents) AS lo_cents, MIN(hi_cents) AS hi_cents
           |FROM r JOIN b ON r.flag = b.flag
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Chi-square test of independence between two categoricals (order
    * priority × order status) on a parts-per-million share grid: all
    * three marginal frames are bounded (5 × 3 cells), the only
    * data-sized stage is one contingency hash agg, and every later step
    * is integer math on ppm shares — obs_ppm = n·10⁶ div N, exp_ppm =
    * row_ppm·col_ppm div 10⁶, term = (obs−exp)² div max(exp, 1). The
    * ppm grid is what keeps the statistic int64-exact at ANY corpus
    * size: raw-count chi-square squares n·N terms and overflows past
    * ~sf30, while shares are bounded by 10⁶ regardless of N (the same
    * move the exact-integer discipline makes everywhere else). The
    * truncation chain is part of the statistic's definition and is
    * identical on both engines, so the drift table is hash-exact. */
  val aChi2: Q = Q(
    "a_chi2",
    (spark, dir) => {
      val cells = Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
      cells
        .withColumn("row_n", sum(col("n")).over(w.partitionBy(col("priority"))))
        .withColumn("col_n", sum(col("n")).over(w.partitionBy(col("status"))))
        .withColumn("tot", sum(col("n")).over(w.partitionBy()))
        .select(col("priority"), col("status"), col("n"),
          expr("n * 1000000 div tot").as("obs_ppm"),
          expr("(row_n * 1000000 div tot) * (col_n * 1000000 div tot) div 1000000")
            .as("exp_ppm"))
        .withColumn("chi2_term",
          expr("(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div greatest(exp_ppm, 1L)"))
        .orderBy(col("priority"), col("status"))
    },
    Some("""WITH cells AS (
           |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
           |         COUNT(*) AS n
           |  FROM orders GROUP BY 1, 2),
           |m AS (
           |  SELECT priority, status, n,
           |         SUM(n) OVER (PARTITION BY priority) AS row_n,
           |         SUM(n) OVER (PARTITION BY status) AS col_n,
           |         SUM(n) OVER () AS tot
           |  FROM cells),
           |g AS (
           |  SELECT priority, status, n,
           |         n * 1000000 // tot AS obs_ppm,
           |         (row_n * 1000000 // tot) * (col_n * 1000000 // tot) // 1000000
           |           AS exp_ppm
           |  FROM m)
           |SELECT priority, status, n,
           |       CAST(obs_ppm AS BIGINT) AS obs_ppm,
           |       CAST(exp_ppm AS BIGINT) AS exp_ppm,
           |       CAST((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
           |            // greatest(exp_ppm, 1) AS BIGINT) AS chi2_term
           |FROM g ORDER BY priority, status""".stripMargin))

  /** Two-sample Kolmogorov–Smirnov statistic (returned vs regular lines'
    * quantity distributions) in EXACT integers: over the bounded
    * 50-value quantity domain, D·n_r·n_n = max |cum_r·n_n − cum_n·n_r|
    * — cross-multiplying the two empirical CDFs instead of dividing
    * them is what removes the float entirely. Reported as the exact
    * numerator plus truncating ppm (divide-last: d_num div
    * (n_r·n_n div 10⁶), which is the overflow-safe order — d_num·10⁶
    * would leave int64 past ~sf50).
    *
    * Plan: one conditional-count hash agg to the 50-row value grain is
    * the only data-sized stage; CDFs, totals and the max run on that
    * bounded frame (the partition-less windows see 50 rows, never the
    * fact table). The distribution-drift gate between two slices of a
    * corpus — [[aChi2]]'s continuous-ordinal sibling. */
  val aKsTest: Q = Q(
    "a_ks_test",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag").isin("R", "N"))
        .groupBy(col("l_quantity").cast("long").as("qty"))
        .agg(count(when(col("l_returnflag") === "R", 1)).as("n_r"),
          count(when(col("l_returnflag") === "N", 1)).as("n_n"))
      g.withColumn("cum_r", sum(col("n_r")).over(Window.orderBy(col("qty"))))
        .withColumn("cum_n", sum(col("n_n")).over(Window.orderBy(col("qty"))))
        .withColumn("tot_r", sum(col("n_r")).over(Window.partitionBy()))
        .withColumn("tot_n", sum(col("n_n")).over(Window.partitionBy()))
        .agg(max(col("tot_r")).as("n_r"), max(col("tot_n")).as("n_n"),
          max(abs(col("cum_r") * col("tot_n") - col("cum_n") * col("tot_r")))
            .as("d_num"))
        .select(col("n_r"), col("n_n"), col("d_num"),
          expr("d_num div greatest(n_r * n_n div 1000000, 1L)").as("d_ppm"))
    },
    Some("""WITH g AS (
           |  SELECT CAST(l_quantity AS BIGINT) AS qty,
           |         COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_r,
           |         COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_n
           |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
           |c AS (
           |  SELECT SUM(n_r) OVER (ORDER BY qty) AS cum_r,
           |         SUM(n_n) OVER (ORDER BY qty) AS cum_n,
           |         SUM(n_r) OVER () AS tot_r,
           |         SUM(n_n) OVER () AS tot_n
           |  FROM g),
           |m AS (
           |  SELECT CAST(MAX(tot_r) AS BIGINT) AS n_r,
           |         CAST(MAX(tot_n) AS BIGINT) AS n_n,
           |         CAST(MAX(abs(cum_r * tot_n - cum_n * tot_r)) AS BIGINT) AS d_num
           |  FROM c)
           |SELECT n_r, n_n, d_num,
           |       CAST(d_num // greatest(n_r * n_n // 1000000, 1) AS BIGINT) AS d_ppm
           |FROM m""".stripMargin))

  val all: Seq[Q] = Seq(aStats, aMinmaxBy, aCondAgg, aCollect, wPercentRank, tsGapfill,
    aCorr, wLagIgnoreNulls, aRegr, aMode, wFrameInterval, aCovar, aBitAgg,
    aWeightedMedian, aMadOutliers, aWinsorized, aChi2, aKsTest)
}
