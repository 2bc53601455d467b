package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.2): projection, filters,
  * the join family, aggregation family, window functions, sort/top-k and
  * set operations. Each query is written plan-first: broadcast hints on
  * dimension sides, predicates that push into the parquet scan, exact
  * integer aggregation states (see ColumnOps).
  */
object RelationalQ {

  // ---------------------------------------------------------------- project
  val qProject: Q = Q(
    "q_project",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        cents(col("l_extendedprice")).as("price_cents"),
        (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("disc_price_e4"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flags"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey,
           | CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
           | CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS disc_price_e4,
           | l_returnflag || '/' || l_linestatus AS flags
           |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin))

  // ---------------------------------------------------------------- filter
  val qFilter: Q = Q(
    "q_filter",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.filter(
        col("l_shipdate").between(lit("1997-01-01 00:00:00"), lit("1998-12-31 00:00:00")) &&
          col("l_quantity").cast("long").isin(10L, 20L, 30L, 40L, 50L) &&
          col("l_returnflag").isin("A", "R") &&
          col("l_discount").isNotNull && pct(col("l_discount")) > 5)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          pct(col("l_discount")).as("disc_pct"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
           | CAST(round(l_discount*100) AS BIGINT) AS disc_pct
           |FROM lineitem
           |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
           |  AND CAST(l_quantity AS BIGINT) IN (10,20,30,40,50)
           |  AND l_returnflag IN ('A','R')
           |  AND l_discount IS NOT NULL AND CAST(round(l_discount*100) AS BIGINT) > 5
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  // ----------------------------------------------------------------- joins
  /** Star-schema rollup with explicitly broadcast dimensions: at 100 TB the
    * fact side streams; nation/region ride to every executor once. */
  val jBroadcast: Q = Q(
    "j_broadcast",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, COUNT(*) AS n_customers,
           | CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin))

  /** Fact-fact equi-join: both sides shuffle on the key; AQE picks
    * SMJ/SHJ and handles skew at scale. */
  val jShuffle: Q = Q(
    "j_shuffle",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      // merge hint: at bench scale AQE would broadcast orders and this
      // query would stop exercising the shuffle-join path it exists for;
      // at 100 TB both sides are huge and sort-merge IS the real plan.
      val o = Tables(spark, dir, "orders").hint("merge")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(cents(col("l_extendedprice"))).as("revenue_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  val jLeft: Q = Q(
    "j_left_outer",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
      val hi = Tables(spark, dir, "lineitem").filter(pct(col("l_discount")) >= 8)
      o.join(hi, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderkey"))
        .agg(
          count(col("l_orderkey")).as("n_hi_disc"),
          coalesce(sum(cents(col("l_extendedprice"))), lit(0L)).as("hi_disc_cents"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, COUNT(l_orderkey) AS n_hi_disc,
           | COALESCE(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT), 0) AS hi_disc_cents
           |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE CAST(round(l_discount*100) AS BIGINT) >= 8) h
           | ON o_orderkey = l_orderkey
           |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin))

  val jFull: Q = Q(
    "j_full_outer",
    (spark, dir) => {
      val cn = Tables(spark, dir, "customer")
        .groupBy(col("c_nationkey").as("nationkey")).agg(count(lit(1)).as("n_cust"))
      val sn = Tables(spark, dir, "supplier")
        .groupBy(col("s_nationkey").as("nationkey")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, Seq("nationkey"), "full")
        .select(
          col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
           | sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
           |SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           | COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
           |FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
           |ORDER BY nationkey""".stripMargin))

  val jSemi: Q = Q(
    "j_semi",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders").filter(cents(col("o_totalprice")) > 15000000L)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           |              AND CAST(round(o_totalprice*100) AS BIGINT) > 15000000)
           |ORDER BY c_custkey""".stripMargin))

  val jAnti: Q = Q(
    "j_anti",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val o = Tables(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
           |ORDER BY c_custkey""".stripMargin))

  /** Interval (theta) join: tiny literal range table broadcast against the
    * event stream — the generalized form of the reference's range filter.
    * BNLJ over a broadcast side is the right physical plan: the big side
    * is never shuffled. */
  val jRange: Q = Q(
    "j_range",
    (spark, dir) => {
      val spark2 = spark; import spark2.implicits._
      val e = Tables(spark, dir, "events")
      val ranges = Seq(
        (1L, "2024-01-02 00:00:00", "2024-01-05 00:00:00"),
        (2L, "2024-01-04 00:00:00", "2024-01-11 00:00:00"),
        (3L, "2024-01-20 06:00:00", "2024-01-21 18:00:00"))
        .toDF("range_id", "lo", "hi")
      e.join(
        broadcast(ranges),
        col("ts").cast("timestamp").between(
          col("lo").cast("timestamp"), col("hi").cast("timestamp")))
        .groupBy(col("range_id"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("value_cents"))
        .orderBy("range_id")
    },
    Some("""WITH ranges(range_id, lo, hi) AS (VALUES
           | (1, TIMESTAMP '2024-01-02 00:00:00', TIMESTAMP '2024-01-05 00:00:00'),
           | (2, TIMESTAMP '2024-01-04 00:00:00', TIMESTAMP '2024-01-11 00:00:00'),
           | (3, TIMESTAMP '2024-01-20 06:00:00', TIMESTAMP '2024-01-21 18:00:00'))
           |SELECT range_id, COUNT(*) AS n_events,
           | CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM events JOIN ranges ON ts BETWEEN lo AND hi
           |GROUP BY range_id ORDER BY range_id""".stripMargin))

  /** As-of join expressed as a running window instead of an inequality
    * join: O(n log n) with no pair explosion — the formulation that still
    * works when one user has millions of events. For each purchase, the
    * latest signup of the same user at-or-before it (ties by event_id). */
  val jAsof: Q = Q(
    "j_asof",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn(
        "signup_event_id",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("signup_event_id"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, signup_event_id FROM (
           | SELECT event_id, user_id, event_type,
           |  last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
           |   OVER (PARTITION BY user_id ORDER BY ts, event_id
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_event_id
           | FROM events) t
           |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin))

  val jCross: Q = Q(
    "j_cross",
    (spark, dir) => {
      val r = Tables(spark, dir, "region")
      val n = Tables(spark, dir, "nation")
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"))
        .orderBy("r_name", "n_name")
    },
    Some("SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"))

  // ------------------------------------------------------------ aggregates
  /** TPC-H Q1-shaped pricing summary; all sums in exact integer space,
    * averages derived as one double division from exact integers
    * (bit-identical across engines). */
  val aAgg: Q = Q(
    "a_agg",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1999-09-01 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("sum_disc_e4"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))
            * (lit(100L) + pct(col("l_tax")))).as("sum_charge_e6"),
          count(lit(1)).as("cnt"))
        .withColumn("avg_qty", col("sum_qty").cast("double") / col("cnt").cast("double"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
           | COUNT(*) AS cnt,
           | CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
           |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val aDistinct: Q = Q(
    "a_distinct",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  val aCountDistinct: Q = Q(
    "a_count_distinct",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_parts"),
          countDistinct(col("l_suppkey")).as("nd_supps"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
           | COUNT(DISTINCT l_suppkey) AS nd_supps, COUNT(*) AS cnt
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** HLL sketch under the hard oracle gate via a deterministic BAND
    * check: the estimate itself is implementation-specific (no SQL twin
    * can reproduce it), so the query emits the EXACT distinct count
    * (cross-engine verified against DuckDB's COUNT(DISTINCT)) plus a 0/1
    * `within_band` flag asserting |estimate − exact| ≤ 5% · exact — the
    * published HLL bound (rsd = 0.02, so 5% = 2.5σ; observed ≤ 1.6% at
    * sf0.001–sf100). The oracle emits the literal 1, so an estimate
    * drifting outside the band hash-fails the round. The estimate is a
    * deterministic function of the data, so the check is reproducible. */
  val aApproxDistinct: Q = Q(
    "a_approx_distinct",
    (spark, dir) =>
      // One dedup shuffle feeds BOTH sides of the band check: HLL is
      // multiplicity-insensitive, so the estimate over the distinct
      // (flag, partkey) grain is identical to the estimate over raw rows,
      // while the exact count becomes a plain count — no expand plan, no
      // mixed distinct/non-distinct aggregate (solo-probed at the 100×
      // decade: 72 s → single-shuffle shape).
      Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("est"),
          count(lit(1)).as("nd_parts"))
        .select(col("l_returnflag"), col("nd_parts"),
          // absolute floor of 1 like a_hll_merge's band(): a group with
          // < 20 distinct keys would otherwise have a sub-1 tolerance
          // and hash-fail on a single-unit estimate deviation
          when(abs(col("est") - col("nd_parts")) <=
            greatest(col("nd_parts") * 0.05, lit(1.0)), 1L)
            .otherwise(0L).as("within_band"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts,
           | CAST(1 AS BIGINT) AS within_band
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val aRollup: Q = Q(
    "a_rollup",
    (spark, dir) => {
      val c = Tables(spark, dir, "customer")
      val n = Tables(spark, dir, "nation")
      val r = Tables(spark, dir, "region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("bal_cents"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_cust"), col("bal_cents"))
        .orderBy("region", "nation")
    },
    Some("""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           | COUNT(*) AS n_cust, CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
           |FROM customer JOIN nation ON c_nationkey = n_nationkey
           | JOIN region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin))

  val aCube: Q = Q(
    "a_cube",
    (spark, dir) =>
      Tables(spark, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_cents"))
        .orderBy("status", "priority"),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
           | COUNT(*) AS n_orders, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY status, priority""".stripMargin))

  val aGroupingSets: Q = Q(
    "a_grouping_sets",
    (spark, dir) => {
      Tables(spark, dir, "lineitem").createOrReplaceTempView("graft_lineitem_gs")
      spark.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rflag, COALESCE(l_linestatus, 'ALL') AS lstatus,
          | COUNT(*) AS cnt, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
          |FROM graft_lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          |ORDER BY rflag, lstatus""".stripMargin)
    },
    Some("""SELECT COALESCE(l_returnflag, 'ALL') AS rflag, COALESCE(l_linestatus, 'ALL') AS lstatus,
           | COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
           |ORDER BY rflag, lstatus""".stripMargin))

  /** grouping()/grouping_id over ROLLUP with REAL nulls in the group key:
    * without grouping() a NULL data value is indistinguishable from a
    * subtotal row (the classic cube-reporting bug — NULLIF plants genuine
    * nulls to prove the disambiguation). Identical SQL both engines. */
  private val groupingIdSql =
    """SELECT CASE WHEN grouping(status2) = 1 THEN 'ALL'
      |            ELSE coalesce(status2, '(null)') END AS status,
      |  CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
      |       ELSE o_orderpriority END AS priority,
      |  CAST(grouping(status2) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
      |  COUNT(*) AS n
      |FROM (SELECT NULLIF(o_orderstatus, 'P') AS status2, o_orderpriority FROM orders) t
      |GROUP BY ROLLUP(status2, o_orderpriority)
      |ORDER BY gid, status, priority""".stripMargin

  val aGroupingId: Q = Q(
    "a_grouping_id",
    (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql(groupingIdSql)
    },
    Some(groupingIdSql))

  val aUdaf: Q = Q(
    "a_udaf_sumsq",
    (spark, dir) => {
      val sumsq = udaf(graft.ops.SumSqLong)
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sumsq(col("l_quantity").cast("long")).as("sumsq_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           | CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // --------------------------------------------------------------- windows
  val wRowNumber: Q = Q(
    "w_row_number",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(spark, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"))
        .orderBy("user_id", "rn")
    },
    Some("""SELECT user_id, rn, event_id FROM (
           | SELECT user_id, event_id,
           |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           | FROM events) t WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin))

  val wRankDense: Q = Q(
    "w_rank_dense",
    (spark, dir) => {
      // Order by a PRE-PROJECTED column, not a fresh cents() per
      // withColumn: identical orderSpec attributes let CollapseWindow
      // merge both rank functions into ONE Window node, which puts the
      // rnk<=5 filter directly above it and lets InferWindowGroupLimit
      // insert the map-side per-group top-k (two full window passes and
      // an unbounded shuffle otherwise — plan-audited).
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("__pc").desc, col("o_orderkey"))
      Tables(spark, dir, "orders")
        .withColumn("__pc", cents(col("o_totalprice")))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 5)
        .select(col("o_orderstatus"), col("rnk"), col("drnk"), col("o_orderkey"))
        .orderBy("o_orderstatus", "rnk", "o_orderkey")
    },
    Some("""SELECT o_orderstatus, rnk, drnk, o_orderkey FROM (
           | SELECT o_orderstatus, o_orderkey,
           |  rank() OVER (PARTITION BY o_orderstatus ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rnk,
           |  dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS drnk
           | FROM orders) t WHERE rnk <= 5 ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin))

  val wLagLead: Q = Q(
    "w_lag_lead",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(spark, dir, "events")
        .select(
          col("event_id"), col("user_id"),
          cents(col("value")).as("value_cents"),
          lag(cents(col("value")), 1).over(w).as("prev_cents"),
          lead(cents(col("value")), 1).over(w).as("next_cents"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, CAST(round(value*100) AS BIGINT) AS value_cents,
           | lag(CAST(round(value*100) AS BIGINT), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_cents,
           | lead(CAST(round(value*100) AS BIGINT), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_cents
           |FROM events ORDER BY event_id""".stripMargin))

  val wFrameRows: Q = Q(
    "w_frame_rows",
    (spark, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(spark, dir, "events")
        .select(col("event_id"), col("user_id"), sum(cents(col("value"))).over(w).as("run_cents"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           | CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
           |FROM events ORDER BY event_id""".stripMargin))

  val wFrameRange: Q = Q(
    "w_frame_range",
    (spark, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        .rangeBetween(-5, Window.currentRow)
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), sum(cents(col("o_totalprice"))).over(w).as("win_cents"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
           |   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** ntile(4) by status — computed from a
    * [[graft.ops.DistributedPrefix]] price-range-blocked running count
    * rather than `Window.partitionBy(status)`: status cardinality is a
    * schema property (3 values), so the plain window would sort each
    * status's sf-proportional rows in one task. The ordering key
    * (price_cents, o_orderkey) is unique within a status, so the SQL
    * ntile bucketing (first n mod k buckets take ceil(n/k) rows) is a
    * closed form of the running row number rn and the group size n —
    * identical to the window function's assignment. */
  val wNtile: Q = Q(
    "w_ntile",
    (spark, dir) => {
      // NOT checkpointed: a 3-column pruned scan re-reads cheaper than a
      // 3.8M-row checkpoint materializes (measured 2x at 256x) — the
      // checkpoint discipline pays only when the re-derivation is
      // expensive (text tokenize), not for a columnar projection
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          cents(col("o_totalprice")).as("__pc"))
      // one pass: per-status counts carry the price extrema, the global
      // bounds reduce the 3-row frame (no second scan of base)
      val sizes = base.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("__n"),
        min(col("__pc")).as("__mn"), max(col("__pc")).as("__mx"))
        .localCheckpoint()
      val bounds = sizes.agg(min(col("__mn")).as("blo"), max(col("__mx")).as("bhi"))
      // exact for counts < 2^53 (doubles are integral there)
      def idiv(a: Column, b: Column): Column =
        floor(a.cast("double") / b.cast("double")).cast("long")
      val q = idiv(col("__n"), lit(4L)) // floor bucket size
      val r = col("__n") % 4L           // first r buckets take q+1 rows
      graft.ops.DistributedPrefix.runningSum(
          base.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("__pc"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("__pc"), col("o_orderkey")),
          value = lit(1L),
          out = "rn",
          groupCols = Seq("o_orderstatus"))
        .join(broadcast(sizes), Seq("o_orderstatus"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("rn") <= (q + 1L) * r, idiv(col("rn") - 1L, q + 1L) + 1L)
            .otherwise(r + idiv(col("rn") - (q + 1L) * r - 1L, q) + 1L)
            .cast("int").as("quartile"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
           | ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY CAST(round(o_totalprice*100) AS BIGINT), o_orderkey) AS quartile
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ----------------------------------------------------------- sort / topk
  /** ORDER BY + LIMIT compiles to TakeOrderedAndProject: each partition
    * keeps a k-heap, the driver merges k*parts rows — no global sort. */
  val sTopk: Q = Q(
    "s_topk",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20),
    Some("""SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
           |FROM lineitem ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------- setops
  private def custNations(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
  private def suppNations(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(spark, dir, "supplier").select(col("s_nationkey").cast("int").as("nk"))

  val setUnionAll: Q = Q(
    "set_union_all",
    (spark, dir) =>
      custNations(spark, dir).withColumn("side", lit("cust"))
        .unionAll(suppNations(spark, dir).withColumn("side", lit("supp")))
        .groupBy(col("nk"), col("side")).agg(count(lit(1)).as("cnt"))
        .orderBy("nk", "side"),
    Some("""SELECT nk, side, COUNT(*) AS cnt FROM (
           | SELECT c_nationkey AS nk, 'cust' AS side FROM customer
           | UNION ALL SELECT s_nationkey AS nk, 'supp' AS side FROM supplier) t
           |GROUP BY nk, side ORDER BY nk, side""".stripMargin))

  val setUnion: Q = Q(
    "set_union",
    (spark, dir) =>
      custNations(spark, dir).union(suppNations(spark, dir)).distinct().orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier
           |ORDER BY nk""".stripMargin))

  val setIntersect: Q = Q(
    "set_intersect",
    (spark, dir) =>
      custNations(spark, dir).intersect(suppNations(spark, dir)).orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier
           |ORDER BY nk""".stripMargin))

  val setExcept: Q = Q(
    "set_except",
    (spark, dir) =>
      custNations(spark, dir).except(suppNations(spark, dir)).orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey AS nk FROM supplier
           |ORDER BY nk""".stripMargin))

  /** Multiset (bag) semantics: INTERSECT ALL keeps min(multiplicity),
    * EXCEPT ALL subtracts multiplicities — Spark plans both as aggregated
    * joins over (value, count), one shuffle each, no row explosion. */
  val setIntersectAll: Q = Q(
    "set_intersect_all",
    (spark, dir) =>
      custNations(spark, dir).intersectAll(suppNations(spark, dir)).orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey AS nk FROM supplier
           |ORDER BY nk""".stripMargin))

  val setExceptAll: Q = Q(
    "set_except_all",
    (spark, dir) =>
      custNations(spark, dir).exceptAll(suppNations(spark, dir)).orderBy("nk"),
    Some("""SELECT c_nationkey AS nk FROM customer EXCEPT ALL SELECT s_nationkey AS nk FROM supplier
           |ORDER BY nk""".stripMargin))

  /** Forward as-of: each signup paired with the user's NEXT purchase (the
    * mirror of [[jAsof]]'s backward lookup) — same window form, forward
    * frame + first_value. Still O(n log n) per user partition, no range
    * join pair explosion. */
  val jAsofFwd: Q = Q(
    "j_asof_fwd",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      e.withColumn(
        "next_purchase_id",
        first(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("next_purchase_id"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, next_purchase_id FROM (
           | SELECT event_id, user_id, event_type,
           |  first_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
           |   OVER (PARTITION BY user_id ORDER BY ts, event_id
           |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_id
           | FROM events) t
           |WHERE event_type = 'signup' ORDER BY event_id""".stripMargin))

  /** Nearest as-of (the third merge-asof direction): each purchase paired
    * with the temporally CLOSEST signup of the same user in either
    * direction, ties preferring the earlier (backward) one. Both
    * candidates come from the same two window frames [[jAsof]] and
    * [[jAsofFwd]] use — still one partition sort per user, no range-join
    * pair explosion — and the µs-distance compare picks the winner. */
  val jAsofNearest: Q = Q(
    "j_asof_nearest",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val wb = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val sigId = when(col("event_type") === "signup", col("event_id"))
      val sigTs = when(col("event_type") === "signup", col("ts"))
      e.withColumn("back_id", last(sigId, ignoreNulls = true).over(wb))
        .withColumn("back_ts", last(sigTs, ignoreNulls = true).over(wb))
        .withColumn("fwd_id", first(sigId, ignoreNulls = true).over(wf))
        .withColumn("fwd_ts", first(sigTs, ignoreNulls = true).over(wf))
        .filter(col("event_type") === "purchase")
        .withColumn("nearest_signup_id",
          when(col("back_id").isNull, col("fwd_id"))
            .when(col("fwd_id").isNull, col("back_id"))
            .when(unix_micros(col("ts")) - unix_micros(col("back_ts")) <=
              unix_micros(col("fwd_ts")) - unix_micros(col("ts")), col("back_id"))
            .otherwise(col("fwd_id")))
        .select(col("event_id"), col("user_id"), col("nearest_signup_id"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           |  CASE WHEN back_id IS NULL THEN fwd_id
           |       WHEN fwd_id IS NULL THEN back_id
           |       WHEN (ts - back_ts) <= (fwd_ts - ts) THEN back_id
           |       ELSE fwd_id END AS nearest_signup_id
           |FROM (
           | SELECT event_id, user_id, event_type, ts,
           |  last_value(CASE WHEN event_type='signup' THEN event_id END IGNORE NULLS) OVER wb AS back_id,
           |  last_value(CASE WHEN event_type='signup' THEN ts END IGNORE NULLS) OVER wb AS back_ts,
           |  first_value(CASE WHEN event_type='signup' THEN event_id END IGNORE NULLS) OVER wf AS fwd_id,
           |  first_value(CASE WHEN event_type='signup' THEN ts END IGNORE NULLS) OVER wf AS fwd_ts
           | FROM events
           | WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |        wf AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           |) t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin))

  /** Backward as-of join WITH TOLERANCE — pandas merge_asof's `tolerance`
    * parameter, the one as-of variant the `j_asof`/`j_asof_fwd`/
    * `j_asof_nearest` trio didn't cover: each purchase takes the latest
    * signup at-or-before it ONLY if it is within 7 days, else NULL (a
    * stale match is worse than no match in feature lookups). Same one
    * partition-sorted window pass as the other as-ofs — the tolerance is
    * a post-window µs compare, not a range join, so there is still no
    * pair explosion; timestamps compare as exact integer micros both
    * engines. */
  val jAsofTolerance: Q = Q(
    "j_asof_tolerance",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("back_id",
          last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
        .withColumn("back_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("signup_event_id",
          when(unix_micros(col("ts")) - unix_micros(col("back_ts")) <=
            lit(7L * 24 * 3600 * 1000000L), col("back_id")))
        .select(col("event_id"), col("user_id"), col("signup_event_id"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
           |  CASE WHEN ts - back_ts <= INTERVAL 7 DAY THEN back_id END AS signup_event_id
           |FROM (
           | SELECT event_id, user_id, event_type, ts,
           |  last_value(CASE WHEN event_type='signup' THEN event_id END IGNORE NULLS) OVER wb AS back_id,
           |  last_value(CASE WHEN event_type='signup' THEN ts END IGNORE NULLS) OVER wb AS back_ts
           | FROM events
           | WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |) t WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin))

  val all: Seq[Q] = Seq(
    qProject, qFilter,
    jBroadcast, jShuffle, jLeft, jFull, jSemi, jAnti, jRange, jAsof, jAsofFwd, jAsofNearest,
    jAsofTolerance, jCross,
    aAgg, aDistinct, aCountDistinct, aApproxDistinct, aRollup, aCube, aGroupingSets,
    aGroupingId, aUdaf,
    wRowNumber, wRankDense, wLagLead, wFrameRows, wFrameRange, wNtile,
    sTopk,
    setUnionAll, setUnion, setIntersect, setExcept, setIntersectAll, setExceptAll)
}
