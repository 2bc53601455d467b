package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Composite analytics, second wave (round 5): the remaining hard TPC-H
  * shapes — double-correlated EXISTS/NOT EXISTS (Q21), outer-join count
  * histogram (Q13), conditional market share (Q8), and HAVING against a
  * global scalar (Q11) — reformulated over the available columns (this
  * data has no receiptdate/commitdate/partsupp; "late" = shipped > 60
  * days after order date).
  *
  * Same parity + plan discipline as CompositeQ: integer-exact money math,
  * broadcast hints only on fixed-size dims (nation/region), sf-growing
  * tables left to AQE.
  */
object CompositeExtQ {

  /** TPC-H Q21 shape — suppliers who were the SOLE late shipper in a
    * multi-supplier order. Two correlated subqueries against the same
    * fact table (EXISTS another-supplier row, NOT EXISTS another-late-
    * supplier row): the decorrelation stress-test. Catalyst rewrites both
    * into semi/anti joins on l_orderkey — three shuffles on the same key
    * (which a 100 TB layout would bucket on), never a per-row re-scan. */
  val xWaitingOrders: Q = Q(
    "x_waiting_orders",
    (spark, dir) => {
      Seq("supplier", "lineitem", "orders", "nation").foreach(t =>
        Tables(spark, dir, t).createOrReplaceTempView(t))
      spark.sql(
        """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
          |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 20""".stripMargin)
    },
    Some("""SELECT s_name, COUNT(*) AS numwait
           |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
           |JOIN orders ON o_orderkey = l1.l_orderkey
           |WHERE o_orderstatus = 'F'
           |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (
           |    SELECT 1 FROM lineitem l2
           |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (
           |    SELECT 1 FROM lineitem l3
           |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
           |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name
           |LIMIT 20""".stripMargin))

  /** TPC-H Q13 shape — distribution of orders-per-customer INCLUDING the
    * zero bucket (the reason it must be a LEFT join: an inner join loses
    * customers with no qualifying orders). Aggregation of an aggregation:
    * count per customer, then histogram over those counts. Both aggs are
    * partial+final; the second one's key space (distinct counts) is tiny
    * so the final shuffle is negligible at any scale. */
  val xCustOrdersHist: Q = Q(
    "x_cust_orders_hist",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer").select(col("c_custkey"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist FROM (
           |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
           |  FROM customer LEFT JOIN orders
           |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           |  GROUP BY c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q8 shape — a target nation's share of yearly revenue within
    * one region's market. Share emitted as exact integer numerator/
    * denominator (cent-discount units), not a float ratio: division is
    * the consumer's choice, cross-engine parity stays bit-exact.
    * nation/region are fixed-size (25/5 rows) → broadcast-hinted;
    * customer/supplier/orders grow with sf → no hint, AQE decides. */
  val xMarketShare: Q = Q(
    "x_market_share",
    (spark, dir) => {
      import graft.ops.ColumnOps._
      val li = Tables(spark, dir, "lineitem")
      val ord = Tables(spark, dir, "orders")
      val cust = Tables(spark, dir, "customer")
      val supp = Tables(spark, dir, "supplier")
      val nat = Tables(spark, dir, "nation")
      val reg = Tables(spark, dir, "region")
      val custRegion = cust
        .join(broadcast(nat.select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg.filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = supp
        .join(broadcast(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val vol = cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(custRegion, col("o_custkey") === col("c_custkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "BRAZIL", vol).otherwise(lit(0L))).as("share_num_units"),
          sum(vol).as("share_den_units"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           | CAST(SUM(CASE WHEN n2.n_name = 'BRAZIL'
           |   THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
           |   ELSE 0 END) AS BIGINT) AS share_num_units,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS share_den_units
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON c_nationkey = n1.n_nationkey
           |JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n2 ON s_nationkey = n2.n_nationkey
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** TPC-H Q11 shape — parts whose revenue exceeds a threshold derived
    * from a GLOBAL scalar (HAVING against a scalar subquery). The one-row
    * total is a broadcast by construction; the per-part agg shuffles once
    * on l_partkey. The threshold is 1.5× the MEAN part value — unlike
    * TPC-H's fixed fraction (which must be hand-rescaled per SF) a
    * mean-relative cut is scale-invariant, and `v * n_parts * 10 >
    * 15 * tot` keeps the compare in exact integers (v > 1.5·tot/n without
    * the division; magnitudes stay < 2^63 even at sf1000). */
  val xTopValueParts: Q = Q(
    "x_top_value_parts",
    (spark, dir) => {
      import graft.ops.ColumnOps._
      val pv = Tables(spark, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
      val tot = pv.agg(sum(col("value_cents")).as("total_cents"),
        count(lit(1)).as("n_parts"))
      pv.crossJoin(broadcast(tot))
        .filter(col("value_cents") * col("n_parts") * 10L > col("total_cents") * 15L)
        .select(col("l_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("l_partkey"))
    },
    Some("""WITH pv AS (
           |  SELECT l_partkey, SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS value_cents
           |  FROM lineitem GROUP BY 1),
           |t AS (SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts FROM pv)
           |SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM pv, t
           |WHERE value_cents * n_parts * 10 > total_cents * 15
           |ORDER BY value_cents DESC, l_partkey""".stripMargin))

  /** TPC-H Q19 shape — revenue from an OR of conjunctive predicate
    * bundles spanning BOTH join sides. The interesting plan property:
    * Catalyst keeps the equi-key (l_partkey = p_partkey) out of the
    * disjunction, so the join stays a hash join, and pushes the
    * single-side conjuncts of each branch down to the scans (p_size ≥ 1
    * to part, quantity bounds to lineitem) — the disjunction is evaluated
    * only on join survivors. A planner that treated the whole WHERE as
    * one opaque predicate would nested-loop. */
  val xPromoRevenue: Q = Q(
    "x_promo_revenue",
    (spark, dir) => {
      import graft.ops.ColumnOps._
      val li = Tables(spark, dir, "lineitem")
      val p = Tables(spark, dir, "part")
      val branch = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#1", 5, 1, 11) || branch("Brand#2", 10, 10, 20) ||
          branch("Brand#3", 15, 20, 30))
        .agg(
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
            .as("revenue_units"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units,
           | COUNT(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** TPC-H Q22 shape — LAPSED customers: above the global average balance
    * but with no order since 2000-07-01. A scalar-aggregate threshold
    * (broadcast one row) + anti join against the date-filtered fact
    * (the filter pushes to the orders scan BEFORE the anti join builds),
    * grouped by segment. The average compare stays in exact integers
    * (bal·n > total avoids the division): same cross-engine determinism
    * discipline as x_top_value_parts. */
  val xIdleCustomers: Q = Q(
    "x_idle_customers",
    (spark, dir) => {
      import graft.ops.ColumnOps._
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), cents(col("c_acctbal")).as("bal_cents"))
      val pos = cust.filter(col("bal_cents") > 0)
      val thr = pos.agg(sum(col("bal_cents")).as("total_cents"), count(lit(1)).as("n_pos"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-07-01").cast("timestamp"))
        .select(col("o_custkey"))
      pos.crossJoin(broadcast(thr))
        .filter(col("bal_cents") * col("n_pos") > col("total_cents"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("total_bal_cents"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH c AS (SELECT c_custkey, c_mktsegment,
           |    CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
           |  FROM customer),
           |p AS (SELECT * FROM c WHERE bal_cents > 0),
           |t AS (SELECT SUM(bal_cents) AS total_cents, COUNT(*) AS n_pos FROM p)
           |SELECT c_mktsegment, COUNT(*) AS n_cust,
           | CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
           |FROM p, t
           |WHERE bal_cents * n_pos > total_cents
           |  AND NOT EXISTS (SELECT 1 FROM orders
           |    WHERE o_custkey = p.c_custkey
           |      AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Fulfillment-latency SLA table: exact p50/p90/p99 order→ship days
    * per order priority, computed CLOSED-FORM from the bounded
    * (priority, lag_days) count grain — never a per-row sort. The
    * percentile definition is "smallest lag whose cumulative count
    * reaches p% of the priority's total" (lower/type-1), which is pure
    * integer arithmetic and therefore hash-exact.
    *
    * Plan: one orderkey equi-join (the only data-sized stage) feeding
    * one hash agg to the (5 priorities × ~400 lag values) grain; the
    * cumulative window and the three threshold aggregations run on that
    * bounded frame. This is the at-scale exact-percentile pattern for
    * discrete domains — contrast [[AdvancedQ]]'s `a_percentile`, which
    * uses Spark's percentile aggregate (a per-group value buffer): here
    * state is bounded by the domain, not the row count, so 100 TB costs
    * one more partial-agg pass, nothing else. */
  val xFulfillmentLag: Q = Q(
    "x_fulfillment_lag",
    (spark, dir) => {
      val lag = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(Tables(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("priority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("priority")).orderBy(col("lag_days"))
      lag.groupBy(col("priority"), col("lag_days"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("tot", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("priority"))))
        .groupBy(col("priority"))
        .agg(max(col("tot")).as("n_lines"),
          min(when(col("cum") * 100 >= col("tot") * 50, col("lag_days"))).as("p50_days"),
          min(when(col("cum") * 100 >= col("tot") * 90, col("lag_days"))).as("p90_days"),
          min(when(col("cum") * 100 >= col("tot") * 99, col("lag_days"))).as("p99_days"),
          max(col("lag_days")).as("max_days"))
        .orderBy(col("priority"))
    },
    Some("""WITH g AS (
           |  SELECT o.o_orderpriority AS priority,
           |         (CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)) AS lag_days,
           |         COUNT(*) AS n
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  GROUP BY 1, 2),
           |c AS (
           |  SELECT priority, lag_days, n,
           |         SUM(n) OVER (PARTITION BY priority ORDER BY lag_days) AS cum,
           |         SUM(n) OVER (PARTITION BY priority) AS tot
           |  FROM g)
           |SELECT priority,
           |       CAST(MAX(tot) AS BIGINT) AS n_lines,
           |       CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN lag_days END) AS BIGINT) AS p50_days,
           |       CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN lag_days END) AS BIGINT) AS p90_days,
           |       CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN lag_days END) AS BIGINT) AS p99_days,
           |       CAST(MAX(lag_days) AS BIGINT) AS max_days
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(xWaitingOrders, xCustOrdersHist, xMarketShare, xTopValueParts,
    xPromoRevenue, xIdleCustomers, xFulfillmentLag)
}
