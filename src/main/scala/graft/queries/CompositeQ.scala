package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Composite analytics: multi-operator queries in the classic TPC-H shapes
  * (the reference is a fixed ETL pipeline — these exercise the ENGINE's
  * ability to compose scans, selective filters, multi-way joins and
  * aggregation into one optimized plan, which is what a 100 TB analytical
  * user actually runs).
  *
  * Plan expectations (audited in PlanAuditSpec):
  *  - filters reach the parquet scans (PushedFilters on date/segment),
  *  - FIXED-size dims (region=5 rows, nation=25 rows) carry broadcast
  *    hints; sf-PROPORTIONAL tables (customer/supplier) carry NO hint —
  *    the planner broadcasts them while their stats fit under the
  *    threshold, and at 100× AQE degrades to a shuffle join instead of a
  *    multi-GB broadcast build (a hinted broadcast would OOM the driver),
  *  - aggregates are partial+final (map-side combine before exchange).
  *
  * All money math is integer-exact (ColumnOps): revenue is accumulated in
  * "cent-percent" units = cents × (100 − discount%), a long, so Spark and
  * DuckDB agree bit-for-bit regardless of reduction order.
  */
object CompositeQ {

  private val D = "1999-06-30" // pivot date for Q3-shape (data spans 1995..2001)

  /** TPC-H Q1 shape: full pricing summary over the fact table. One scan,
    * one partial+final hash agg, no join — at 100 TB this is the pure
    * scan-throughput benchmark, and the integer agg states keep the
    * map-side combine buffers small. */
  val xPricingSummary: Q = Q(
    "x_pricing_summary",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
            .as("sum_disc_units"),
          sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))
            * (lit(100L) + pct(col("l_tax")))).as("sum_charge_units"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
           | CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_units,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_units,
           | COUNT(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** TPC-H Q3 shape: selective dim filter (mktsegment) broadcast into the
    * orders⨝lineitem fact join, then top-10 by revenue. The segment and
    * date predicates push to the scans, so at 100 TB only ~1/5 of
    * customers and ~half the date range are ever read. */
  val xShippingPriority: Q = Q(
    "x_shipping_priority",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") < lit(D).cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") > lit(D).cast("timestamp"))
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).as("revenue_units"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"), col("revenue_units"))
        .orderBy(col("revenue_units").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey,
            | strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
            | o_orderpriority,
            | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
            |FROM customer
            |JOIN orders   ON c_custkey = o_custkey
            |JOIN lineitem ON l_orderkey = o_orderkey
            |WHERE c_mktsegment = 'BUILDING'
            |  AND o_orderdate < TIMESTAMP '$D 00:00:00'
            |  AND l_shipdate  > TIMESTAMP '$D 00:00:00'
            |GROUP BY l_orderkey, o_orderdate, o_orderpriority
            |ORDER BY revenue_units DESC, l_orderkey
            |LIMIT 10""".stripMargin))

  /** TPC-H Q5 shape: 6-way join — 3 broadcast dims (region→nation→supplier
    * chain plus customer) around the orders⨝lineitem fact join, with the
    * co-nation constraint c_nationkey = s_nationkey. The only shuffle at
    * 100 TB is the fact-fact join; everything else rides broadcasts. */
  val xLocalSupplierVolume: Q = Q(
    "x_local_supplier_volume",
    (spark, dir) => {
      val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
      val nation = Tables(spark, dir, "nation")
      val cust = Tables(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("rev"))
      // customer/supplier grow with scale factor, so they carry NO broadcast
      // hint: at bench scale the planner still broadcasts them (size stats
      // under the threshold), while at 100× AQE falls back to a shuffle
      // join instead of building a multi-GB broadcast. Only the fixed-size
      // dims (region=5, nation=25 rows) are hinted.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("revenue_units"))
        .orderBy(col("revenue_units").desc, col("n_name"))
    },
    Some("""SELECT n_name,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
           |FROM customer
           |JOIN orders   ON c_custkey = o_custkey
           |JOIN lineitem ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation   ON s_nationkey = n_nationkey
           |JOIN region   ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY revenue_units DESC, n_name""".stripMargin))

  /** TPC-H Q6 shape: pure scan + conjunctive filter + single global agg.
    * Every predicate pushes to parquet (row-group pruning on shipdate at
    * 100 TB); the aggregate is one long per partition then one add. */
  val xRevenueForecast: Q = Q(
    "x_revenue_forecast",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          pct(col("l_discount")).between(2, 6) &&
          col("l_quantity") < 24)
        .agg(
          sum(cents(col("l_extendedprice")) * pct(col("l_discount"))).as("revenue_units"),
          count(lit(1)).as("n"))
        .select(coalesce(col("revenue_units"), lit(0L)).as("revenue_units"), col("n")),
    Some("""SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT) AS revenue_units,
           | COUNT(*) AS n
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           |  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 2 AND 6
           |  AND l_quantity < 24""".stripMargin))

  /** TPC-H Q18 shape (large-volume orders): IN-subquery over an
    * aggregated HAVING, decorrelated to a semi join against the
    * aggregate; then fact⟝fact join + broadcast dim + top-20. The
    * HAVING aggregate runs partial+final and only qualifying orderkeys
    * (a tiny set) flow into the semi join — at 100 TB the filter
    * reduces the join input before any wide row is assembled. */
  val xBigOrders: Q = Q(
    "x_big_orders",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer").select(col("c_custkey"))
      val ord = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      val big = li.groupBy(col("l_orderkey")).agg(sum(col("qty")).as("sq"))
        .filter(col("sq") > 150).select(col("l_orderkey").as("big_key"))
      // customer is sf-proportional — no broadcast hint (see Q5 note above):
      // the planner broadcasts it while its stats fit, AQE shuffles at 100×.
      ord.join(big, col("o_orderkey") === col("big_key"), "left_semi")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
        .agg(sum(col("qty")).as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS od,
           |  CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
           |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           |WHERE o.o_orderkey IN (
           |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
           |GROUP BY 1, 2, 3 ORDER BY sum_qty DESC, o_orderkey LIMIT 20""".stripMargin))

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
    * Scale-deliberate join ORDER: lineitem (returnflag filter pushed) ⨝
    * orders (quarter filter pushed) is the one fact-fact shuffle, then
    * aggregate to per-custkey revenue BEFORE joining the customer dim —
    * the dim join runs on the (tiny) aggregated side, never on raw
    * lineitems. No broadcast hints: dims here are sf-proportional and AQE
    * decides (PlanAuditSpec's composite rule). */
  val xReturnedTop: Q = Q(
    "x_returned_top",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("rev"))
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).as("revenue_units"))
      perCust.join(Tables(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("revenue_units"))
        .orderBy(col("revenue_units").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           |  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue_units DESC, c_custkey LIMIT 20""".stripMargin))

  /** TPC-H Q7 shape: shipping volume between a nation pair, by direction
    * and year. Scale notes: the supplier/customer sides are pre-reduced
    * by their broadcast-hinted join against the 2-row filtered nation dim
    * BEFORE touching the facts (semi-reduction: only suppliers/customers
    * of the two nations survive), lineitem carries the pushed shipdate
    * filter, and the only big shuffle is lineitem⨝orders. No hints on
    * the sf-proportional tables. */
  val xNationVolume: Q = Q(
    "x_nation_volume",
    (spark, dir) => {
      val nat = Tables(spark, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_7"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = Tables(spark, dir, "supplier")
        .join(broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cus = Tables(spark, dir, "customer")
        .join(broadcast(nat.withColumnRenamed("n_name", "cust_nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("cust_nation"))
      val li = Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount")))).as("rev"))
      li.join(Tables(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev")).as("revenue_units"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
           |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_units
           |FROM lineitem
           |JOIN orders   ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation sn ON s_nationkey = sn.n_nationkey
           |JOIN nation cn ON c_nationkey = cn.n_nationkey
           |WHERE sn.n_name IN ('NATION_3', 'NATION_7')
           |  AND cn.n_name IN ('NATION_3', 'NATION_7')
           |  AND sn.n_name <> cn.n_name
           |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
           |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  /** TPC-H Q2 shape: min-cost supplier per part via a CORRELATED scalar
    * MIN subquery over the fact table (the testdata schema has no
    * partsupp, so lineitem plays the supply relation). Catalyst
    * decorrelates the per-part MIN into one aggregate + join
    * (RewriteCorrelatedScalarSubquery) — the inner query runs ONCE as a
    * distributed agg, never per outer row; at 100 TB that is the
    * difference between a second scan and a million re-scans. Part cohort
    * is bounded (p_partkey < 200) so output size is sf-independent;
    * DISTINCT collapses equal-price duplicate lineitems of the same
    * (part, supplier). */
  val xMinCostSupplier: Q = Q(
    "x_min_cost_supplier",
    (spark, dir) => {
      Seq("part", "lineitem", "supplier").foreach(n =>
        Tables(spark, dir, n).createOrReplaceTempView(n))
      spark.sql(
        """SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name,
          |  CAST(round(l.l_extendedprice*100) AS BIGINT) AS price_cents
          |FROM part p
          |JOIN lineitem l ON l.l_partkey = p.p_partkey
          |JOIN supplier s ON s.s_suppkey = l.l_suppkey
          |WHERE p.p_partkey < 200
          |  AND CAST(round(l.l_extendedprice*100) AS BIGINT) =
          |      (SELECT MIN(CAST(round(l2.l_extendedprice*100) AS BIGINT))
          |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
          |ORDER BY p_partkey, s_suppkey""".stripMargin)
    },
    Some("""SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name,
           |  CAST(round(l.l_extendedprice*100) AS BIGINT) AS price_cents
           |FROM part p
           |JOIN lineitem l ON l.l_partkey = p.p_partkey
           |JOIN supplier s ON s.s_suppkey = l.l_suppkey
           |WHERE p.p_partkey < 200
           |  AND CAST(round(l.l_extendedprice*100) AS BIGINT) =
           |      (SELECT MIN(CAST(round(l2.l_extendedprice*100) AS BIGINT))
           |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
           |ORDER BY p_partkey, s_suppkey""".stripMargin))

  val all: Seq[Q] = Seq(xPricingSummary, xShippingPriority, xLocalSupplierVolume,
    xRevenueForecast, xBigOrders, xReturnedTop, xNationVolume, xMinCostSupplier)
}
