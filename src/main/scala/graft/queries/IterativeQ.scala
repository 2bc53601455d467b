package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Iterative SQL surface (recursive CTEs, Spark 4.x `UnionLoop`) and
  * pipeline observability (`Dataset.observe`).
  *
  * Spark 4.1 recursion supports UNION ALL only (no fixpoint-dedup UNION),
  * so cyclic closures like connected components stay on the Pregel path
  * ([[graft.ops.ConnectedComponents]]); what recursion DOES express is
  * acyclic walks — hierarchies, chains, sequences — where each step is a
  * distributed join of the frontier against a base relation.
  */
object IterativeQ {

  /** Per-customer order-chain walk: step through each customer's orders in
    * date order computing a running spend by RECURSION (each iteration
    * joins the frontier — one row per customer — against the next link).
    * The classic linked-list/hierarchy traversal shape: depth = longest
    * chain (~25 here), every superstep a key-equi-join, no driver loop.
    * Semantically a window running sum, which is exactly what makes it
    * oracle-checkable; the point is exercising `UnionLoop` end-to-end.
    */
  private val chainSql =
    """WITH RECURSIVE nxt AS (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders),
      |walk(o_custkey, rn, o_orderkey, running_cents) AS (
      |  SELECT o_custkey, rn, o_orderkey, cents FROM nxt WHERE rn = 1
      |  UNION ALL
      |  SELECT n.o_custkey, n.rn, n.o_orderkey, w.running_cents + n.cents
      |  FROM nxt n JOIN walk w
      |    ON n.o_custkey = w.o_custkey AND n.rn = w.rn + 1)
      |SELECT o_custkey, CAST(rn AS BIGINT) AS step, o_orderkey, running_cents
      |FROM walk ORDER BY o_custkey, step""".stripMargin

  val sqlRecursiveChain: Q = Q(
    "sql_recursive_chain",
    (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql(chainSql)
    },
    Some(chainSql))

  /** `Dataset.observe`: pipeline observability metrics (row count, exact
    * money sum, null audit, max) collected as accumulator side-output of a
    * SINGLE pass over the data — the 100 TB way to audit a pipeline run
    * without a second scan. The observed plan is driven by foreach (a full
    * execution that moves NOTHING to the driver); the metrics row itself
    * is the query result, oracle-checked against a plain aggregate.
    */
  val qObserve: Q = Q(
    "q_observe",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val observed = li.observe(
        "li_metrics",
        count(lit(1)).as("n_rows"),
        sum(graft.ops.ColumnOps.cents(col("l_extendedprice"))).as("sum_price_cents"),
        count_if(col("l_quantity").isNull).as("n_null_qty"),
        max(col("l_quantity").cast("long")).as("max_qty"))
      // Drive THIS Dataset's own executedPlan: a new action (count/foreach)
      // would plan a fresh QueryExecution whose CollectMetrics accumulator
      // is a different instance, leaving observedMetrics at zero-state.
      observed.queryExecution.toRdd.foreach(_ => ())
      val m = observed.queryExecution.observedMetrics("li_metrics")
      val schema = StructType(Seq(
        StructField("n_rows", LongType, nullable = false),
        StructField("sum_price_cents", LongType, nullable = false),
        StructField("n_null_qty", LongType, nullable = false),
        StructField("max_qty", LongType, nullable = false)))
      spark.createDataFrame(
        java.util.Arrays.asList(Row(m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))),
        schema)
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           | CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           | CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL) AS BIGINT) AS n_null_qty,
           | CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
           |FROM lineitem""".stripMargin))

  val all: Seq[Q] = Seq(sqlRecursiveChain, qObserve)
}
