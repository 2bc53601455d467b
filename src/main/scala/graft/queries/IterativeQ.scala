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
    * The classic linked-list/hierarchy traversal shape: every superstep a
    * key-equi-join, no driver loop. Semantically a window running sum,
    * which is exactly what makes it oracle-checkable; the point is
    * exercising `UnionLoop` end-to-end.
    *
    * Depth is capped at 12 steps (`n.rn <= 12`): each superstep is a full
    * re-planned job (~0.3 s fixed overhead regardless of data size), so
    * unbounded depth prices the bench by scheduler overhead, not by data —
    * the standard bounded-recursion guard every production recursive query
    * carries anyway.
    */
  // Fixed-size cohort (o_custkey < 1500, sf-independent like d_decontam's
  // eval set): the recursion frontier is one row per cohort member, so the
  // BROADCAST(w) hint below is scale-correct — the build side does NOT
  // grow with the corpus. An unbounded walk would make the frontier
  // sf-proportional and the hint a scale-killer (the exact pattern
  // PlanAuditSpec bans from the composites).
  private val nxtSql =
    """SELECT o_custkey, o_orderkey,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |       row_number() OVER (PARTITION BY o_custkey
      |                          ORDER BY o_orderdate, o_orderkey) AS rn
      |FROM orders WHERE o_custkey < 1500""".stripMargin

  private val walkSql =
    """WITH RECURSIVE walk(o_custkey, rn, o_orderkey, running_cents) AS (
      |  SELECT o_custkey, rn, o_orderkey, cents FROM nxt WHERE rn = 1
      |  UNION ALL
      |  SELECT /*+ BROADCAST(w) */
      |         n.o_custkey, n.rn, n.o_orderkey, w.running_cents + n.cents
      |  FROM nxt n JOIN walk w
      |    ON n.o_custkey = w.o_custkey AND n.rn = w.rn + 1 AND n.rn <= 12)
      |SELECT o_custkey, CAST(rn AS BIGINT) AS step, o_orderkey, running_cents
      |FROM walk ORDER BY o_custkey, step""".stripMargin

  // Oracle: same walk, with nxt as a plain (self-contained) CTE.
  private val chainSql = s"WITH RECURSIVE nxt AS (\n$nxtSql),\n" +
    walkSql.stripPrefix("WITH RECURSIVE ")

  val sqlRecursiveChain: Q = Q(
    "sql_recursive_chain",
    (spark, dir) => {
      // Per-query session tuning: every superstep is a separate re-planned
      // job, so at frontier size (≤15k rows/step) the 32-partition default
      // prices each step by scheduler overhead. A cloned session (shared
      // catalog + cache, isolated conf) drops shuffle parallelism to match
      // the data — the standard "tune the session to the workload" move,
      // scoped so no other query inherits it.
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE's per-stage re-optimization is pure driver overhead at this
      // scale and multiplies across supersteps; static planning is faster
      // for a bounded-depth loop over an already-cached relation.
      s.conf.set("spark.sql.adaptive.enabled", "false")
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      // Materialize the windowed base relation ONCE. Left as a CTE it is
      // inlined into the recursive arm and recomputed — scan + shuffle +
      // sort — on EVERY superstep (14.5 s in BENCH_r03). Cached, each
      // superstep is an in-memory scan joined against the frontier. Same
      // move a 100 TB run makes by writing the windowed relation to
      // storage before recursing.
      s.sql(nxtSql)
        .repartition(col("o_custkey")).cache().createOrReplaceTempView("nxt")
      s.sql(walkSql)
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
