package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery surface (scalar / correlated-EXISTS / lateral), driven through
  * `spark.sql` so Catalyst's decorrelation machinery is exercised end-to-end
  * (`RewriteCorrelatedScalarSubquery`, `RewritePredicateSubquery`,
  * `DecorrelateInnerQuery`). Each correlated form decorrelates into a join:
  * that is the 100 TB story — no per-row re-execution of the inner query,
  * one distributed join instead.
  */
object SubqueryQ {

  private def withViews(spark: SparkSession, dir: String, names: String*)(sql: String): DataFrame = {
    names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(sql)
  }

  /** Scalar (uncorrelated) subquery: orders pricier than 1.5x the global
    * mean. The mean is kept as an exact rational (sum_cents, n) and the
    * comparison cross-multiplied, so no float mean is ever materialized.
    * Plan: the aggregate runs once and broadcasts as a literal. */
  val subScalar: Q = Q(
    "sub_scalar",
    (spark, dir) => withViews(spark, dir, "orders")(
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE CAST(round(o_totalprice*100) AS BIGINT)
        |      * (SELECT COUNT(*) FROM orders) * 2
        |      > (SELECT SUM(CAST(round(o_totalprice*100) AS BIGINT)) FROM orders) * 3
        |ORDER BY o_orderkey""".stripMargin),
    Some("""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
           |FROM orders
           |WHERE CAST(round(o_totalprice*100) AS BIGINT)
           |      * (SELECT COUNT(*) FROM orders) * 2
           |      > (SELECT SUM(CAST(round(o_totalprice*100) AS BIGINT)) FROM orders) * 3
           |ORDER BY o_orderkey""".stripMargin))

  /** Correlated EXISTS with an inner predicate — decorrelates to a left
    * semi join on o_custkey (RewritePredicateSubquery). */
  val subExistsCorr: Q = Q(
    "sub_exists_corr",
    (spark, dir) => withViews(spark, dir, "customer", "orders")(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
           |ORDER BY c_custkey""".stripMargin))

  /** Correlated NOT EXISTS with inner predicate → left anti join. */
  val subNotExists: Q = Q(
    "sub_not_exists",
    (spark, dir) => withViews(spark, dir, "customer", "orders")(
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),
    Some("""SELECT c_custkey FROM customer c
           |WHERE NOT EXISTS (SELECT 1 FROM orders o
           |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
           |ORDER BY c_custkey""".stripMargin))

  /** Lateral correlated subquery: top-2 orders per customer, expressed as
    * LATERAL (ORDER BY LIMIT 2). Catalyst rewrites this to a window
    * (DecorrelateInnerQuery + RewriteLateralSubquery) — same cost model as
    * the explicit row_number() formulation, so no per-customer re-scan. */
  val subLateral: Q = Q(
    "sub_lateral",
    (spark, dir) => withViews(spark, dir, "customer", "orders")(
      """SELECT c.c_custkey, t.o_orderkey, t.price_cents
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
        |         FROM orders o WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, price_cents DESC, o_orderkey""".stripMargin),
    Some("""SELECT c.c_custkey, t.o_orderkey, t.price_cents
           |FROM customer c
           |CROSS JOIN LATERAL (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
           |         FROM orders o WHERE o.o_custkey = c.c_custkey
           |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
           |ORDER BY c_custkey, price_cents DESC, o_orderkey""".stripMargin))

  /** Correlated scalar subquery in the SELECT list: per-nation customer
    * count via subquery — decorrelates to an aggregate + left outer join. */
  val subScalarCorr: Q = Q(
    "sub_scalar_corr",
    (spark, dir) => withViews(spark, dir, "nation", "customer")(
      """SELECT n_nationkey, n_name,
        |  (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust
        |FROM nation n ORDER BY n_nationkey""".stripMargin),
    Some("""SELECT n_nationkey, n_name,
           |  (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust
           |FROM nation n ORDER BY n_nationkey""".stripMargin))

  /** IN-subquery projected as a VALUE (not a filter): plans as Spark's
    * ExistenceJoin — the fifth join variant beyond inner/outer/semi/anti,
    * emitting a membership flag per probe row instead of filtering. The
    * flag column is the common "tag rows against a reference set" shape
    * (e.g. "is this doc's source in the curated list") and costs one hash
    * join, never a per-row subquery. */
  val subInFlag: Q = Q(
    "sub_in_flag",
    (spark, dir) => withViews(spark, dir, "orders", "customer")(
      """SELECT o_orderkey,
        |  CAST(o_custkey IN (SELECT c_custkey FROM customer
        |                     WHERE c_acctbal > 9000) AS BIGINT) AS rich_cust
        |FROM orders WHERE o_orderkey % 17 = 0
        |ORDER BY o_orderkey""".stripMargin),
    Some("""SELECT o_orderkey,
           |  CAST(o_custkey IN (SELECT c_custkey FROM customer
           |                     WHERE c_acctbal > 9000) AS BIGINT) AS rich_cust
           |FROM orders WHERE o_orderkey % 17 = 0
           |ORDER BY o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(subScalar, subExistsCorr, subNotExists, subLateral, subScalarCorr, subInFlag)
}
