package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Modern SQL authoring surface (round 6): SQL pipe syntax, named-parameter
  * queries, EXECUTE IMMEDIATE, GROUP BY ALL / ORDER BY ALL, and
  * schema-drift-tolerant UNION BY NAME. None of these add new physical
  * operators — each compiles to the same plans the classic forms produce
  * (verified by identical oracles) — but they are the API a user of a
  * modern engine writes every day, so the surface must exist and must
  * plan identically (zero overhead vs the classic form).
  */
object SqlSurfaceQ {

  private def withViews(spark: SparkSession, dir: String, names: String*)(f: => DataFrame): DataFrame = {
    names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
    f
  }

  /** SQL pipe syntax (`|>`): the linear dataflow form of SQL (Spark 4.0).
    * Each `|>` stage is planned exactly like its classic-clause
    * equivalent — pipes are parse-time sugar, so WHERE still pushes to
    * the scan and AGGREGATE is still a partial+final hash agg. The oracle
    * is the classic-syntax twin, proving the sugar changes nothing. */
  val sqlPipe: Q = Q(
    "sql_pipe",
    (spark, dir) => withViews(spark, dir, "lineitem")(spark.sql(
      """FROM lineitem
        ||> EXTEND CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        ||> WHERE l_quantity >= 10
        ||> AGGREGATE COUNT(*) AS n, SUM(price_cents) AS sum_cents
        |   GROUP BY l_returnflag, l_linestatus
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
           |FROM lineitem WHERE l_quantity >= 10
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Named-parameter SQL: the text contains `:lim` / `:seg` placeholders
    * and values are bound out-of-band — the injection-safe form of query
    * templating (values are bound as typed literals by the parser, never
    * string-spliced). Parameter markers reach Catalyst as literals, so
    * constant folding and pushdown see the bound value exactly as if it
    * were inlined. */
  val sqlParams: Q = Q(
    "sql_params",
    (spark, dir) => withViews(spark, dir, "customer") {
      spark.sql(
        """SELECT c_custkey, c_name, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
          |FROM customer
          |WHERE c_mktsegment = :seg AND c_acctbal > :lim
          |ORDER BY c_custkey""".stripMargin,
        Map("seg" -> "BUILDING", "lim" -> 9000))
    },
    Some("""SELECT c_custkey, c_name, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
           |FROM customer
           |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
           |ORDER BY c_custkey""".stripMargin))

  /** EXECUTE IMMEDIATE: run SQL held in a string variable with USING
    * bindings — the dynamic-SQL surface for rule-driven pipelines where
    * the query text itself is data (e.g. a labeling rule table holding
    * predicates). The inner text binds `?` positionally from USING. */
  val sqlExecImmediate: Q = Q(
    "sql_exec_immediate",
    (spark, dir) => withViews(spark, dir, "orders") {
      spark.sql("DECLARE OR REPLACE VARIABLE stmt STRING")
      spark.sql(
        """SET VAR stmt =
          |  'SELECT o_orderpriority, COUNT(*) AS n
          |   FROM orders WHERE o_orderstatus = ? GROUP BY 1 ORDER BY 1'""".stripMargin)
      spark.sql("EXECUTE IMMEDIATE stmt USING 'F'")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n
           |FROM orders WHERE o_orderstatus = 'F'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** GROUP BY ALL / ORDER BY ALL: every non-aggregate select item becomes
    * a grouping key and the full select list the sort key — removes the
    * classic copy-the-select-list failure mode where an added column
    * silently changes grain. DuckDB implements the same extension, so the
    * oracle exercises the identical shorthand on both engines. */
  val sqlGroupByAll: Q = Q(
    "sql_group_by_all",
    (spark, dir) => withViews(spark, dir, "orders")(spark.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
           |FROM orders
           |GROUP BY ALL
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin))

  /** Schema-drift-tolerant union: two feeds of the same logical table
    * where one producer added a column — unionByName with
    * allowMissingColumns aligns by NAME (position-proof) and fills the
    * missing column with nulls. The positional `union` would silently
    * misalign; at 100 TB schema drift across thousands of daily files is
    * the norm, and by-name resolution is the contract that survives it.
    * DuckDB's `UNION ALL BY NAME` is the same extension. */
  val setUnionByName: Q = Q(
    "set_union_byname",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      val v1 = Tables(spark, dir, "supplier")
        .filter(col("s_suppkey") % 2 === 0)
        .select(col("s_suppkey"), col("s_nationkey"))
      val v2 = Tables(spark, dir, "supplier")
        .filter(col("s_suppkey") % 2 === 1)
        // deliberately different column ORDER + an extra column
        .select(col("s_nationkey"), col("s_suppkey"),
          expr("CAST(round(s_acctbal*100) AS BIGINT)").as("bal_cents"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("bal_cents").isNull, 1L).otherwise(0L)).as("n_pre_schema"),
          sum(coalesce(col("bal_cents"), lit(0L))).as("bal_total"))
        .orderBy("s_nationkey")
    },
    Some("""WITH u AS (
           |  SELECT s_suppkey, s_nationkey, CAST(NULL AS BIGINT) AS bal_cents
           |  FROM supplier WHERE s_suppkey % 2 = 0
           |  UNION ALL BY NAME
           |  SELECT s_nationkey, s_suppkey, CAST(round(s_acctbal*100) AS BIGINT) AS bal_cents
           |  FROM supplier WHERE s_suppkey % 2 = 1)
           |SELECT s_nationkey, COUNT(*) AS n,
           | CAST(SUM(CASE WHEN bal_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_schema,
           | CAST(SUM(COALESCE(bal_cents, 0)) AS BIGINT) AS bal_total
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin))

  /** stack() generator: fixed column-set → rows without a join — the
    * TVF form of unpivot (g_unpivot covers the melt API; stack is the
    * SQL-function surface with inline literals). Emits one (measure,
    * value) row pair per input row, integer-exact. */
  val fStack: Q = Q(
    "f_stack",
    (spark, dir) => withViews(spark, dir, "part")(spark.sql(
      """SELECT p_partkey, measure, v
        |FROM (
        |  SELECT p_partkey,
        |    stack(2, 'retail_cents', CAST(round(p_retailprice*100) AS BIGINT),
        |             'size_units',  CAST(p_size AS BIGINT)) AS (measure, v)
        |  FROM part WHERE p_partkey <= 200)
        |ORDER BY p_partkey, measure""".stripMargin)),
    Some("""SELECT p_partkey, measure, v FROM (
           |  SELECT p_partkey, 'retail_cents' AS measure,
           |         CAST(round(p_retailprice*100) AS BIGINT) AS v
           |  FROM part WHERE p_partkey <= 200
           |  UNION ALL
           |  SELECT p_partkey, 'size_units', CAST(p_size AS BIGINT)
           |  FROM part WHERE p_partkey <= 200)
           |ORDER BY p_partkey, measure""".stripMargin))

  val all: Seq[Q] = Seq(sqlPipe, sqlParams, sqlExecImmediate, sqlGroupByAll,
    setUnionByName, fStack)
}
