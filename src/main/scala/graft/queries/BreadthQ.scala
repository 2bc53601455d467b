package graft.queries

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surface-breadth operators (round 3): VARIANT/JSON, ordered string
  * aggregation, higher-order array lambdas, null-handling (na.fill /
  * na.replace), n-gram mining, a k-means assignment superstep, and
  * percentile-threshold outlier flagging. Each follows the repo's oracle
  * parity rules (Q.scala): total ORDER BY, identical aliases, exact
  * integers for anything aggregated.
  */
object BreadthQ {

  // f_variant lives in Spark4Q (this file's earlier copy was shadowed by
  // the later Map entry and has been removed — Registry.all now rejects
  // duplicate keys outright).

  /** Ordered string aggregation: listagg ... WITHIN GROUP (Spark 4.0+),
    * the SQL-standard form of "concatenate group members in a defined
    * order" — deterministic because the order-by key is total. */
  val aStringAgg: Q = Q(
    "a_string_agg",
    (spark, dir) => {
      Tables(spark, dir, "nation").createOrReplaceTempView("nation")
      Tables(spark, dir, "region").createOrReplaceTempView("region")
      spark.sql(
        """SELECT r_name,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS members,
          |  CAST(COUNT(*) AS BIGINT) AS n
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    },
    Some("""SELECT r_name,
           | string_agg(n_name, ',' ORDER BY n_name) AS members,
           | CAST(COUNT(*) AS BIGINT) AS n
           |FROM nation JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin))

  private def qvec(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))
  private val qvecSql = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"

  /** Higher-order array lambdas over the quantized embedding: exists /
    * forall predicates, aggregate fold, zip_with combine — all codegen'd
    * column expressions (no UDF), evaluated per-row in the scan stage. */
  val fLambda: Q = Q(
    "f_lambda",
    (spark, dir) =>
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"), qvec(col("embedding")).as("qv"))
        .select(
          col("vec_id"),
          exists(col("qv"), x => x > 900L).as("any_hot"),
          forall(col("qv"), x => abs(x) <= lit(1000L)).as("all_small"),
          aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("sum_q"),
          aggregate(zip_with(col("qv"), reverse(col("qv")), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).as("rev_dot"))
        .orderBy("vec_id"),
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings)
            |SELECT vec_id,
            | len(list_filter(qv, x -> x > 900)) > 0 AS any_hot,
            | len(list_filter(qv, x -> abs(x) > 1000)) = 0 AS all_small,
            | CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
            | CAST(list_dot_product(qv, list_reverse(qv)) AS BIGINT) AS rev_dot
            |FROM v ORDER BY vec_id""".stripMargin))

  /** Null handling (DataFrameNaFunctions): synthesize nulls with NULLIF
    * semantics, then na.fill defaults + na.replace value mapping — the
    * imputation step every ingest pipeline runs before training. */
  val qNaFill: Q = Q(
    "q_na_fill",
    (spark, dir) =>
      Tables(spark, dir, "customer")
        .select(
          col("c_custkey"),
          when(col("c_mktsegment") === "BUILDING", lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("seg"),
          when(col("c_acctbal") < 0, lit(null).cast("long"))
            .otherwise(graft.ops.ColumnOps.cents(col("c_acctbal"))).as("bal_cents"))
        .na.fill(Map("seg" -> "(none)", "bal_cents" -> 0L))
        .na.replace("seg", Map("MACHINERY" -> "MACH"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
           | CASE WHEN seg0 = 'MACHINERY' THEN 'MACH' ELSE seg0 END AS seg,
           | COALESCE(CASE WHEN c_acctbal < 0 THEN NULL
           |               ELSE CAST(round(c_acctbal*100) AS BIGINT) END, 0) AS bal_cents
           |FROM (SELECT c_custkey, c_acctbal,
           |        COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(none)') AS seg0
           |      FROM customer) t
           |ORDER BY c_custkey""".stripMargin))

  /** Corpus top-10 bigrams: per-doc adjacent-token pairs built by a pure
    * array expression (sequence + element_at — no window, no self-join),
    * exploded and hash-aggregated. The n-gram mining shape: one narrow
    * projection + one count shuffle regardless of corpus size. */
  val tBigrams: Q = Q(
    "t_bigrams",
    (spark, dir) => {
      val toks = split(lower(col("text")), " ")
      Tables(spark, dir, "documents")
        .select(toks.as("l"))
        .filter(size(col("l")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("l")) - 1),
          i => concat(element_at(col("l"), i), lit(" "), element_at(col("l"), i + 1)))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(10)
    },
    Some("""WITH l AS (SELECT string_split(lower(text), ' ') AS l
           |          FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
           |b AS (SELECT unnest(list_transform(range(1, len(l)),
           |               i -> l[i] || ' ' || l[i+1])) AS bigram FROM l)
           |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
           |FROM b GROUP BY bigram ORDER BY n DESC, bigram LIMIT 10""".stripMargin))

  /** Percentile-threshold outliers: per-priority p99 of the exact cents
    * measure (percentile/quantile_cont agree bit-for-bit on integer
    * inputs — the proven a_percentile pattern), broadcast the 5-row
    * threshold table back onto orders, keep the exceeders. The anomaly
    * audit shape: one agg + one broadcast join, no window over the fact
    * table. */
  val xOutliers: Q = Q(
    "x_outliers",
    (spark, dir) => {
      val o = Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          graft.ops.ColumnOps.cents(col("o_totalprice")).as("price_cents"))
      val thr = o.groupBy(col("o_orderpriority"))
        .agg(percentile(col("price_cents"), lit(0.99)).as("p99"))
      o.join(broadcast(thr), "o_orderpriority")
        .filter(col("price_cents").cast("double") > col("p99"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("price_cents"))
        .orderBy("o_orderkey")
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderpriority,
           |             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
           |           FROM orders),
           |t AS (SELECT o_orderpriority, quantile_cont(price_cents, 0.99) AS p99
           |      FROM o GROUP BY o_orderpriority)
           |SELECT o.o_orderkey, o.o_orderpriority, o.price_cents
           |FROM o JOIN t USING (o_orderpriority)
           |WHERE CAST(o.price_cents AS DOUBLE) > t.p99
           |ORDER BY o.o_orderkey""".stripMargin))

  /** Keyset-free pagination: ORDER BY ... LIMIT k OFFSET n (Spark 3.4+).
    * The physical plan stays a global-sort-free TakeOrdered of n+k rows —
    * fine for UI pages; deep pagination at scale should switch to keyset
    * (WHERE key > last_seen ORDER BY key LIMIT k), noted here. */
  val sOffset: Q = Q(
    "s_offset",
    (spark, dir) => {
      Tables(spark, dir, "orders").createOrReplaceTempView("orders")
      spark.sql(
        """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
          |FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 20 OFFSET 40""".stripMargin)
    },
    Some("""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
           |FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 20 OFFSET 40""".stripMargin))

  val all: Seq[Q] = Seq(aStringAgg, fLambda, qNaFill, tBigrams,
    xOutliers, sOffset)
}
