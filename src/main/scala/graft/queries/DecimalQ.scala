package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** DecimalType surface (round-13 verdict task #4): the engine's money
  * math is integer-cents by design (exact, shuffle-cheap), but a real
  * warehouse user's first query casts to DECIMAL(18,2) — these keys prove
  * decimal parity end-to-end (scan → arithmetic → aggregate → join →
  * overflow), with DuckDB's exact DECIMAL engine as the oracle.
  *
  * Precision-promotion parity notes (why every result column carries an
  * explicit CAST):
  *  - multiplication: Spark promotes p1+p2+1 / DuckDB p1+p2 (both cap at
  *    38 and keep s1+s2) — same VALUES, different declared widths, so
  *    results are pinned to one type on both sides;
  *  - SUM: Spark adds 10 integral digits (p+10), DuckDB jumps to 38;
  *  - AVG on decimals returns DECIMAL(p+4, s+4) in Spark but DOUBLE in
  *    DuckDB, and division promotion diverges similarly (Spark scale
  *    max(6, s1+p2+1), DuckDB keeps dividend-derived scale) — quotient
  *    shapes are therefore NOT oracle-gated here; integer-scaled or
  *    double ratios (the rest of the library) are the portable form.
  *  - ANSI: Spark 4 runs ANSI-on, so an overflowing plain CAST/agg throws
  *    rather than silently nulling — the gateable face of that contract
  *    is try_cast (dec_try_overflow), which must null EXACTLY the rows
  *    outside the target's range, never a value-dependent approximation.
  *
  * 100 TB: decimals here ride the same plans as the cents forms — ONE
  * scan-side cast, hash-agg on group keys, broadcast-able dims — and
  * Spark's Decimal(18,2) aggregation stays in the fast unscaled-long
  * path (precision ≤ 18), so the cost over integer cents is a constant
  * per-row factor, not a plan change.
  */
object DecimalQ {

  /** TPC-H Q1's money pipeline in DECIMAL end-to-end: scan-cast to
    * DECIMAL(18,2), exact decimal complements cast to DECIMAL(8,2)
    * (values ≤ 2.00, no rounding), products and sums left to each
    * engine's promotion and pinned to one declared type at the edge.
    *
    * Gate-facing representation (round-14 verdict task #1): every
    * decimal result column leaves the query as a STRING of the pinned
    * scale. The decimal ARITHMETIC — promotion, exactness — is still
    * what the key tests; only the output surface changes. Raw DECIMAL
    * output columns proved representation-fragile under the driver's
    * stringified-row hash (dec_join r14: values verified exact on both
    * sides, hash red anyway), which is exactly why the Q.scala parity
    * rule says money leaves queries as exact integers or strings. Both
    * engines render a pinned-scale decimal identically (plain notation,
    * full scale: '1234.5000'). */
  val decAgg: Q = Q(
    "dec_agg",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("disc"),
        col("l_tax").cast("decimal(18,2)").as("tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("price")).cast("decimal(38,2)").cast("string").as("sum_base"),
          sum(col("price") * (lit(1) - col("disc")).cast("decimal(8,2)"))
            .cast("decimal(38,4)").cast("string").as("sum_disc"),
          sum(col("price") * (lit(1) - col("disc")).cast("decimal(8,2)")
              * (lit(1) + col("tax")).cast("decimal(8,2)"))
            .cast("decimal(38,6)").cast("string").as("sum_charge"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""WITH li AS (SELECT l_returnflag, l_linestatus,
           |  CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           |  CAST(l_discount AS DECIMAL(18,2)) AS disc,
           |  CAST(l_tax AS DECIMAL(18,2)) AS tax FROM lineitem)
           |SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base,
           |  CAST(CAST(SUM(price * CAST(1 - disc AS DECIMAL(8,2))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc,
           |  CAST(CAST(SUM(price * CAST(1 - disc AS DECIMAL(8,2)) * CAST(1 + tax AS DECIMAL(8,2)))
           |       AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge
           |FROM li GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Overflow behavior under ANSI, the gateable face: try_cast to a
    * deliberately narrow DECIMAL(5,2) (max 999.99 — only the cheapest
    * line items fit) must null EXACTLY the out-of-range rows. The
    * decimal→decimal narrowing is a pure range check (scales equal, no
    * rounding), so both engines must agree row-for-row; n_fit, the
    * surviving sum, and the surviving max pin it. A plain CAST here
    * would THROW under Spark's ANSI default — that contract is spec
    * territory (can't oracle-gate an exception), try_cast is its
    * total-function twin. */
  val decTryOverflow: Q = Q(
    "dec_try_overflow",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_extendedprice").cast("decimal(18,2)").as("price"))
      li.select(expr("try_cast(price AS DECIMAL(5,2))").as("small"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("small")).as("n_fit"),
          sum(col("small")).cast("decimal(38,2)").cast("string").as("sum_fit"),
          max(col("small")).cast("decimal(5,2)").cast("string").as("max_fit"))
    },
    Some("""WITH li AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem),
           |s AS (SELECT TRY_CAST(price AS DECIMAL(5,2)) AS small FROM li)
           |SELECT COUNT(*) AS n_rows, COUNT(small) AS n_fit,
           |  CAST(CAST(SUM(small) AS DECIMAL(38,2)) AS VARCHAR) AS sum_fit,
           |  CAST(CAST(MAX(small) AS DECIMAL(5,2)) AS VARCHAR) AS max_fit
           |FROM s""".stripMargin))

  /** Decimal predicates and arithmetic across a join: the dim side is
    * filtered by a DECIMAL range (a comparison on the scan side — prunes
    * before the join), broadcast-joined to the fact, and the revenue is
    * decimal per-row arithmetic aggregated per brand. At 100 TB the
    * filtered part dim broadcasts exactly like its double twin — decimal
    * columns change nothing about the plan. */
  val decJoin: Q = Q(
    "dec_join",
    (spark, dir) => {
      val part = Tables(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          col("p_retailprice").cast("decimal(12,2)").as("rp"))
        .filter(col("rp") >= lit("925.00").cast("decimal(12,2)") &&
          col("rp") <= lit("975.00").cast("decimal(12,2)"))
      val li = Tables(spark, dir, "lineitem").select(
        col("l_partkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(18,2)").as("disc"))
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("price") * (lit(1) - col("disc")).cast("decimal(8,2)"))
            .cast("decimal(38,4)").cast("string").as("revenue"),
          min(col("rp")).cast("decimal(12,2)").cast("string").as("min_rp"),
          max(col("rp")).cast("decimal(12,2)").cast("string").as("max_rp"))
        .orderBy("p_brand")
    },
    Some("""WITH p AS (SELECT p_partkey, p_brand,
           |    CAST(p_retailprice AS DECIMAL(12,2)) AS rp FROM part
           |  WHERE CAST(p_retailprice AS DECIMAL(12,2)) BETWEEN
           |    CAST('925.00' AS DECIMAL(12,2)) AND CAST('975.00' AS DECIMAL(12,2))),
           |li AS (SELECT l_partkey,
           |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           |    CAST(l_discount AS DECIMAL(18,2)) AS disc FROM lineitem)
           |SELECT p_brand, COUNT(*) AS n_items,
           |  CAST(CAST(SUM(price * CAST(1 - disc AS DECIMAL(8,2))) AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
           |  CAST(CAST(MIN(rp) AS DECIMAL(12,2)) AS VARCHAR) AS min_rp,
           |  CAST(CAST(MAX(rp) AS DECIMAL(12,2)) AS VARCHAR) AS max_rp
           |FROM li JOIN p ON l_partkey = p_partkey
           |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  val all: Seq[Q] = Seq(decAgg, decTryOverflow, decJoin)
}
