package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Join extensions (round 5): interval-overlap join via bin explosion, and
  * blocked edit-distance (fuzzy) matching — the two join shapes that turn
  * quadratic at scale unless reformulated as equi-joins.
  */
object JoinExtQ {

  /** Interval-overlap join, binned. Each lineitem carries a synthetic
    * service interval [l_shipdate, l_shipdate + (qty % 14 + 1) days]; the
    * query counts items whose interval overlaps each calendar month.
    *
    * The naive formulation (`a.start < b.end AND a.end >= b.start`) has no
    * equi-key, so Spark plans a nested-loop join — O(n·m) and a 100 TB
    * killer. The scale formulation EXPLODES each interval into the month bins
    * it touches (`sequence(trunc(start), trunc(end), 1 month)`): overlap
    * with a month-aligned bin is then EXACTLY bin equality, so the join
    * (here: the groupBy) is hash-partitioned on the bin key and never
    * compares non-overlapping pairs. Fan-out is bounded by interval
    * length / bin width (≤ 2 bins at 15 days / 1 month); for general
    * two-sided interval joins the same explode feeds an equi-join on bin
    * plus an exact residual predicate. Audited in PlanAuditSpec: the plan
    * contains no BroadcastNestedLoopJoin/CartesianProduct.
    *
    * Oracle: DuckDB runs the NAIVE overlap join against a distinct-month
    * calendar — same semantics, independent formulation. The calendar is
    * built from BOTH interval endpoints (start and end months): a month
    * reached only by an interval's tail (no shipdate falls inside it)
    * is a real bin on the Spark side, so a shipdate-only calendar would
    * undercount whenever the data's date range ends mid-interval.
    */
  val jIntervalOverlap: Q = Q(
    "j_interval_overlap",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(
          col("l_shipdate").as("s"),
          expr("l_shipdate + make_interval(0, 0, 0, CAST(l_quantity AS INT) % 14 + 1)").as("e"))
      li.select(explode(expr("sequence(date_trunc('month', s), date_trunc('month', e), interval 1 month)")).as("m"))
        // aggregate on the native month timestamp; format the label on the
        // bounded bin frame (per-row date_format over the explode grain
        // was the x_yoy_growth 100×-probe anti-pattern)
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_items"))
        .select(date_format(col("m"), "yyyy-MM").as("ship_month"), col("n_items"))
        .orderBy("ship_month")
    },
    Some("""WITH i AS (
           |  SELECT l_shipdate AS s,
           |         l_shipdate + to_days(CAST(l_quantity AS INT) % 14 + 1) AS e
           |  FROM lineitem),
           |m AS (SELECT DISTINCT date_trunc('month', d) AS m0 FROM (
           |  SELECT l_shipdate AS d FROM lineitem
           |  UNION ALL
           |  SELECT l_shipdate + to_days(CAST(l_quantity AS INT) % 14 + 1) FROM lineitem))
           |SELECT strftime(m.m0, '%Y-%m') AS ship_month, COUNT(*) AS n_items
           |FROM m JOIN i ON i.s < m.m0 + INTERVAL 1 MONTH AND i.e >= m.m0
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Fuzzy (edit-distance) self-match over part names, blocked. All-pairs
    * levenshtein is O(n²) — never viable at scale. The standard fix is
    * BLOCKING: only compare candidates sharing a cheap blocking key (here
    * p_brand — in a real corpus: a phonetic key, length bucket, or LSH
    * band), so the join is an equi-join on the block and the quadratic
    * cost is per-block, not global. A `|len(a)-len(b)| <= 4` length
    * filter (implied by lev <= 4, so it drops nothing) prunes before the
    * distance kernel, and the kernel is the THRESHOLDED levenshtein
    * (Spark 3.5+): banded DP that abandons a pair the moment its distance
    * provably exceeds 4 (returns -1), turning the O(len²) kernel into
    * O(len·k) — and abandons distant pairs early. Both engines implement
    * plain unit-cost Levenshtein, so kept distances agree exactly.
    *
    * The match runs over a FIXED-size cohort (p_partkey < 5000, the same
    * sf-independent pattern as the sim_* query sets): per-block pair cost
    * is quadratic BY DESIGN, so the honest scale story is "bound the
    * block size" (finer blocking keys), not "hope the input stays small"
    * — the bench measures the blocked-join machinery, not an O(n²) blowup
    * that grows with sf.
    */
  val jFuzzyName: Q = Q(
    "j_fuzzy_name",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .filter(col("p_partkey") < 5000)
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val a = p.select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("brand_b"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b,
          col("p_brand") === col("brand_b") &&
            col("key_a") < col("key_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= 4)
        .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 4))
        .filter(col("dist") >= 0) // thresholded kernel marks >4 as -1
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_pairs"),
          min(col("dist")).as("min_dist"))
        .orderBy("p_brand")
    },
    Some("""SELECT a.p_brand, COUNT(*) AS n_pairs,
           | MIN(levenshtein(a.p_name, b.p_name)) AS min_dist
           |FROM part a JOIN part b
           |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
           | AND abs(length(a.p_name) - length(b.p_name)) <= 4
           | AND a.p_partkey < 5000 AND b.p_partkey < 5000
           |WHERE levenshtein(a.p_name, b.p_name) <= 4
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(jIntervalOverlap, jFuzzyName)
}
