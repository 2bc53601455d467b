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
    * calendar — same semantics, independent formulation.
    */
  val jIntervalOverlap: Q = Q(
    "j_interval_overlap",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(
          col("l_shipdate").as("s"),
          expr("l_shipdate + make_interval(0, 0, 0, CAST(l_quantity AS INT) % 14 + 1)").as("e"))
      li.select(explode(expr("sequence(date_trunc('month', s), date_trunc('month', e), interval 1 month)")).as("m"))
        .groupBy(date_format(col("m"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n_items"))
        .orderBy("ship_month")
    },
    Some("""WITH i AS (
           |  SELECT l_shipdate AS s,
           |         l_shipdate + to_days(CAST(l_quantity AS INT) % 14 + 1) AS e
           |  FROM lineitem),
           |m AS (SELECT DISTINCT date_trunc('month', l_shipdate) AS m0 FROM lineitem)
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
    * O(len²) distance kernel runs. Both engines implement plain
    * Levenshtein (unit costs), so distances agree exactly.
    */
  val jFuzzyName: Q = Q(
    "j_fuzzy_name",
    (spark, dir) => {
      val p = Tables(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val a = p.select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand").as("brand_b"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b,
          col("p_brand") === col("brand_b") &&
            col("key_a") < col("key_b") &&
            abs(length(col("name_a")) - length(col("name_b"))) <= 4)
        .filter(levenshtein(col("name_a"), col("name_b")) <= 4)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_pairs"),
          min(levenshtein(col("name_a"), col("name_b"))).as("min_dist"))
        .orderBy("p_brand")
    },
    Some("""SELECT a.p_brand, COUNT(*) AS n_pairs,
           | MIN(levenshtein(a.p_name, b.p_name)) AS min_dist
           |FROM part a JOIN part b
           |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
           | AND abs(length(a.p_name) - length(b.p_name)) <= 4
           |WHERE levenshtein(a.p_name, b.p_name) <= 4
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(jIntervalOverlap, jFuzzyName)
}
