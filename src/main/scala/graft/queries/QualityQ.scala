package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Data-quality operators: declarative constraint audit and histogram
  * binning — the pre-flight pass every pipeline runs before committing
  * 100 TB of output.
  */
object QualityQ {

  /** Constraint audit: each rule is a conditional count (single scan per
    * table, conditions fused), FK orphans via anti-join counts. One long
    * row per rule. The fused-scan shape matters at scale: N column rules
    * cost one pass, not N. (l_quantity_le_45 is a deliberately tight
    * threshold so the audit demonstrably reports nonzero violations.) */
  val qConstraints: Q = Q(
    "q_constraints",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      val ord = Tables(spark, dir, "orders")
      val cust = Tables(spark, dir, "customer")
      val colRules = li.agg(
        count_if(col("l_quantity").isNull || col("l_quantity") <= 0).as("l_quantity_pos"),
        count_if(col("l_discount") < 0 || col("l_discount") > lit(0.1)).as("l_discount_range"),
        count_if(col("l_quantity") > 45).as("l_quantity_le_45"))
        .unpivot(Array.empty, Array(col("l_quantity_pos"), col("l_discount_range"),
          col("l_quantity_le_45")), "rule", "n_viol")
      val fkLineitem = li.join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(lit("lineitem_fk_orders").as("rule"), count(lit(1)).as("n_viol"))
      val fkOrders = ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(lit("orders_fk_customer").as("rule"), count(lit(1)).as("n_viol"))
      colRules.unionAll(fkLineitem).unionAll(fkOrders).orderBy("rule")
    },
    Some("""SELECT 'l_quantity_pos' AS rule,
           |  COUNT(*) FILTER (WHERE l_quantity IS NULL OR l_quantity <= 0) AS n_viol FROM lineitem
           |UNION ALL SELECT 'l_discount_range',
           |  COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
           |UNION ALL SELECT 'l_quantity_le_45',
           |  COUNT(*) FILTER (WHERE l_quantity > 45) FROM lineitem
           |UNION ALL SELECT 'lineitem_fk_orders',
           |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           |UNION ALL SELECT 'orders_fk_customer',
           |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           |ORDER BY rule""".stripMargin))

  /** Fixed-width histogram with a clamped top bin: one hash aggregation,
    * bin count independent of data size. */
  val aHistogram: Q = Q(
    "a_histogram",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(least(floor(col("l_extendedprice") / 10000), lit(9)).cast("long").as("bin"))
        .agg(
          count(lit(1)).as("n"),
          min(cents(col("l_extendedprice"))).as("min_cents"),
          max(cents(col("l_extendedprice"))).as("max_cents"))
        .orderBy("bin"),
    Some("""SELECT least(CAST(floor(l_extendedprice / 10000) AS BIGINT), 9) AS bin,
           |  COUNT(*) AS n,
           |  MIN(CAST(round(l_extendedprice*100) AS BIGINT)) AS min_cents,
           |  MAX(CAST(round(l_extendedprice*100) AS BIGINT)) AS max_cents
           |FROM lineitem GROUP BY 1 ORDER BY bin""".stripMargin))

  /** Distribution-drift audit (round 10): compare the order-value
    * distribution before vs after a pivot date (1998-01-01) — the
    * monitoring question "did this feed's distribution move?" asked
    * before committing a retrain. Per fixed-width value bin: early/late
    * populations, each side's share in basis points (integer division,
    * exact), and the per-bin share drift |early_bp − late_bp| — the
    * L1/total-variation drift in exact integer arithmetic (a chi-square
    * or PSI formulation needs logs/divisions that hash-diverge across
    * engines; the TV distance carries the same signal and stays exact).
    *
    * Scale shape: ONE scan of the fact table fuses both period counts
    * (conditional aggregates per bin — the bin count is a constant 10);
    * side totals come from the bounded bin frame, not a second scan; the
    * share math is a broadcast of one row. Linear at 100 TB. */
  val qDrift: Q = Q(
    "q_drift",
    (spark, dir) => {
      val bins = Tables(spark, dir, "orders")
        .groupBy(least(floor(col("o_totalprice") / 50000), lit(9)).cast("long").as("bin"))
        .agg(
          count_if(col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("n_early"),
          count_if(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")).as("n_late"))
        .localCheckpoint() // bounded (≤10 rows); feeds totals + share math
      val totals = bins.agg(sum(col("n_early")).as("tot_early"),
        sum(col("n_late")).as("tot_late"))
      bins.crossJoin(broadcast(totals))
        .withColumn("share_early_bp", (col("n_early") * 10000 / col("tot_early")).cast("long"))
        .withColumn("share_late_bp", (col("n_late") * 10000 / col("tot_late")).cast("long"))
        .withColumn("drift_bp", abs(col("share_early_bp") - col("share_late_bp")))
        .select(col("bin"), col("n_early"), col("n_late"),
          col("share_early_bp"), col("share_late_bp"), col("drift_bp"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (
           |  SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) AS bin,
           |    CAST(COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1998-01-01') AS BIGINT) AS n_early,
           |    CAST(COUNT(*) FILTER (WHERE o_orderdate >= TIMESTAMP '1998-01-01') AS BIGINT) AS n_late
           |  FROM orders GROUP BY 1),
           |t AS (SELECT SUM(n_early) AS tot_early, SUM(n_late) AS tot_late FROM b)
           |SELECT bin, n_early, n_late,
           |  CAST(n_early * 10000 // tot_early AS BIGINT) AS share_early_bp,
           |  CAST(n_late * 10000 // tot_late AS BIGINT) AS share_late_bp,
           |  abs(CAST(n_early * 10000 // tot_early AS BIGINT)
           |      - CAST(n_late * 10000 // tot_late AS BIGINT)) AS drift_bp
           |FROM b, t ORDER BY bin""".stripMargin))

  /** Classifier confusion matrix (round 10): the model-evaluation
    * aggregate — t_langid's heuristic predictions crossed against the
    * labeled `lang` column, one row per (true label, predicted class)
    * cell with the count and its share of the true-label row total in
    * exact basis points (integer division — a float rate would be the
    * only nondeterminism in an otherwise exact count table). The label
    * sets differ (en/de/es/fr/zh vs en/db/spark) exactly as they do when
    * auditing a weak heuristic against curated labels.
    *
    * Scale shape: the prediction is a pure column expression, so the
    * matrix is ONE map-side-combinable hash aggregate to a (labels ×
    * classes)-bounded frame; row totals come from a window over that
    * bounded frame. */
  val qConfusion: Q = Q(
    "q_confusion",
    (spark, dir) => {
      import graft.queries.TextQ.{dbSet, enSet, hits, sparkSet}
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      Tables(spark, dir, "documents")
        .select(col("lang"),
          when(hits(enSet) >= hits(dbSet) && hits(enSet) >= hits(sparkSet), "en")
            .when(hits(dbSet) >= hits(sparkSet), "db")
            .otherwise("spark").as("guess"))
        .groupBy(col("lang"), col("guess"))
        .agg(count(lit(1)).as("n"))
        .withColumn("row_total", sum(col("n")).over(w))
        .select(col("lang"), col("guess"), col("n"), col("row_total"),
          expr("n * 10000 div row_total").as("share_bp"))
        .orderBy(col("lang"), col("guess"))
    },
    Some(s"""WITH pred AS (
            |  SELECT lang,
            |    CASE WHEN ${TextQ.hitsSql(TextQ.enSet)} >= ${TextQ.hitsSql(TextQ.dbSet)}
            |           AND ${TextQ.hitsSql(TextQ.enSet)} >= ${TextQ.hitsSql(TextQ.sparkSet)} THEN 'en'
            |         WHEN ${TextQ.hitsSql(TextQ.dbSet)} >= ${TextQ.hitsSql(TextQ.sparkSet)} THEN 'db'
            |         ELSE 'spark' END AS guess
            |  FROM documents),
            |m AS (SELECT lang, guess, COUNT(*) AS n FROM pred GROUP BY 1, 2)
            |SELECT lang, guess, n,
            |  CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS row_total,
            |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS share_bp
            |FROM m ORDER BY lang, guess""".stripMargin))

  /** Join-key skew diagnostic (round 10) — the pre-flight check before
    * any big shuffle: the 10 hottest l_partkey values with their row
    * counts, each row carrying the global context (distinct keys, total
    * rows, max frequency) and the skew ratio max·n_keys/n_rows in exact
    * basis points — 10000 bp = perfectly uniform; the salting/AQE-skew
    * decision threshold reads straight off this number.
    *
    * Scale shape: one map-side-combinable aggregate to the key grain,
    * TakeOrderedAndProject for the top-10, and the three global scalars
    * re-aggregate the KEY-GRAIN frame (never a second fact scan) onto a
    * one-row broadcast. The exact plan you'd run on a 100 TB join input
    * to decide its shuffle strategy. Int64 domain: the numerator
    * max_freq·n_keys·10⁴ needs max_freq·n_keys < 9.2e14 — holds for any
    * realistic skew profile (a hot key implies few rows elsewhere, so
    * max_freq·n_keys ≈ skew_ratio·n_rows); the simultaneous
    * one-key-holds-trillions AND billions-of-keys corner would take the
    * DECIMAL form of this expression. */
  val qSkew: Q = Q(
    "q_skew",
    (spark, dir) => {
      val freq = Tables(spark, dir, "lineitem")
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("freq"))
        .localCheckpoint() // key grain feeds the top-10 AND the scalars
      val tot = freq.agg(count(lit(1)).as("n_keys"), sum(col("freq")).as("n_rows"),
        max(col("freq")).as("max_freq"))
      freq.orderBy(col("freq").desc, col("l_partkey")).limit(10)
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("freq"), col("n_keys"), col("n_rows"),
          col("max_freq"),
          expr("max_freq * n_keys * 10000 div n_rows").as("skew_bp"))
        .orderBy(col("freq").desc, col("l_partkey"))
    },
    Some("""WITH freq AS (
           |  SELECT l_partkey, COUNT(*) AS freq FROM lineitem GROUP BY 1),
           |tot AS (
           |  SELECT COUNT(*) AS n_keys, CAST(SUM(freq) AS BIGINT) AS n_rows,
           |         MAX(freq) AS max_freq
           |  FROM freq),
           |top AS (
           |  SELECT l_partkey, freq FROM freq
           |  ORDER BY freq DESC, l_partkey LIMIT 10)
           |SELECT l_partkey, freq, n_keys, n_rows, max_freq,
           |  CAST(max_freq * n_keys * 10000 // n_rows AS BIGINT) AS skew_bp
           |FROM top CROSS JOIN tot
           |ORDER BY freq DESC, l_partkey""".stripMargin))

  /** Exact ROC-AUC (round 12): the Mann–Whitney rank statistic for "does
    * event value predict purchase", with ties at half weight — the
    * threshold-free companion of `q_confusion`'s fixed-threshold
    * cross-tab. AUC·(2·n_pos·n_neg) = 2·(concordant pairs) + (tied
    * pairs), accumulated per DISTINCT score: for score s with pos_s/neg_s
    * counts, concordant += pos_s · (negatives strictly below s), tied +=
    * pos_s·neg_s. Everything is exact int64 (num2/den2 carried, auc in
    * truncating basis points), so the statistic hash-matches across
    * engines — no float rank averaging.
    *
    * Scale shape: evaluation runs on the FIXED eval cohort (event_id <
    * 50000, sf-independent like d_decontam's eval set — AUC at 100 TB is
    * scored on a held-out set, not the corpus), so the score grain and
    * its cumulative window are bounded by cohort size; the only
    * corpus-side work is the pushed-down cohort scan + one map-side-
    * combinable aggregate to that bounded grain. An unbounded-corpus AUC
    * would swap the window for a `DistributedPrefix` score-range-blocked
    * running sum (the x_decile_lift shape) unchanged. */
  val qAuc: Q = Q(
    "q_auc",
    (spark, dir) => {
      val ev = Tables(spark, dir, "events")
        .filter(col("event_id") < 50000L)
        .select(cents(col("value")).as("score_cents"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      val g = ev.groupBy(col("score_cents"))
        .agg(sum(col("pos")).as("pos_s"), sum(lit(1L) - col("pos")).as("neg_s"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_cents"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      g.withColumn("neg_below", sum(col("neg_s")).over(w) - col("neg_s"))
        .agg(sum(col("pos_s")).as("n_pos"), sum(col("neg_s")).as("n_neg"),
          (sum(col("pos_s") * col("neg_below")) * 2 +
            sum(col("pos_s") * col("neg_s"))).as("num2"))
        .select(col("n_pos"), col("n_neg"), col("num2"),
          expr("num2 * 10000 DIV (2 * n_pos * n_neg)").as("auc_bp"))
    },
    Some("""WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS score_cents,
           |     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
           |   FROM events WHERE event_id < 50000),
           |g AS (SELECT score_cents, SUM(pos) AS pos_s, SUM(1 - pos) AS neg_s
           |   FROM e GROUP BY 1),
           |c AS (SELECT pos_s, neg_s,
           |     SUM(neg_s) OVER (ORDER BY score_cents
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - neg_s AS neg_below
           |   FROM g),
           |s AS (SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           |     CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           |     CAST(2*SUM(pos_s*neg_below) + SUM(pos_s*neg_s) AS BIGINT) AS num2 FROM c)
           |SELECT n_pos, n_neg, num2,
           | CAST(num2 * 10000 // (2 * n_pos * n_neg) AS BIGINT) AS auc_bp FROM s""".stripMargin))

  /** Benford first-digit drift audit — the classic fabricated-data /
    * corrupted-feed detector: naturally occurring amounts have first
    * significant digit d with probability log10(1+1/d); a synthetic or
    * truncated feed flattens toward uniform. Expected proportions are
    * FLOOR(log10(1+1/d)·10⁴) basis-point literals (exact integers on both
    * engines — no runtime float log), observed proportions are integer
    * division over the 9-row digit frame, so the whole audit is
    * hash-exact. One scan + one 9-group hash agg; the partition-less
    * total window runs over 9 rows, never the fact table. TPC-H prices
    * are uniform-ish, so large dev_bp here is the EXPECTED reading — the
    * query is the drift report, not an assertion. */
  val qBenford: Q = Q(
    "q_benford",
    (spark, dir) => {
      val expBp = Map(1 -> 3010L, 2 -> 1760L, 3 -> 1249L, 4 -> 969L,
        5 -> 791L, 6 -> 669L, 7 -> 579L, 8 -> 511L, 9 -> 457L)
      val expCase = expBp.foldLeft(lit(null).cast("long")) {
        case (acc, (d, bp)) => when(col("digit") === d, lit(bp)).otherwise(acc)
      }
      Tables(spark, dir, "orders")
        .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders")).over())
        .select(col("digit"), col("n_orders"),
          expr("n_orders * 10000 div total").as("obs_bp"),
          expCase.as("exp_bp"))
        .withColumn("dev_bp", col("obs_bp") - col("exp_bp"))
        .orderBy(col("digit"))
    },
    Some("""WITH d AS (
           |  SELECT CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
           |           AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |  FROM orders),
           |obs AS (
           |  SELECT digit, COUNT(*) AS n_orders,
           |         SUM(COUNT(*)) OVER () AS total
           |  FROM d GROUP BY digit),
           |exp AS (SELECT * FROM (VALUES (1, 3010), (2, 1760), (3, 1249),
           |  (4, 969), (5, 791), (6, 669), (7, 579), (8, 511), (9, 457))
           |  AS t(digit, exp_bp))
           |SELECT obs.digit, obs.n_orders,
           |       CAST(obs.n_orders * 10000 // obs.total AS BIGINT) AS obs_bp,
           |       CAST(exp.exp_bp AS BIGINT) AS exp_bp,
           |       CAST(obs.n_orders * 10000 // obs.total - exp.exp_bp AS BIGINT) AS dev_bp
           |FROM obs JOIN exp ON obs.digit = exp.digit
           |ORDER BY obs.digit""".stripMargin))

  /** Flag threshold for [[qRowgroupAudit]]: a file whose LARGEST row
    * group holds more rows than this under-parallelizes its scan (row
    * groups are the minimum split unit). In production you would derive
    * this from maxPartitionBytes / average row width; here it is pinned
    * small so the gated fixture exercises the flag at sf0.01 (2 500
    * flagged rows) while staying legitimately unflagged at sf0.001
    * (250 — the oracle's CASE reproduces the same conditionality). */
  private val RgFlagRows = 1000L

  /** Audit fixture: the events table written in two deliberate physical
    * layouts under ONE directory — event_id % 4 != 0 as 3 round-robin
    * files with a 16 KB row-group target (healthy: measured ~300-650
    * rows per group, 3×+ under the flag threshold at any scale — group
    * size tracks the byte target, not the file's row count), and
    * event_id % 4 == 0 as a single file with a 1 GB target (the
    * pathological giant-row-group file the audit exists to catch; at
    * any tested scale it is one group, and were it ever to split past
    * 1 GB each group would still dwarf the threshold, so the
    * max_rg_rows flag — unlike an n_rowgroups==1 flag — matches the
    * oracle at every decade). Content-fingerprinted + atomically
    * published like every cross-session fixture. */
  private def rgFixtureDir(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = Fixtures.fingerprintedPath(
      s"${sys.props("java.io.tmpdir")}/graft_rgaudit2_${sys.props("user.name")}$dirTag",
      Seq(s"$dir/events.parquet"))
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val build = java.nio.file.Files.createTempDirectory("graft_rgaudit_build")
      val ev = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      ev.filter(pmod(col("event_id"), lit(4)) =!= 0)
        .repartition(3)
        .write.option("parquet.block.size", 16384)
        .mode("overwrite").parquet(build.toString)
      ev.filter(pmod(col("event_id"), lit(4)) === 0)
        .coalesce(1)
        .write.option("parquet.block.size", 1073741824)
        .mode("append").parquet(build.toString)
      // The oracle pins n_files = 4 (3 round-robin + 1 coalesced). That
      // couples the gate to repartition(3)/coalesce(1) materializing
      // exactly 4 part files — fail HERE, at fixture build, if a layout
      // writer change ever shifts the count, instead of hash-failing at
      // the oracle with a misleading signature (ADVICE r16).
      val nData = Option(build.toFile.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_") && !f.getName.startsWith("."))
      require(nData == 4,
        s"rgaudit fixture build produced $nData data files, expected 4 " +
          "(3 round-robin + 1 coalesced) — the writer's layout behavior " +
          "changed; q_rowgroup_audit's oracle n_files must move with it")
      Fixtures.publishDir(build, path)
    }
    path
  }

  /** Parquet row-group layout audit under the gate
    * ([[graft.ops.RowGroupAudit]], round-15 verdict task #6): footers
    * only, no data pages — flags files whose largest row group holds
    * more rows than the scan-parallelism threshold (row groups are the
    * minimum split unit, so such a file under-parallelizes its scan no
    * matter what maxPartitionBytes says). Gated columns pin the audit
    * end-to-end against the deterministic fixture: file count (3
    * healthy round-robin files + 1 pathological), the flagged file and
    * its exact row count (= the event_id % 4 == 0 class, conditional on
    * the threshold exactly as the oracle's CASE), and total footer rows
    * == COUNT(*) of the source table — the self-consistency check that
    * the audit accounts for every row without reading any. */
  val qRowgroupAudit: Q = Q(
    "q_rowgroup_audit",
    (spark, dir) => {
      val fx = rgFixtureDir(spark, dir)
      val flagged = col("max_rg_rows") > RgFlagRows
      graft.ops.RowGroupAudit.audit(spark, fx)
        .agg(count(lit(1)).as("n_files"),
          sum(when(flagged, 1L).otherwise(0L)).as("flagged_files"),
          sum(when(flagged, col("n_rows")).otherwise(0L)).as("flagged_rows"),
          sum(col("n_rows")).as("total_rows"))
    },
    Some(s"""SELECT CAST(4 AS BIGINT) AS n_files,
            |  CAST(CASE WHEN COUNT(*) FILTER (WHERE event_id % 4 = 0) > $RgFlagRows
            |       THEN 1 ELSE 0 END AS BIGINT) AS flagged_files,
            |  CAST(CASE WHEN COUNT(*) FILTER (WHERE event_id % 4 = 0) > $RgFlagRows
            |       THEN COUNT(*) FILTER (WHERE event_id % 4 = 0) ELSE 0 END AS BIGINT) AS flagged_rows,
            |  COUNT(*) AS total_rows
            |FROM events""".stripMargin))

  val all: Seq[Q] = Seq(qConstraints, aHistogram, qDrift, qConfusion, qSkew, qAuc,
    qBenford, qRowgroupAudit)
}
