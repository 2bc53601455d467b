package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** ML feature-prep operators (round 6): equal-frequency discretization,
  * fixed-point min-max scaling, and dedup survivorship — the last-mile
  * transforms between a cleaned corpus/fact table and a training matrix.
  * All exact-integer formulations (scaling emits parts-per-million ints,
  * not floats) so the oracle hash is stable and partials merge.
  */
object MlPrepQ {

  /** Equal-frequency (quantile) binning: exact ntile(10) over account
    * balance → per-bin population and bounds, WITHOUT a single global
    * sort. ntile(k) is a closed form of the global row number rn and the
    * total N (the first N%k bins get one extra row), so the query
    * computes rn with the two-pass distributed prefix sum
    * ([[graft.ops.DistributedPrefix]]: balance-range blocks, per-block
    * row counts, broadcast offsets + block-local row_number) and derives
    * the bin with exact integer arithmetic — no partition-less window
    * ever touches the customer grain, which grows with the data (the
    * round-6 scale flag). The tiebreak key keeps the underlying order
    * total and deterministic. */
  val eQuantizeBins: Q = Q(
    "e_quantize_bins",
    (spark, dir) => {
      val base = Tables(spark, dir, "customer")
        .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
        // One materialization of the 2-column projection feeds the bounds
        // agg + both prefix-sum passes (was 3 customer scans in the
        // executed plan) — checkpoint blocks re-read without re-decoding
        // parquet.
        .localCheckpoint()
      val bounds = base.agg(count(lit(1)).as("n_total"),
        min(col("bal_cents")).as("blo"), max(col("bal_cents")).as("bhi"))
      val rn = graft.ops.DistributedPrefix.runningSum(
        base.crossJoin(broadcast(bounds)),
        block = graft.ops.DistributedPrefix.rangeBucket(
          col("bal_cents"), col("blo"), col("bhi"), 64),
        blockAsc = true,
        localOrder = Seq(col("bal_cents"), col("c_custkey")),
        value = lit(1L),
        out = "rn")
      // ntile(k) closed form: q = N DIV k rows per bin, the first N % k
      // bins carry one extra. Integer DIV keeps it exact; the q = 0
      // corner (N < k) resolves entirely in the first branch (bin = rn).
      rn.withColumn("bin", expr(
          """CASE WHEN rn <= (n_total % 10) * (n_total DIV 10 + 1)
            |     THEN (rn + n_total DIV 10) DIV (n_total DIV 10 + 1)
            |     ELSE n_total % 10
            |          + (rn - (n_total % 10) * (n_total DIV 10 + 1)
            |             + n_total DIV 10 - 1) DIV (n_total DIV 10)
            |END""".stripMargin).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("bal_cents")).as("lo_cents"),
          max(col("bal_cents")).as("hi_cents"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (
           |  SELECT CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
           |         CAST(ntile(10) OVER (ORDER BY CAST(round(c_acctbal*100) AS BIGINT), c_custkey) AS BIGINT) AS bin
           |  FROM customer)
           |SELECT bin, COUNT(*) AS n, MIN(bal_cents) AS lo_cents, MAX(bal_cents) AS hi_cents
           |FROM b GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Min-max scaling to fixed-point parts-per-million: one global
    * (min, max) aggregate broadcast as a single row, then a map-only
    * projection computes (x - min) * 1e6 DIV (max - min). Integer
    * division keeps both engines bit-identical — float scaling would
    * hash-diverge on rounding. Plan shape: agg (tiny) + broadcast +
    * narrow projection — the normalization pass that costs one scan at
    * any scale. */
  val eFeatureScale: Q = Q(
    "e_feature_scale",
    (spark, dir) => {
      val s = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), cents(col("s_acctbal")).as("bal_cents"))
      val mm = s.agg(min(col("bal_cents")).as("lo"), max(col("bal_cents")).as("hi"))
      s.filter(col("s_suppkey") <= 100)
        .crossJoin(broadcast(mm))
        .select(col("s_suppkey"), col("bal_cents"),
          // greatest(hi - lo, 1) guards the all-equal-balance corner: Spark
          // DIV 0 yields NULL while DuckDB // 0 raises, so the engines would
          // diverge instead of both emitting 0.
          expr("(bal_cents - lo) * 1000000 DIV greatest(hi - lo, 1)").as("scaled_ppm"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH mm AS (
           |  SELECT MIN(CAST(round(s_acctbal*100) AS BIGINT)) AS lo,
           |         MAX(CAST(round(s_acctbal*100) AS BIGINT)) AS hi
           |  FROM supplier)
           |SELECT s_suppkey, CAST(round(s_acctbal*100) AS BIGINT) AS bal_cents,
           |       ((CAST(round(s_acctbal*100) AS BIGINT) - lo) * 1000000) // greatest(hi - lo, 1) AS scaled_ppm
           |FROM supplier, mm WHERE s_suppkey <= 100
           |ORDER BY s_suppkey""".stripMargin))

  /** Dedup survivorship (canonical record selection): after exact-dup
    * grouping on the content fingerprint, each group elects ONE
    * canonical row by an explicit precedence (longest text, then lowest
    * doc_id) — the "keep best, not keep first" contract record-linkage
    * pipelines need. One hash agg with an argmax-struct (partial-
    * aggregatable; no window, no shuffle of full texts — only the
    * 16-byte fingerprint and the 2-field precedence tuple move). */
  val dSurvivor: Q = Q(
    "d_survivor",
    (spark, dir) => {
      Tables(spark, dir, "documents")
        .select(md5(col("text")).as("fp"), col("doc_id"), col("n_chars"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_dups"),
          max(struct(col("n_chars").as("nc"), (-col("doc_id")).as("neg_id")))
            .as("best"))
        .select(col("fp"), col("n_dups"),
          (-col("best.neg_id")).as("canonical_doc_id"),
          col("best.nc").as("canonical_chars"))
        .orderBy(col("fp"))
    },
    Some("""WITH g AS (
           |  SELECT md5(text) AS fp, doc_id, n_chars,
           |         row_number() OVER (PARTITION BY md5(text)
           |           ORDER BY n_chars DESC, doc_id) AS rn,
           |         COUNT(*) OVER (PARTITION BY md5(text)) AS n_dups
           |  FROM documents)
           |SELECT fp, CAST(n_dups AS BIGINT) AS n_dups,
           |       doc_id AS canonical_doc_id, n_chars AS canonical_chars
           |FROM g WHERE rn = 1 ORDER BY fp""".stripMargin))

  /** Model lift / gains table (round 10): score the customer base (score =
    * account balance in cents, the stand-in for a model score), define the
    * response as "placed an order on/after 2001-01-01", decile the
    * population by score descending, and report per decile the response
    * rate and the lift vs the base rate — the standard campaign-targeting
    * readout. All rates in exact integer basis points:
    * lift_bp = n_resp·N·10000 DIV (n·R) (fits int64 through sf100).
    *
    * Scale shape: the responder flag is a semi-join-shaped left join
    * against the aggregated recent-buyer keys (key grain, not order
    * grain); the decile is exact ntile(10) via the two-pass
    * [[graft.ops.DistributedPrefix]] (score-range blocks), never a
    * partition-less window over the growing customer grain; rate math
    * runs on the bounded 10-row decile frame. */
  /** The pre-checkpoint decile aggregate of [[xDecileLift]] — exposed so
    * PlanAuditSpec can audit the prefix-rank window shape that the
    * query's localCheckpoint truncates out of its own plan. */
  private[graft] def decileFrame(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val recent = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val base = Tables(spark, dir, "customer")
      .select(col("c_custkey"), cents(col("c_acctbal")).as("score"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("resp", when(col("o_custkey").isNotNull, lit(1L)).otherwise(lit(0L)))
      .drop("o_custkey")
      .localCheckpoint() // feeds bounds + prefix pass
    val bounds = base.agg(count(lit(1)).as("n_total"),
      min(col("score")).as("slo"), max(col("score")).as("shi"))
    val rn = graft.ops.DistributedPrefix.runningSum(
      base.crossJoin(broadcast(bounds)).withColumn("neg_s", -col("score")),
      block = graft.ops.DistributedPrefix.rangeBucket(
        col("neg_s"), -col("shi"), -col("slo"), 64),
      blockAsc = true,
      localOrder = Seq(col("neg_s"), col("c_custkey")),
      value = lit(1L),
      out = "rn")
    rn.withColumn("decile", expr(
        """CASE WHEN rn <= (n_total % 10) * (n_total DIV 10 + 1)
          |     THEN (rn + n_total DIV 10) DIV (n_total DIV 10 + 1)
          |     ELSE n_total % 10
          |          + (rn - (n_total % 10) * (n_total DIV 10 + 1)
          |             + n_total DIV 10 - 1) DIV (n_total DIV 10)
          |END""".stripMargin).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("resp")).as("n_resp"))
  }

  val xDecileLift: Q = Q(
    "x_decile_lift",
    (spark, dir) => {
      val deciles = decileFrame(spark, dir)
        .localCheckpoint() // bounded (10 rows); feeds totals + rate math
      val totals = deciles.agg(sum(col("n")).as("pop"), sum(col("n_resp")).as("resp_tot"))
      deciles.crossJoin(broadcast(totals))
        .withColumn("resp_bp", (col("n_resp") * 10000 / col("n")).cast("long"))
        .withColumn("lift_bp",
          (col("n_resp") * col("pop") * 10000 / (col("n") * col("resp_tot"))).cast("long"))
        .select(col("decile"), col("n"), col("n_resp"), col("resp_bp"), col("lift_bp"))
        .orderBy(col("decile"))
    },
    Some("""WITH r AS (SELECT DISTINCT o_custkey FROM orders
           |  WHERE o_orderdate >= TIMESTAMP '2001-01-01'),
           |b AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS score,
           |    CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS resp
           |  FROM customer c LEFT JOIN r ON r.o_custkey = c.c_custkey),
           |d AS (SELECT CAST(ntile(10) OVER (ORDER BY score DESC, c_custkey) AS BIGINT) AS decile,
           |    resp FROM b),
           |g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(resp) AS BIGINT) AS n_resp FROM d GROUP BY decile),
           |t AS (SELECT SUM(n) AS pop, SUM(n_resp) AS resp_tot FROM g)
           |SELECT decile, n, n_resp,
           |  CAST(n_resp * 10000 // n AS BIGINT) AS resp_bp,
           |  CAST(n_resp * pop * 10000 // (n * resp_tot) AS BIGINT) AS lift_bp
           |FROM g, t ORDER BY decile""".stripMargin))

  /** Hashing-trick featurization (feature hashing / "the hashing trick"):
    * bag-of-words token counts projected into a FIXED 64-dim feature
    * space by hashing each token, no vocabulary ever materialized — the
    * property that makes text featurization scale-free: at 100 TB the
    * vocab grows unboundedly but the feature space, the model width and
    * this plan's state stay constant. Output is the sparse (doc, feature,
    * count) triple grain a trainer consumes, over the bounded doc_id<50
    * eval cohort (whole-corpus featurization is the same plan minus the
    * cohort filter).
    *
    * Plan: row-local split/explode/hash chain + ONE hash agg on
    * (doc_id, feature); tokens are normalized to 8 chars (rpad/truncate)
    * so the cross-engine polynomial hash ([[graft.ops.TextHash]]) is a
    * fixed-length exact-integer chain on both engines. Collisions are
    * part of the operator's contract (64 bins << vocab), not a bug. */
  val eFeatureHash: Q = Q(
    "e_feature_hash",
    (spark, dir) => {
      import graft.ops.TextHash
      Tables(spark, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
        .filter(length(col("tok")) >= 2)
        .withColumn("feature",
          TextHash.polyHash(rpad(col("tok"), 8, "_"), 8) % 64L)
        .groupBy(col("doc_id"), col("feature"))
        .agg(count(lit(1)).as("n"))
        .orderBy("doc_id", "feature")
    },
    Some(s"""WITH toks AS (
            |  SELECT doc_id,
            |         unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
            |  FROM documents WHERE doc_id < 50),
            |f AS (
            |  SELECT doc_id,
            |         ${graft.ops.TextHash.polyHashSql("rpad(tok, 8, '_')", 8)} % 64 AS feature
            |  FROM toks WHERE length(tok) >= 2)
            |SELECT doc_id, feature, COUNT(*) AS n
            |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[Q] = Seq(eQuantizeBins, eFeatureScale, dSurvivor, xDecileLift,
    eFeatureHash)
}
