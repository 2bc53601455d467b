package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sampling & dataset-splitting operators — the training-data-pipeline
  * surface (hold-out splits, stratified subsamples, cheap row samples)
  * that a 100 TB corpus run needs before any training job.
  *
  * All three are DETERMINISTIC: sampling decisions come from a
  * multiplicative (Knuth) hash of the row key, not an RNG, so results are
  * reproducible across runs, engines, and partitionings — which is (a)
  * what makes them oracle-checkable and (b) what production data-split
  * pipelines want anyway (resharding the input must not reshuffle the
  * split assignment).
  *
  * Scale notes: every operator here is a narrow map + filter (or one
  * window per group for the stratified k); no shuffle for the Bernoulli
  * sample/split, one partial-aggregable shuffle for the summaries. The
  * hash inputs are reduced mod 1e6+3 BEFORE the multiply so the product
  * stays < 2^51 — exact in int64 on any engine, no overflow at any key
  * magnitude.
  */
object SampleQ {

  /** Knuth multiplicative hash → bucket in [0, 1000). */
  private def hashBucket(key: Column): Column =
    (key % 1000003L) * 2654435761L % 1000L
  private def hashBucketSql(key: String): String =
    s"(($key % 1000003) * 2654435761) % 1000"

  /** Deterministic 5% Bernoulli row sample of lineitem (hash-gated, no
    * RNG): survives re-partitioning and re-runs bit-identically. */
  val sampleHash: Q = Q(
    "s_sample_hash",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .filter(hashBucket(col("l_orderkey") * 7 + col("l_linenumber")) < 50)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some(s"""SELECT l_orderkey, l_linenumber,
            | CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
            |FROM lineitem
            |WHERE ${hashBucketSql("(l_orderkey * 7 + l_linenumber)")} < 50
            |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Exact stratified sample: k=10 orders per o_orderstatus stratum,
    * chosen by hash order (deterministic "random" within the stratum).
    * One window per stratum — at 100 TB this is a WindowGroupLimit
    * (partial top-k per partition, then per group), not a full sort. */
  val sampleStratified: Q = Q(
    "s_sample_stratified",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(hashBucket(col("o_orderkey")), col("o_orderkey"))
      Tables(spark, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(
          col("o_orderstatus"), col("rn").cast("long").as("rn"),
          col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
        .orderBy("o_orderstatus", "rn")
    },
    Some(s"""WITH r AS (SELECT o_orderstatus, o_orderkey,
            |   CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
            |   row_number() OVER (PARTITION BY o_orderstatus
            |     ORDER BY ${hashBucketSql("o_orderkey")}, o_orderkey) AS rn
            | FROM orders)
            |SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey, total_cents
            |FROM r WHERE rn <= 10 ORDER BY o_orderstatus, rn""".stripMargin))

  /** Train/val/test split of the documents corpus (80/10/10 by doc_id
    * hash) with per-split size/quality stats — the canonical hold-out
    * split. Assignment is a pure row-local expression (no shuffle); the
    * summary is one partial+final agg. */
  val splitTrainTest: Q = Q(
    "s_split_train_test",
    (spark, dir) => {
      val b = hashBucket(col("doc_id"))
      Tables(spark, dir, "documents")
        .withColumn("split",
          when(b < 800, "train").when(b < 900, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy("split")
    },
    Some(s"""SELECT CASE WHEN ${hashBucketSql("doc_id")} < 800 THEN 'train'
            |            WHEN ${hashBucketSql("doc_id")} < 900 THEN 'val'
            |            ELSE 'test' END AS split,
            | COUNT(*) AS n_docs,
            | CAST(SUM(length(text)) AS BIGINT) AS n_chars,
            | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
            |FROM documents GROUP BY 1 ORDER BY split""".stripMargin))

  /** Deterministic k-fold cross-validation assignment (round 10): fold =
    * Knuth-hash bucket mod 5 of the document key — stable across re-runs
    * and re-partitioning (never an RNG), so every trainer that re-derives
    * the folds gets the same split. The output is the stratification
    * audit: per (fold, lang) document count and character mass, which is
    * how you check a hash split didn't skew a stratum before training on
    * it.
    *
    * Scale shape: one scan, one hash aggregate to the (5 × n_langs)
    * bounded grain — map-side combinable, no join, no window. */
  val sKfold: Q = Q(
    "s_kfold",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select((hashBucket(col("doc_id")) % 5).as("fold"),
          col("lang"), col("n_chars"))
        .groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("fold"), col("lang")),
    Some(s"""SELECT ${hashBucketSql("doc_id")} % 5 AS fold, lang,
            | COUNT(*) AS n_docs,
            | CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            |FROM documents GROUP BY 1, 2
            |ORDER BY fold, lang""".stripMargin))

  /** Exact-size deterministic sample (round 12): the fixed-k counterpart
    * of `s_sample_hash`'s Bernoulli gate — keep EXACTLY k=100 documents,
    * chosen as the k smallest values of a Knuth-hash priority (ties broken
    * by doc_id). This is the distributed reservoir/priority sample: every
    * engine, run, and partitioning draws the same 100 docs, and adding a
    * document to the corpus evicts at most one previous member (the
    * bottom-k-stability property real dataloader samples want).
    *
    * Scale shape: priority is a pure row-local expression, and the plan is
    * TakeOrderedAndProject — each partition keeps a bounded k-heap and only
    * k rows per partition reach the driver-side merge; no global sort, no
    * shuffle of the corpus. The same query at any corpus size moves
    * k × n_partitions rows. */
  val sReservoir: Q = Q(
    "s_reservoir",
    (spark, dir) => {
      // Wide-range priority: reduce mod 1000003 BEFORE the multiply so the
      // product stays < 2^51 (exact in int64 on any engine), then mod 1e9+7
      // so hash ties are vanishingly rare (doc_id breaks the remainder).
      val prio = (col("doc_id") % 1000003L) * 2654435761L % 1000000007L
      Tables(spark, dir, "documents")
        .select(prio.as("priority"), col("doc_id"), col("lang"),
          col("n_chars").cast("long").as("n_chars"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(100)
    },
    Some("""SELECT (doc_id % 1000003) * 2654435761 % 1000000007 AS priority,
           | doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
           |FROM documents
           |ORDER BY priority, doc_id LIMIT 100""".stripMargin))

  /** Majority-class undersampling (class rebalancing): every language is
    * cut to the minority language's document count, members chosen in
    * deterministic hash-priority order — the standard imbalance fix
    * before training a classifier, as a pure relational plan.
    *
    * Plan: one hash agg to per-class counts (tiny, lang-bounded) → min
    * reduced to ONE broadcast row, one row_number window per class, one
    * filter. The per-class window is the only data-sized stage and
    * partitions by lang; at 100 TB you'd first read min_n off the
    * (already tiny) count frame and pass it as a literal so the window
    * collapses to a WindowGroupLimit partial top-k — same plan here
    * minus the broadcast, kept single-plan for oracle parity.
    *
    * ScanAudit note (intentional ×2): the min-count subtree re-scans
    * documents, but it reads ONE column (lang) into a partial agg — a
    * columnar scan of a single dictionary-encoded column, strictly
    * cheaper than materializing the corpus to share the scan. */
  val sUndersample: Q = Q(
    "s_undersample",
    (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val minN = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("min_n"))
      val prio = (col("doc_id") % 1000003L) * 2654435761L % 1000000007L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(prio, col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(minN))
        .filter(col("rn") <= col("min_n"))
        .select(col("lang"), col("rn").cast("long").as("rn"),
          col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        .orderBy("lang", "rn")
    },
    Some("""WITH c AS (
           |  SELECT MIN(cnt) AS min_n
           |  FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)),
           |r AS (
           |  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           |         row_number() OVER (PARTITION BY lang
           |           ORDER BY (doc_id % 1000003) * 2654435761 % 1000000007,
           |                    doc_id) AS rn
           |  FROM documents)
           |SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
           |FROM r, c WHERE rn <= min_n ORDER BY lang, rn""".stripMargin))

  /** Online (Poisson) bootstrap: per (document, replicate) a
    * DETERMINISTIC resampling weight drawn from the Poisson(1) pmf via
    * the Knuth-hash bucket of (doc_id·31 + replicate) — thresholds
    * 368/736/920/981 per mille for w = 0/1/2/3, else 4 — then each
    * replicate's statistics as weight-scaled aggregates. This is how
    * bootstrap confidence intervals are computed at 100 TB: no data is
    * ever resampled or moved, the weight is a row-local expression and
    * each replicate is one more partial-aggregable sum over the same
    * scan (R replicates cost one pass, not R). Hash-derived weights
    * keep the replicate set reproducible across runs, engines and
    * partitionings — same discipline as every sampler here. */
  val sBootstrap: Q = Q(
    "s_bootstrap",
    (spark, dir) => {
      val reps = spark.range(3).select(col("id").as("replicate"))
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
      docs.crossJoin(broadcast(reps))
        .withColumn("b", hashBucket(col("doc_id") * 31L + col("replicate")))
        .withColumn("w",
          when(col("b") < 368, 0L).when(col("b") < 736, 1L)
            .when(col("b") < 920, 2L).when(col("b") < 981, 3L).otherwise(4L))
        .groupBy(col("replicate"))
        .agg(sum(col("w")).as("n_drawn"),
          count(when(col("w") > 0, 1)).as("n_docs_used"),
          sum(col("w") * col("n_chars")).as("chars_drawn"))
        .orderBy(col("replicate"))
    },
    Some(s"""WITH d AS (
            |  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, r.replicate
            |  FROM documents,
            |       (SELECT unnest(generate_series(0, 2)) AS replicate) r),
            |w AS (
            |  SELECT replicate, n_chars,
            |         CASE WHEN ${hashBucketSql("(doc_id * 31 + replicate)")} < 368 THEN 0
            |              WHEN ${hashBucketSql("(doc_id * 31 + replicate)")} < 736 THEN 1
            |              WHEN ${hashBucketSql("(doc_id * 31 + replicate)")} < 920 THEN 2
            |              WHEN ${hashBucketSql("(doc_id * 31 + replicate)")} < 981 THEN 3
            |              ELSE 4 END AS w
            |  FROM d)
            |SELECT CAST(replicate AS BIGINT) AS replicate,
            |       CAST(SUM(w) AS BIGINT) AS n_drawn,
            |       COUNT(CASE WHEN w > 0 THEN 1 END) AS n_docs_used,
            |       CAST(SUM(w * n_chars) AS BIGINT) AS chars_drawn
            |FROM w GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Leakage-safe train/test split: the 80/10-style hash split of
    * [[splitTrainTest]] leaks when near-duplicates land on opposite
    * sides (the eval set "contains" training data it never saw
    * verbatim). Here the unit of assignment is the near-dup CLUSTER
    * (connected components of d_embed_neardup's pair graph; singletons
    * are their own cluster), so an entire duplicate family moves as one
    * — the split decision is the Knuth-hash bucket of the cluster
    * representative, reproducible like every sampler here.
    *
    * Plan: the cluster map is the CC superstep output (bounded by the
    * near-dup cohort); assignment is a left join + row-local hash; the
    * audit is one bounded agg per split. At 100 TB the cluster map is
    * the dedup pipeline's existing artifact — this query is the read
    * path that makes the split honest. */
  val sLeakageSplit: Q = Q(
    "s_leakage_split",
    (spark, dir) => {
      val comp = Registry.byName("d_cluster_cc").run(spark, dir)
      val cohort = Tables(spark, dir, "embeddings")
        .filter(col("vec_id") < 200).select(col("vec_id"))
      cohort.join(comp.select(col("id").as("vec_id"), col("comp")), Seq("vec_id"), "left")
        .withColumn("grp", coalesce(col("comp"), col("vec_id")))
        .withColumn("split",
          when(hashBucket(col("grp")) < 800, "train").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_vecs"),
          countDistinct(col("grp")).as("n_groups"),
          count(col("comp")).as("n_linked"))
        .orderBy("split")
    },
    Some(s"""WITH RECURSIVE
            |${SimilarityQ.nearDupEdgeCte},
            |e AS (SELECT vec_a, vec_b FROM p UNION ALL SELECT vec_b, vec_a FROM p),
            |reach(id, r) AS (
            |  SELECT DISTINCT vec_a, vec_a FROM e
            |  UNION
            |  SELECT e.vec_a, reach.r FROM e JOIN reach ON e.vec_b = reach.id),
            |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
            |a AS (
            |  SELECT em.vec_id, cc.comp,
            |         COALESCE(cc.comp, em.vec_id) AS grp
            |  FROM embeddings em LEFT JOIN cc ON em.vec_id = cc.id
            |  WHERE em.vec_id < 200)
            |SELECT CASE WHEN ${hashBucketSql("grp")} < 800
            |            THEN 'train' ELSE 'test' END AS split,
            |       COUNT(*) AS n_vecs,
            |       COUNT(DISTINCT grp) AS n_groups,
            |       COUNT(comp) AS n_linked
            |FROM a GROUP BY 1 ORDER BY split""".stripMargin))

  val all: Seq[Q] = Seq(sampleHash, sampleStratified, splitTrainTest, sKfold,
    sReservoir, sUndersample, sBootstrap, sLeakageSplit)
}
