package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch-accelerated operators. The Bloom join is the load-bearing one:
  * build a Bloom filter on the dim keys, pre-filter the fact table before
  * the shuffle — no false negatives, so the post-join result is EXACTLY
  * the plain join (which is what the oracle runs), but at 100 TB the
  * shuffle moves only rows that can match. The approximate sketches
  * (approx quantile/distinct, HLL merge) sit under the oracle gate via
  * deterministic band checks: the query emits the exact answer (which
  * DuckDB recomputes) plus a 0/1 flag asserting the estimate honors its
  * published error bound, so a drifting sketch hash-fails the round.
  */
object SketchQ {

  /** Bloom-pruned semi-join shape: orders with c_acctbal > 9000 customers.
    * The probe is Spark's NATIVE `might_contain` (BloomFilterMightContain,
    * the expression behind runtime row-level bloom join filters) over the
    * serialized sketch — codegen-friendly, so the fact-table scan+filter
    * stays inside one WholeStageCodegen span instead of breaking on a
    * per-row Scala UDF call (plan-audited). At 100 TB the same effect
    * comes for free from spark.sql.optimizer.runtime.bloomFilter.enabled;
    * building the sketch explicitly here exercises the operator itself. */
  val jBloomPrune: Q = Q(
    "j_bloom_prune",
    (spark, dir) => {
      val cust = Tables(spark, dir, "customer")
        .filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey"))
      val bloom = cust.stat.bloomFilter("c_custkey", 5000, 0.03)
      val bloomBytes = {
        val os = new java.io.ByteArrayOutputStream()
        bloom.writeTo(os)
        os.toByteArray
      }
      Tables(spark, dir, "orders")
        // sketch prune: no false negatives, so the exact join below sees
        // every true match and only cleans up false positives
        .filter(graft.functions.might_contain(bloomBytes, col("o_custkey")))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
           |  ON o_custkey = c_custkey
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** approx_percentile sketch under the hard oracle gate via its RANK
    * guarantee, checked deterministically: with accuracy = 1000 the
    * returned value is an element whose rank is within ε·n (ε = 1/1000)
    * of the target rank. The query joins the per-group estimates back to
    * the data (broadcast — one row per group) and emits 0/1 flags
    * `p50_ok`/`p99_ok`: count(v ≤ est) must reach ⌊(p−ε)·n⌋ and
    * count(v < est) must not exceed ⌈(p+ε)·n⌉. The oracle emits the
    * literal 1s plus the exact group count, so a sketch violating its
    * published rank bound hash-fails the round. (The exact twin
    * a_percentile still carries the value-level oracle.) */
  val aApproxQuantile: Q = Q(
    "a_approx_quantile",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), cents(col("l_extendedprice")).as("v"))
      val est = li.groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("v"), lit(0.5), lit(1000)).as("p50"),
          approx_percentile(col("v"), lit(0.99), lit(1000)).as("p99"))
      def rankOk(le: Column, lt: Column, p: Double): Column = {
        val eps = 1.0 / 1000
        (le >= floor(lit(p - eps) * col("n")) &&
          lt <= ceil(lit(p + eps) * col("n"))).cast("long")
      }
      li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("v") <= col("p50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("v") < col("p50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("v") <= col("p99"), 1L).otherwise(0L)).as("le99"),
          sum(when(col("v") < col("p99"), 1L).otherwise(0L)).as("lt99"))
        .select(col("l_returnflag"), col("n"),
          rankOk(col("le50"), col("lt50"), 0.5).as("p50_ok"),
          rankOk(col("le99"), col("lt99"), 0.99).as("p99_ok"))
        .orderBy("l_returnflag")
    },
    oracle = Some("""SELECT l_returnflag, COUNT(*) AS n,
           | CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p99_ok
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Corpus-wide top-k tokens (text-analysis star): explode -> count ->
    * top-k. Ties broken by token for determinism. */
  val tTopTokens: Q = Q(
    "t_top_tokens",
    (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(20),
    Some("""SELECT tok, COUNT(*) AS n
           |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
           |WHERE length(tok) > 0
           |GROUP BY tok ORDER BY n DESC, tok LIMIT 20""".stripMargin))

  /** DataSketches HLL partial-merge: one sketch per nation
    * (hll_sketch_agg), then the per-group sketches UNIONED into a global
    * estimate (hll_union_agg) — the mergeable-sketch pattern that makes
    * 100 TB cardinality estimation a two-level tree (sketch per partition
    * / shard / day, merge upward) instead of a re-scan per grain. The
    * union row (nation = -1) is computed FROM the per-nation sketches,
    * not from the base data — that merge step IS the operator under test.
    * Under the hard oracle gate via a deterministic band check: sketch
    * internals differ per implementation, so the query emits the EXACT
    * distinct count per grain (cross-engine verified by DuckDB) plus a
    * 0/1 `within_band` flag asserting |estimate − exact| ≤ 5% · exact —
    * HllMergeSpec's published bound (default lgConfigK=12 HLL is ~1.6%
    * at these cardinalities). The oracle emits the literal 1, so a
    * per-nation OR merged estimate outside the band hash-fails. */
  val aHllMerge: Q = Q(
    "a_hll_merge",
    (spark, dir) => {
      def band(est: Column, exact: Column): Column =
        when(abs(est - exact) <= greatest(exact * 0.05, lit(1.0)), 1L)
          .otherwise(0L)
      val cust = Tables(spark, dir, "customer")
      val perNation = cust
        .groupBy(col("c_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"),
          countDistinct(col("c_custkey")).as("exact_custs"))
      val globalExact = cust.agg(countDistinct(col("c_custkey")).as("exact_custs"))
      val global = perNation
        .agg(hll_union_agg(col("sk")).as("sk"))
        .crossJoin(broadcast(globalExact)) // one row × one row
        .select(lit(-1L).as("nation"), col("exact_custs"),
          band(hll_sketch_estimate(col("sk")), col("exact_custs")).as("within_band"))
      perNation
        .select(col("c_nationkey").cast("long").as("nation"), col("exact_custs"),
          band(hll_sketch_estimate(col("sk")), col("exact_custs")).as("within_band"))
        .unionAll(global)
        .orderBy("nation")
    },
    oracle = Some(
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |  COUNT(DISTINCT c_custkey) AS exact_custs, CAST(1 AS BIGINT) AS within_band
        |FROM customer GROUP BY c_nationkey
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), COUNT(DISTINCT c_custkey), CAST(1 AS BIGINT)
        |FROM customer
        |ORDER BY nation""".stripMargin))

  /** EXACT heavy hitters via a Misra–Gries candidate prune (the two-pass
    * frequent-items pattern): pass 1 folds the token stream into one 2k-long
    * [[graft.ops.MisraGries]] summary (constant state per partition,
    * map-side combinable — the shuffle moves ≤128 longs per partition, not
    * the token grain), whose candidates are a guaranteed SUPERSET of every
    * token with freq > n/(k+1); pass 2 exact-counts ONLY tokens whose
    * fingerprint hits the broadcast ≤k candidate set and applies the
    * threshold exactly. The sketch never decides membership — it only
    * prunes the exact pass's shuffle from |vocab| to ≤k keys — so the
    * result equals the plain GROUP BY/HAVING oracle at any scale. At
    * 100 TB the vocabulary is billions of keys; this shape aggregates k. */
  val aHeavyHitters: Q = Q(
    "a_heavy_hitters",
    (spark, dir) => {
      val k = 64
      val toks = Tables(spark, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 0)
        .localCheckpoint() // feeds sketch pass, total count, and exact pass
      val mg = udaf(new graft.ops.MisraGries(k))
      val cands = toks.agg(mg(xxhash64(col("tok"))).as("cand"))
        .select(explode(col("cand")).as("fp"))
      val total = toks.agg(count(lit(1)).as("n_total"))
      toks
        .join(broadcast(cands), xxhash64(col("tok")) === col("fp"), "left_semi")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") * (k + 1) > col("n_total")) // exact threshold test
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    },
    Some("""WITH t AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
           |    x -> len(x) > 0)) AS tok FROM documents),
           |n AS (SELECT COUNT(*) AS n_total FROM t)
           |SELECT tok, COUNT(*) AS cnt FROM t
           |GROUP BY tok HAVING COUNT(*) * 65 > (SELECT n_total FROM n)
           |ORDER BY cnt DESC, tok""".stripMargin))

  /** Count-Min sketch point estimates (round 10), DETERMINISTIC
    * formulation: d=3 LCG hash rows × w=512 buckets over the lineitem
    * part-key stream; for the 20 most frequent parts (exact top-20) the
    * query reports the exact frequency next to the CMS estimate
    * est = min_j cms[j][h_j(key)] and the overcount est − exact ≥ 0 —
    * the one-sided error guarantee made visible. The hash family is
    * plain modular arithmetic (((a_j·x + b_j) mod p) mod w, p = 2³¹−1),
    * so BOTH engines compute bit-identical sketches and the estimate is
    * oracle-checkable — the usual reason CMS escapes exact gates is
    * implementation-defined hashing, not the math.
    *
    * Scale shape: the sketch build is one hash aggregate of a bounded
    * 3× fan-out into ≤1536 cells (map-side combinable — each partition
    * ships its 1536-cell partial, never the key grain); the probe joins
    * the bounded top-k×3 frame against the broadcast cell table. At
    * 100 TB the sketch stays 12 KB; only the exact top-k pass touches
    * the key grain, and that is the same aggregate the oracle runs. */
  val aCms: Q = Q(
    "a_cms",
    (spark, dir) => {
      val keys = Tables(spark, dir, "lineitem")
        .select(col("l_partkey"))
        .localCheckpoint() // feeds the sketch build and the exact top-k
      val bucket = expr(
        """((element_at(array(1103515245L, 69069L, 1664525L), j + 1) * l_partkey
          |   + element_at(array(12345L, 362437L, 1013904223L), j + 1))
          |  % 2147483647) % 512""".stripMargin)
      val cells = keys
        .withColumn("j", explode(sequence(lit(0), lit(2))))
        .withColumn("bucket", bucket)
        .groupBy(col("j"), col("bucket"))
        .agg(count(lit(1)).as("cell_n"))
      val top = keys
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("l_partkey"))
        .limit(20)
      top
        .withColumn("j", explode(sequence(lit(0), lit(2))))
        .withColumn("bucket", bucket)
        .join(broadcast(cells), Seq("j", "bucket"))
        .groupBy(col("l_partkey"), col("exact_n"))
        .agg(min(col("cell_n")).as("est_n"))
        .withColumn("over_n", col("est_n") - col("exact_n"))
        .orderBy(col("exact_n").desc, col("l_partkey"))
    },
    Some("""WITH cells AS (
           |  SELECT j, ((a * l_partkey + b) % 2147483647) % 512 AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS cell_n
           |  FROM lineitem CROSS JOIN (VALUES (0, 1103515245, 12345),
           |    (1, 69069, 362437), (2, 1664525, 1013904223)) h(j, a, b)
           |  GROUP BY 1, 2),
           |top AS (
           |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS exact_n
           |  FROM lineitem GROUP BY 1 ORDER BY exact_n DESC, l_partkey LIMIT 20)
           |SELECT t.l_partkey, t.exact_n, MIN(c.cell_n) AS est_n,
           |  MIN(c.cell_n) - t.exact_n AS over_n
           |FROM top t
           |CROSS JOIN (VALUES (0, 1103515245, 12345),
           |  (1, 69069, 362437), (2, 1664525, 1013904223)) h(j, a, b)
           |JOIN cells c ON c.j = h.j
           |  AND c.bucket = ((h.a * t.l_partkey + h.b) % 2147483647) % 512
           |GROUP BY t.l_partkey, t.exact_n
           |ORDER BY t.exact_n DESC, t.l_partkey""".stripMargin))

  val all: Seq[Q] = Seq(jBloomPrune, aApproxQuantile, tTopTokens, aHllMerge, aHeavyHitters,
    aCms)
}
