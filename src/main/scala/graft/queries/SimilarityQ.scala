package graft.queries

import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Similarity search over `embeddings` (north-star ops).
  *
  * Determinism strategy: embeddings are quantized to integers
  * (round(x*1000)), so dot products and norms are EXACT integer values in
  * both engines (held in doubles they are still exact: |dot| < 2^53).
  * Cosine is then a fixed chain of IEEE double ops on identical inputs —
  * bit-identical across Spark and DuckDB — reported as round(cos*1e6).
  *
  * Scale design: brute-force top-k is the correctness baseline with a
  * FIXED-SIZE query set (vec_id < 2000 cohort, sf-independent like d_decontam's eval set — the pair stage is linear in base size, never quadratic; the 100 TB pattern is: broadcast the query block,
  * stream the base vectors, per-partition top-k heap via the window).
  * The LSH/IVF variant prunes candidates by sign-bucket equality — the
  * bucket join replaces the cross product, which is the actual ANN scale
  * path.
  */
object SimilarityQ {

  /** round(x*1000) per element, as long. */
  private def qvec(c: Column): Column =
    transform(c, x => round(x.cast("double") * 1000).cast("long"))
  /** Fused codegen dot product (graft.functions.LongVecDot): the
    * composable aggregate(zip_with(...)) allocates an intermediate array
    * per candidate pair — millions of allocations in the pair stages. */
  private def dotL(a: Column, b: Column): Column =
    graft.functions.vec_dot_long(a, b)
  private[queries] val qvecSql = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"

  /** d_embed_neardup's cohort bound and cosine threshold (micro-units) —
    * single source of truth shared with the graph oracles (d_cluster_cc,
    * g_triangles) that re-run its edge list; changing either value here
    * updates the Spark side AND every dependent DuckDB oracle together. */
  private[queries] val NearDupCohort = 200
  private[queries] val NearDupMicro = 350000L

  /** DuckDB CTE chain ending in `p(vec_a, vec_b, cos_micro)` =
    * d_embed_neardup's thresholded edge list; interpolated into its own
    * oracle and both graph oracles. */
  private[queries] val nearDupEdgeCte: String =
    s"""v AS (SELECT vec_id, $qvecSql AS qv
       |      FROM embeddings WHERE vec_id < $NearDupCohort),
       |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |        CAST(round(list_dot_product(a.qv, b.qv) / sqrt(a.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
       |      FROM n a JOIN n b ON a.vec_id < b.vec_id
       |      WHERE CAST(round(list_dot_product(a.qv, b.qv) / sqrt(a.n2 * b.n2) * 1000000) AS BIGINT) >= $NearDupMicro)""".stripMargin

  private def base(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), qvec(col("embedding")).as("qv"))
      .withColumn("n2", dotL(col("qv"), col("qv")))

  /** int8 row quantization (q8 = round(x·127/maxabs), zero-norm rows
    * dropped) — single source of truth for sim_sq8_topk / e_power_iter /
    * e_power_chain; a scheme change here updates all three Spark plans
    * AND (via [[q8Cte]]) their DuckDB oracles together. */
  private def q8Frame(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .filter(col("maxabs") > 0)
      .withColumn("q8", transform(col("embedding"),
        x => round(x.cast("double") * 127.0 / col("maxabs")).cast("long")))
      .select(col("vec_id"), col("q8"))

  /** DuckDB twin of [[q8Frame]]: CTE pair ending in `q(vec_id, q8)`. */
  private[queries] val q8Cte: String =
    """v AS (SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      |  FROM embeddings),
      |q AS (SELECT vec_id,
      |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127.0 / maxabs)) AS q8
      |  FROM v WHERE maxabs > 0)""".stripMargin

  private val cosMicro: Column = {
    val cos = col("dot").cast("double") /
      sqrt(col("qn2").cast("double") * col("bn2").cast("double"))
    round(cos * 1000000).cast("long")
  }

  /** Brute-force cosine top-k for the fixed query cohort (vec_id % 25 = 0, vec_id < 2000). */
  val simTopk: Q = Q(
    "sim_topk_cosine",
    (spark, dir) => {
      val b = base(spark, dir)
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("n2").as("qn2"))
      val pairs = q.join(b.select(col("vec_id"), col("qv"), col("n2").as("bn2")),
        col("q_id") =!= col("vec_id"))
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("vec_id").as("neighbor_id"), col("cos_micro"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
            |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
            |p AS (SELECT q.vec_id AS q_id, b.vec_id AS neighbor_id,
            |   CAST(round(list_dot_product(q.qv, b.qv) / sqrt(q.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
            | FROM n q JOIN n b ON q.vec_id % 25 = 0 AND q.vec_id < 2000 AND q.vec_id <> b.vec_id),
            |r AS (SELECT q_id, neighbor_id, cos_micro,
            |   row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id) AS rn
            | FROM p)
            |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id, cos_micro
            |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin))

  /** Embedding-cosine near-dup pairs: all (a<b) with cos >= 0.35. */
  val simNearDup: Q = Q(
    "d_embed_neardup",
    (spark, dir) => {
      val b = base(spark, dir)
      // bound the pair explosion the same way the dedup family does;
      // checkpoint the quantized cohort so both self-join sides read one
      // materialization instead of re-quantizing the embeddings per side
      val s = b.filter(col("vec_id") < NearDupCohort).localCheckpoint()
      s.as("a").join(s.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          dotL(col("a.qv"), col("b.qv")).as("dot"),
          col("a.n2").as("qn2"), col("b.n2").as("bn2"))
        .withColumn("cos_micro", cosMicro)
        .filter(col("cos_micro") >= NearDupMicro)
        .select(col("vec_a"), col("vec_b"), col("cos_micro"))
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH $nearDupEdgeCte
            |SELECT vec_a, vec_b, cos_micro FROM p
            |ORDER BY vec_a, vec_b""".stripMargin))

  /** LSH-bucketed ANN: bucket = sign bits of the first 6 dims (an
    * axis-aligned hyperplane LSH). Candidates only within equal buckets —
    * the join that replaces the cross product at scale. */
  val simIvf: Q = Q(
    "sim_lsh_bucket",
    (spark, dir) => {
      val b = base(spark, dir).withColumn(
        "bucket",
        aggregate(
          zip_with(
            slice(col("qv"), 1, 6),
            array((0 until 6).map(i => lit(1L << i)): _*),
            (x, w) => when(x > 0, w).otherwise(0L)),
          lit(0L), (acc, x) => acc + x))
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("n2").as("qn2"), col("bucket"))
      val pairs = q.join(
        b.select(col("vec_id"), col("qv"), col("n2").as("bn2"), col("bucket")),
        Seq("bucket"))
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("vec_id").as("neighbor_id"), col("cos_micro"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
            |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2,
            |   CAST(list_sum(list_transform(range(0, 6),
            |     i -> CASE WHEN qv[CAST(i AS INT) + 1] > 0 THEN (1::BIGINT << CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS bucket
            | FROM v),
            |p AS (SELECT q.vec_id AS q_id, b.vec_id AS neighbor_id,
            |   CAST(round(list_dot_product(q.qv, b.qv) / sqrt(q.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
            | FROM n q JOIN n b ON q.bucket = b.bucket AND q.vec_id % 25 = 0 AND q.vec_id < 2000 AND q.vec_id <> b.vec_id),
            |r AS (SELECT q_id, neighbor_id, cos_micro,
            |   row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id) AS rn
            | FROM p)
            |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id, cos_micro
            |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin))

  /** IVF two-stage ANN (the 100 TB similarity path): 16 coarse centroids
    * (deterministically the first 16 vectors — offline k-means would
    * refine them, but seeding keeps the oracle expressible), every base
    * vector assigned to its max-cosine cell, queries probe their nprobe=2
    * nearest cells and brute-force only those inverted lists. At scale:
    * centroids broadcast (map-side argmax via partial-aggregable
    * max(struct)), the corpus is hash-partitioned by cell, and each query
    * touches nprobe/k of the data — here 2/16 = 12.5% of candidates vs
    * the cross product. */
  val simIvfTopk: Q = Q(
    "sim_ivf_topk",
    (spark, dir) => {
      val b = base(spark, dir)
      val c = b.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("qv").as("cv"), col("n2").as("cn2"))
      // affinity of every vector to every centroid (broadcast NLJ, no shuffle)
      val aff = b.crossJoin(broadcast(c))
        .withColumn("a",
          round(dotL(col("qv"), col("cv")).cast("double") /
            sqrt(col("n2").cast("double") * col("cn2").cast("double")) * 1000000).cast("long"))
      // assignment = argmax_c affinity, tie-break lowest c_id; expressed as a
      // partial-aggregable max(struct) — the shape that stays map-side at scale
      val assign = aff.groupBy(col("vec_id"))
        .agg(max(struct(col("a"), (-col("c_id")).as("neg_cid"))).as("m"))
        .select(col("vec_id"), (-col("m.neg_cid")).cast("long").as("cell"))
      // queries probe their top-2 cells (tiny side — a window is fine)
      val wAff = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("a").desc, col("c_id"))
      val probes = aff.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .withColumn("rnk", row_number().over(wAff))
        .filter(col("rnk") <= 2)
        .select(col("vec_id").as("q_id"), col("c_id").cast("long").as("cell"))
      val cand = probes.join(assign, "cell")
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
      val qv = b.select(col("vec_id"), col("qv"), col("n2"))
      val scored = cand
        .join(qv.select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("n2").as("qn2")), "q_id")
        .join(qv.select(col("vec_id").as("neighbor_id"), col("qv"), col("n2").as("bn2")), "neighbor_id")
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("neighbor_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn").cast("long").as("rn"), col("neighbor_id"), col("cos_micro"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
            |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
            |c AS (SELECT vec_id AS c_id, qv AS cv, n2 AS cn2 FROM n WHERE vec_id < 16),
            |aff AS (SELECT b.vec_id, c.c_id,
            |   CAST(round(list_dot_product(b.qv, c.cv) / sqrt(b.n2 * c.cn2) * 1000000) AS BIGINT) AS a
            | FROM n b CROSS JOIN c),
            |rk AS (SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id ORDER BY a DESC, c_id) AS rnk FROM aff),
            |assign AS (SELECT vec_id, CAST(c_id AS BIGINT) AS cell FROM rk WHERE rnk = 1),
            |probes AS (SELECT vec_id AS q_id, CAST(c_id AS BIGINT) AS cell FROM rk WHERE vec_id % 25 = 0 AND vec_id < 2000 AND rnk <= 2),
            |cand AS (SELECT p.q_id, a.vec_id AS neighbor_id
            | FROM probes p JOIN assign a USING (cell) WHERE p.q_id <> a.vec_id),
            |scored AS (SELECT cand.q_id, cand.neighbor_id,
            |   CAST(round(list_dot_product(q.qv, b.qv) / sqrt(q.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
            | FROM cand JOIN n q ON q.vec_id = cand.q_id JOIN n b ON b.vec_id = cand.neighbor_id),
            |r AS (SELECT q_id, neighbor_id, cos_micro,
            |   row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id) AS rn FROM scored)
            |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id, cos_micro
            |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin))

  /** Unquantized float-path top-k (production ANN scoring shape): raw
    * float32 embeddings scored with the fused double-accumulator dot
    * product. Oracled on the RANKING only (q_id, rn, neighbor_id — float
    * scores stay internal), and the rank key is the cosine rounded to
    * micro grain (CAST(round(cos*1e6) AS BIGINT)), not the raw double:
    * the engines' doubles are bit-identical today (same float32 inputs,
    * index-order float64 accumulation), but ordering on raw doubles
    * would let a sub-ulp kernel divergence (e.g. a DuckDB pairwise-sum
    * change) flip a near-tie's row_number and fail the gate spuriously.
    * With the micro key, only a divergence that straddles a 0.5e-6
    * rounding boundary could differ, and genuine micro-grain ties break
    * on neighbor_id in both engines. Float-vs-quantized score agreement
    * stays pinned by the PlanAuditSpec twin test. */
  val simTopkFloat: Q = Q(
    "sim_topk_float",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings")
      val norm2 = graft.functions.vec_dot_float(col("embedding"), col("embedding"))
      val b = e.select(col("vec_id"), col("embedding"), norm2.as("n2"))
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("n2").as("qn2"))
      val pairs = q.join(b.select(col("vec_id"), col("embedding"), col("n2").as("bn2")),
          col("q_id") =!= col("vec_id"))
        .withColumn("cos",
          graft.functions.vec_dot_float(col("q_emb"), col("embedding")) /
            sqrt(col("qn2") * col("bn2")))
        .withColumn("cos_micro", round(col("cos") * 1000000).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("long").as("rn"),
          col("vec_id").as("neighbor_id"))
        .orderBy("q_id", "rn")
    },
    Some("""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding,
           |    list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS n2
           |  FROM embeddings),
           |q AS (SELECT vec_id AS q_id, embedding AS q_emb, n2 AS qn2
           |  FROM n WHERE vec_id % 25 = 0 AND vec_id < 2000),
           |scored AS (SELECT q.q_id, b.vec_id AS neighbor_id,
           |    CAST(round(list_dot_product(q.q_emb, b.embedding) / sqrt(q.qn2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
           |  FROM q JOIN n b ON q.q_id <> b.vec_id),
           |r AS (SELECT q_id, neighbor_id,
           |    row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id) AS rn
           |  FROM scored)
           |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id
           |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin))

  /** Brute-force cosine top-k via the TopKPairs bounded-heap Aggregator
    * instead of a window sort: map-side partial aggregation caps every
    * partition's candidates at k before the shuffle, so k×partitions rows
    * move instead of every scored pair — the formulation that wins when
    * one query has millions of candidates. Same oracle as
    * sim_topk_cosine: the two formulations must agree exactly. */
  val simTopkAgg: Q = Q(
    "sim_topk_agg",
    (spark, dir) => {
      val topk = udaf(new graft.ops.TopKPairs(5))
      val b = base(spark, dir)
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("qv").as("q_qv"), col("n2").as("qn2"))
      val pairs = q.join(b.select(col("vec_id"), col("qv"), col("n2").as("bn2")),
        col("q_id") =!= col("vec_id"))
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      pairs.groupBy(col("q_id"))
        .agg(topk(col("cos_micro"), col("vec_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), (col("pos") + 1).cast("long").as("rn"),
          col("col")(1).as("neighbor_id"), col("col")(0).as("cos_micro"))
        .orderBy("q_id", "rn")
    },
    simTopk.oracle)

  /** Per-label centroid moments (first 4 dims): posexplode + one hash agg
    * on (label, pos); emitted as exact integer sums + counts (centroid =
    * sum/n, derivable losslessly). The element-wise shape a k-means /
    * class-prototype step runs at scale: shuffle moves one row per
    * (label × dim), never per vector. */
  val eCentroid: Q = Q(
    "e_centroid",
    (spark, dir) =>
      Tables(spark, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .filter(col("pos0") < 4)
        .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
          round(col("v").cast("double") * 1000000).cast("long").as("vq"))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("vq")).as("sum_micro"), count(lit(1)).as("n"))
        .orderBy("label", "pos"),
    Some("""WITH e AS (SELECT label,
           |    unnest(list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000000))) AS v,
           |    unnest(range(1, len(embedding) + 1)) AS pos
           |  FROM embeddings)
           |SELECT label, CAST(pos AS BIGINT) AS pos,
           |  CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS sum_micro, COUNT(*) AS n
           |FROM e WHERE pos <= 4 GROUP BY 1, 2 ORDER BY label, pos""".stripMargin))

  /** Int8 scalar-quantized (SQ8) top-k: each vector is rescaled by its own
    * dynamic range (q_i = round(x_i · 127 / max|x|), all components in
    * [-127,127]) — 8-bit storage, 4× smaller than float32, the standard
    * memory/IO lever for billion-vector ANN. Cosine is scale-invariant,
    * so the per-vector factor cancels and SQ8 cosine needs NO dequant
    * step: integer dots over the int8 codes (exact in both engines, |dot|
    * ≤ 96·127² ≪ 2^53) through the same fixed IEEE chain as the other
    * sim_* queries. Same fixed query cohort, per-query top-5 via the
    * rank window. At 100 TB the win is the scan: 8-bit codes cut the
    * vector bytes read 4×, and the refine stage (re-rank survivors with
    * full floats) reads only k·queries full vectors. */
  val simSq8Topk: Q = Q(
    "sim_sq8_topk",
    (spark, dir) => {
      val b = q8Frame(spark, dir)
        .withColumn("n2", dotL(col("q8"), col("q8")))
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("q8").as("q_q8"), col("n2").as("qn2"))
      // The query cohort is the FIXED-size side — broadcast it explicitly.
      // Without the hint the planner picks the BNLJ build side from size
      // ESTIMATES, and the quantization expressions make the base side's
      // estimate unreliable: at 64x the probe showed it broadcasting the
      // 512k-vector BASE (77 s) instead of the 80 queries (6 s).
      val pairs = b.select(col("vec_id"), col("q8"), col("n2").as("bn2"))
        .join(broadcast(q), col("q_id") =!= col("vec_id"))
        .withColumn("dot", dotL(col("q_q8"), col("q8")))
        .withColumn("cos8_micro",
          round(col("dot").cast("double") /
            sqrt(col("qn2").cast("double") * col("bn2").cast("double")) * 1000000).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos8_micro").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("long").as("rn"),
          col("vec_id").as("neighbor_id"), col("cos8_micro"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH $q8Cte,
            |n AS (SELECT vec_id, q8, list_dot_product(q8, q8) AS n2 FROM q),
            |p AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
            |   CAST(round(list_dot_product(a.q8, b.q8) / sqrt(a.n2 * b.n2) * 1000000) AS BIGINT) AS cos8_micro
            | FROM n a JOIN n b ON a.vec_id % 25 = 0 AND a.vec_id < 2000 AND a.vec_id <> b.vec_id),
            |r AS (SELECT q_id, neighbor_id, cos8_micro,
            |   row_number() OVER (PARTITION BY q_id ORDER BY cos8_micro DESC, neighbor_id) AS rn
            | FROM p)
            |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id, cos8_micro
            |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin))

  /** One distributed power-iteration step — the matrix-free spectral
    * primitive under PCA/top-eigenvector embedding analytics: for the
    * Gram matrix G = AᵀA of the (row-quantized) embedding matrix A,
    * compute G·v₀ = Σᵢ (aᵢ·v₀)·aᵢ without ever materializing G. Two
    * map-side passes fused into one plan: the per-row scalar s = aᵢ·v₀
    * (codegen'd LongVecDot against the broadcast-literal v₀), then
    * posexplode streams (dim, qᵢₘ·s) pairs into a 64-group partial-sum
    * aggregate — the ONLY shuffle is 64 rows × partitions, at any corpus
    * size. Iterating (normalize, feed the ray back as v₀) is a driver
    * loop over this same step. int8 row quantization (sim_sq8_topk's
    * scheme) keeps every product a long: |c| ≤ 127·64·127·5 and the
    * corpus sum stays far under 2⁶³ (and under 2⁵³, so the DuckDB
    * double-list twin is exact too). */
  val ePowerIter: Q = {
    val v0 = (0 until 64).map(d => (d * 37 % 11) - 5L)
    Q(
      "e_power_iter",
      (spark, dir) => {
        val v0col = array(v0.map(lit(_)): _*)
        q8Frame(spark, dir)
          .withColumn("s", dotL(col("q8"), v0col))
          .select(col("s"), posexplode(col("q8")).as(Seq("dim", "qv")))
          .groupBy(col("dim").cast("long").as("dim"))
          .agg(sum(col("qv") * col("s")).as("ray"))
          .orderBy("dim")
      },
      Some(s"""WITH $q8Cte,
              |s AS (SELECT q8, list_dot_product(q8, ${v0.mkString("[", ", ", "]")}) AS s FROM q),
              |e AS (SELECT unnest([{'dim': i, 'c': q8[i+1] * s} FOR i IN range(len(q8))]) AS u FROM s)
              |SELECT CAST(u.dim AS BIGINT) AS dim, CAST(SUM(CAST(u.c AS BIGINT)) AS BIGINT) AS ray
              |FROM e GROUP BY 1 ORDER BY dim""".stripMargin))
  }

  /** Chained power iteration WITH DEFLATION — the second-eigendirection
    * primitive on top of [[ePowerIter]]'s matrix-free step, kept exact
    * end-to-end so the DuckDB twin hash-matches:
    *
    *   1. r₁ = G·v₀ (identical 64-row prefix-sum shape to e_power_iter);
    *   2. v₁ = round(7·r₁/‖r₁‖∞) — a 3-bit requantization of the first
    *      ray. Integer re-scale keeps every later product a small long
    *      AND is the step that lets the chain iterate at any corpus
    *      size: ray magnitudes grow with n, the requantized probe never
    *      does;
    *   3. deflate a second fixed probe u₀ EXACTLY in integers:
    *      u = (v₁·v₁)·u₀ − (u₀·v₁)·v₁ — orthogonal to v₁ by
    *      construction (no float normalization anywhere), |u| ≤ 31 376;
    *   4. r₂ = G·u — the power step in the deflated complement.
    *
    * The chain is fully distributed: each pass is the same
    * posexplode → 64-group partial-sum aggregate (the only data-sized
    * shuffles move 64 rows × partitions), and the inter-pass state (one
    * 64-long ray) moves as a one-row broadcast cross join, never a
    * collect. Overflow headroom: per-row |q·s₂·q| ≤ 3.3e10, so the
    * BIGINT sums hold to ~3e8 embedding rows per shard — beyond that,
    * re-scale v₁ to fewer bits or shard the sum.
    */
  val ePowerChain: Q = {
    val v0 = (0 until 64).map(d => (d * 37 % 11) - 5L)
    val u0 = (0 until 64).map(d => (d * 29 % 13) - 6L)
    Q(
      "e_power_chain",
      (spark, dir) => {
        val v0col = array(v0.map(lit(_)): _*)
        val u0col = array(u0.map(lit(_)): _*)
        val base = q8Frame(spark, dir)
          .localCheckpoint() // feeds both power passes
        val r1 = base
          .withColumn("s", dotL(col("q8"), v0col))
          .select(col("s"), posexplode(col("q8")).as(Seq("dim", "qv")))
          .groupBy(col("dim").cast("long").as("dim"))
          .agg(sum(col("qv") * col("s")).as("ray1"))
        val probe = r1
          .agg(sort_array(collect_list(struct(col("dim"), col("ray1")))).as("rs"))
          .select(transform(col("rs"), s => s.getField("ray1")).as("rays"))
          .withColumn("mx", array_max(transform(col("rays"), x => abs(x.cast("double")))))
          .withColumn("v1", transform(col("rays"),
            x => round(x.cast("double") * 7.0 / col("mx")).cast("long")))
          .withColumn("vv", dotL(col("v1"), col("v1")))
          .withColumn("uv", dotL(col("v1"), u0col))
          .select(zip_with(col("v1"), u0col,
            (a, b) => col("vv") * b - col("uv") * a).as("u"))
        val r2 = base
          .crossJoin(broadcast(probe))
          .withColumn("s2", dotL(col("q8"), col("u")))
          .select(col("s2"), posexplode(col("q8")).as(Seq("dim", "qv")))
          .groupBy(col("dim").cast("long").as("dim"))
          .agg(sum(col("qv") * col("s2")).as("ray2"))
        r1.join(r2, "dim").select(col("dim"), col("ray1"), col("ray2")).orderBy("dim")
      },
      Some(s"""WITH $q8Cte,
              |s1 AS (SELECT q8, list_dot_product(q8, ${v0.mkString("[", ", ", "]")}) AS s FROM q),
              |e1 AS (SELECT unnest([{'dim': i, 'c': q8[i+1] * s} FOR i IN range(len(q8))]) AS u FROM s1),
              |r1 AS (SELECT CAST(u.dim AS BIGINT) AS dim, CAST(SUM(CAST(u.c AS BIGINT)) AS BIGINT) AS ray1
              |  FROM e1 GROUP BY 1),
              |vec AS (SELECT list(ray1 ORDER BY dim) AS rays FROM r1),
              |m AS (SELECT rays, list_max(list_transform(rays, x -> abs(CAST(x AS DOUBLE)))) AS mx
              |  FROM vec),
              |p1 AS (SELECT list_transform(rays, x -> round(CAST(x AS DOUBLE) * 7.0 / mx)) AS v1
              |  FROM m),
              |p2 AS (SELECT v1, list_dot_product(v1, v1) AS vv,
              |    list_dot_product(v1, ${u0.mkString("[", ", ", "]")}) AS uv FROM p1),
              |p3 AS (SELECT [vv * (${u0.mkString("[", ", ", "]")})[i+1] - uv * v1[i+1]
              |    FOR i IN range(len(v1))] AS u FROM p2),
              |s2 AS (SELECT q.q8, list_dot_product(q.q8, p3.u) AS s FROM q, p3),
              |e2 AS (SELECT unnest([{'dim': i, 'c': q8[i+1] * s} FOR i IN range(len(q8))]) AS u FROM s2),
              |r2 AS (SELECT CAST(u.dim AS BIGINT) AS dim, CAST(SUM(CAST(u.c AS BIGINT)) AS BIGINT) AS ray2
              |  FROM e2 GROUP BY 1)
              |SELECT r1.dim AS dim, r1.ray1, r2.ray2 FROM r1 JOIN r2 ON r1.dim = r2.dim
              |ORDER BY r1.dim""".stripMargin))
  }

  /** Product-quantization ANN (the FAISS-style ADC scale path): 64-dim
    * vectors split into 8 subvectors of 8 dims, each encoded as the
    * nearest sampled codeword (ties by codeword index) — the scanned
    * representation shrinks from 256 B of floats to 8 small codes.
    * Query scoring is ASYMMETRIC DISTANCE: a per-(query, subspace,
    * codeword) dot-product LUT is broadcast and joined against the code
    * table, so the score pass reads codes and adds LUT entries — no
    * float vector ever moves after encoding. At 100 TB this is the
    * difference between scanning the corpus's embeddings and scanning
    * ~3% of their bytes. Everything is exact-integer (round(x·1000)
    * grid, codebook sampled at vec_id % 13 from the fixed cohort), so
    * the DuckDB twin hash-matches, and min(struct) / row_number
    * tie-breaks agree by construction.
    *
    * Measured recall@5 vs the exact dot ranking on THIS corpus: 0.37
    * (39 codewords/subspace at sf0.01) — the synthetic embeddings are
    * near-uniform random unit vectors, the worst case for any trained
    * or sampled quantizer (no cluster structure to exploit; a Lloyd
    * iteration was measured at +0.05 and not worth the extra passes).
    * On clustered real-corpus embeddings the same machinery recovers
    * the usual PQ recall; what the oracle pins here is the exact
    * code/LUT/ADC relational mechanics, not the data-dependent recall
    * (floor pinned in PlanAuditSpec).
    *
    * ScanAudit note: embeddings ×4 is intentional — one full scan feeds
    * the encode pass; the codebook and LUT scans carry the pushable
    * `vec_id < 2000` cohort bound, so parquet row-group stats prune them
    * to the fixed cohort at any corpus size. */
  val simPqTopk: Q = Q(
    "sim_pq_topk",
    (spark, dir) => {
      val base = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), qvec(col("embedding")).as("qv"))
      val subs = base
        .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("s"),
          col("qv"))
        .select(col("vec_id"), col("s"),
          slice(col("qv"), col("s") * lit(8) + lit(1), lit(8)).as("sub"))
      val cb = subs.filter(col("vec_id") % 13 === 0 && col("vec_id") < 2000)
        .select(expr("vec_id div 13").as("j"), col("s").as("cs"), col("sub").as("cw"))
      val codes = subs
        .join(broadcast(cb), col("s") === col("cs"))
        .withColumn("d2", dotL(col("cw"), col("cw")) - lit(2L) * dotL(col("sub"), col("cw")))
        .groupBy(col("vec_id"), col("s"))
        .agg(min(struct(col("d2"), col("j"))).as("m"))
        .select(col("vec_id"), col("s"), col("m.j").as("code"))
      val lut = subs.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("s").as("qs"), col("sub").as("qsub"))
        .join(broadcast(cb), col("qs") === col("cs"))
        .select(col("q_id"), col("qs"), col("j"), dotL(col("qsub"), col("cw")).as("dp"))
      val scores = codes
        .join(broadcast(lut), col("s") === col("qs") && col("code") === col("j"))
        .filter(col("q_id") =!= col("vec_id"))
        .groupBy(col("q_id"), col("vec_id").as("neighbor_id"))
        .agg(sum(col("dp")).as("adc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("adc").desc, col("neighbor_id"))
      scores.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn").cast("long").as("rn"),
          col("neighbor_id"), col("adc"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH q AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
            |sub AS (SELECT vec_id, t.s, qv[t.s*8+1 : t.s*8+8] AS sub
            |  FROM q, range(8) AS t(s)),
            |cb AS (SELECT vec_id // 13 AS j, s AS cs, sub AS cw
            |  FROM sub WHERE vec_id % 13 = 0 AND vec_id < 2000),
            |codes0 AS (SELECT b.vec_id, b.s, c.j,
            |    list_dot_product(c.cw, c.cw) - 2*list_dot_product(b.sub, c.cw) AS d2
            |  FROM sub b JOIN cb c ON b.s = c.cs),
            |codes AS (SELECT vec_id, s, j AS code FROM (
            |    SELECT vec_id, s, j,
            |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) AS rk
            |    FROM codes0) WHERE rk = 1),
            |lut AS (SELECT qq.vec_id AS q_id, qq.s AS qs, c.j,
            |    list_dot_product(qq.sub, c.cw) AS dp
            |  FROM sub qq JOIN cb c ON qq.s = c.cs
            |  WHERE qq.vec_id % 25 = 0 AND qq.vec_id < 2000),
            |sc AS (SELECT l.q_id, cd.vec_id AS neighbor_id, CAST(SUM(l.dp) AS BIGINT) AS adc
            |  FROM codes cd JOIN lut l ON cd.s = l.qs AND cd.code = l.j
            |  WHERE l.q_id <> cd.vec_id GROUP BY 1, 2),
            |r AS (SELECT q_id, neighbor_id, adc,
            |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, neighbor_id) AS rn
            |  FROM sc)
            |SELECT q_id, CAST(rn AS BIGINT) AS rn, neighbor_id, adc
            |FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin))

  /** The deterministic ±1 projection matrix shared by [[eRandProj]]'s
    * Spark plan and its DuckDB oracle: sign(b,j) from one LCG step on the
    * flattened index — both sides consume the SAME literal arrays, so the
    * scheme is a single source of truth here. 16 bits × 64 dims. */
  private[queries] val rpSigns: Seq[Seq[Long]] =
    (0 until 16).map { b =>
      (0 until 64).map { j =>
        val s = ((b * 64 + j).toLong * 1103515245L + 12345L) % 2147483647L
        if (s % 2L == 0L) 1L else -1L
      }
    }

  /** Signed-random-projection hashing (round 10): every embedding maps to
    * a 16-bit code, bit b = [⟨qv, r_b⟩ ≥ 0] for 16 fixed ±1 hyperplanes —
    * the classic SimHash-for-dense-vectors LSH family (cosine-similar
    * vectors collide with probability 1 − θ/π per bit). The query emits
    * the code histogram with per-bucket label spread (n_labels ≪ n_vecs
    * means buckets are label-pure — the recall signal) — the planning
    * readout before sizing an LSH index. Exact by construction: inputs
    * are the quantized integer vectors, each plane dot is int64, and the
    * ±1 matrix is interpolated into BOTH engines as literals.
    *
    * Scale shape: 16 fused codegen dot products per row (no explode —
    * [[graft.functions.vec_dot_long]] against broadcast literal arrays),
    * then one hash aggregate over ≤ 2^16 buckets. Map-only + bounded
    * aggregate = linear at 100 TB; the code column is precisely what the
    * bucketed ANN join (sim_lsh_bucket) keys on at the next stage. */
  val eRandProj: Q = Q(
    "e_rand_proj",
    (spark, dir) => {
      val code = rpSigns.zipWithIndex.map { case (s, b) =>
        when(dotL(col("qv"), array(s.map(lit): _*)) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), qvec(col("embedding")).as("qv"))
        .withColumn("code", code)
        .groupBy(col("code"))
        .agg(count(lit(1)).as("n_vecs"),
          count_distinct(col("label")).as("n_labels"),
          min(col("vec_id")).as("min_vec"))
        .orderBy(col("code"))
    },
    Some {
      val bitTerms = rpSigns.zipWithIndex.map { case (s, b) =>
        s"(CASE WHEN list_dot_product(qv, [${s.mkString(", ")}]) >= 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("\n    + ")
      s"""WITH v AS (SELECT vec_id, label, $qvecSql AS qv FROM embeddings),
         |c AS (SELECT vec_id, label,
         |    $bitTerms AS code
         |  FROM v)
         |SELECT code, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
         |  MIN(vec_id) AS min_vec
         |FROM c GROUP BY code ORDER BY code""".stripMargin
    })

  /** Hard-negative mining (round 10): for each query-cohort anchor, the
    * top-3 highest-cosine vectors with a DIFFERENT label — the
    * contrastive-training sampler (metric learning / embedding
    * fine-tuning wants negatives that are similar yet wrongly labeled,
    * not random ones). Same exact-integer cosine and fixed-cohort pair
    * stage as sim_topk_cosine — linear in base size, never quadratic —
    * plus the label predicate in the join condition so same-label pairs
    * are pruned BEFORE the dot product, and the per-anchor top-3 plans
    * as WindowGroupLimit (map-side heap before the window shuffle). */
  val eHardNegatives: Q = Q(
    "e_hard_negatives",
    (spark, dir) => {
      val b = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          qvec(col("embedding")).as("qv"))
        .withColumn("n2", dotL(col("qv"), col("qv")))
      val q = b.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("qv").as("q_qv"), col("n2").as("qn2"))
      val pairs = q.join(
          b.select(col("vec_id"), col("label"), col("qv"), col("n2").as("bn2")),
          col("q_label") =!= col("label"))
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("cos_micro").desc, col("vec_id"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("q_label"), col("rn").cast("long").as("rn"),
          col("vec_id").as("neg_id"), col("label").as("neg_label"), col("cos_micro"))
        .orderBy("q_id", "rn")
    },
    Some(s"""WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label, $qvecSql AS qv FROM embeddings),
            |n AS (SELECT vec_id, label, qv, list_dot_product(qv, qv) AS n2 FROM v),
            |p AS (SELECT q.vec_id AS q_id, q.label AS q_label, b.vec_id AS neg_id, b.label AS neg_label,
            |   CAST(round(list_dot_product(q.qv, b.qv) / sqrt(q.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
            | FROM n q JOIN n b ON q.vec_id % 25 = 0 AND q.vec_id < 2000 AND q.label <> b.label),
            |r AS (SELECT q_id, q_label, neg_id, neg_label, cos_micro,
            |   row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neg_id) AS rn
            | FROM p)
            |SELECT q_id, q_label, CAST(rn AS BIGINT) AS rn, neg_id, neg_label, cos_micro
            |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin))

  /** One distributed Lloyd (k-means) iteration (round 12): the clustering
    * step every SemDeDup/IVF pipeline presumes, in exact integers. Seeds
    * are the k=8 corpus vectors with vec_id < 8 (deterministic, data-
    * derived); assignment minimizes the exact squared distance
    * ‖x−c‖² = n2_x − 2·⟨x,c⟩ + n2_c (all int64 on the quantized grid, ties
    * to the smaller centroid id); output is the per-cluster re-estimation
    * state — member count, inertia (Σ d², the k-means objective), and the
    * new-centroid per-dim sums (first/last dim shown) — i.e. exactly the
    * mergeable partials the next iteration's centroids divide out of.
    *
    * Scale shape: the 8 centroids ride ONE broadcast row (sorted
    * array<struct>), assignment is a pure per-row `aggregate` fold over
    * that array — map-only, no vec-grain shuffle anywhere; the only
    * exchange is the final 8-group hash aggregate, map-side-combined to
    * ≤ k rows per partition. This is the canonical 1000-executor k-means
    * step: per iteration, broadcast k·d longs out, k·(d+2) longs back. */
  val eKmeansStep: Q = Q(
    "e_kmeans_step",
    (spark, dir) => {
      val n = base(spark, dir)
      val cents = n.filter(col("vec_id") < 8)
        .agg(array_sort(collect_list(struct(
          col("vec_id").cast("long").as("cid"),
          col("qv").as("cqv"),
          col("n2").as("cn2")))).as("cs"))
      val best = aggregate(
        col("cs"),
        struct(lit(Long.MaxValue).as("d2"), lit(-1L).as("cid")),
        (acc, c) => {
          val d2 = col("n2") - lit(2L) * dotL(col("qv"), c.getField("cqv")) +
            c.getField("cn2")
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), c.getField("cid").as("cid"))).otherwise(acc)
        })
      n.crossJoin(broadcast(cents))
        .withColumn("best", best)
        .select(col("best.cid").as("cid"), col("best.d2").as("d2"), col("qv"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"),
          sum(element_at(col("qv"), 1)).as("s0"),
          sum(element_at(col("qv"), 64)).as("s63"))
        .orderBy("cid")
    },
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
            |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
            |c AS (SELECT vec_id AS cid, qv AS cqv, n2 AS cn2 FROM n WHERE vec_id < 8),
            |p AS (SELECT n.vec_id, c.cid,
            |   CAST(n.n2 - 2 * list_dot_product(n.qv, c.cqv) + c.cn2 AS BIGINT) AS d2,
            |   n.qv FROM n, c),
            |a AS (SELECT vec_id, cid, d2, qv,
            |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM p)
            |SELECT cid, COUNT(*) AS n_members, CAST(SUM(d2) AS BIGINT) AS inertia,
            | CAST(SUM(qv[1]) AS BIGINT) AS s0, CAST(SUM(qv[64]) AS BIGINT) AS s63
            |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid""".stripMargin))

  /** Mutual-kNN graph construction (round 12): for the fixed vec_id < 400
    * cohort, each vector's top-3 cosine neighbors form directed edges and
    * only RECIPROCATED pairs survive — the mutual-kNN graph that seeds
    * density clustering / UMAP / dedup-community pipelines, where one-way
    * attraction to a hub is noise but mutual selection is structure.
    *
    * Scale shape: the pair stage is bounded by the fixed cohort (the
    * corpus-scale path swaps it for the LSH-bucket candidate join exactly
    * as sim_lsh_bucket does); per-source top-3 plans as WindowGroupLimit
    * (bounded per-partition heaps before the window shuffle), and the
    * mutuality check is a self equi-join of two k·|cohort|-row edge lists
    * on the reversed key — linear in the edge count, never in pairs. */
  val eKnnGraph: Q = Q(
    "e_knn_graph",
    (spark, dir) => {
      val c = base(spark, dir).filter(col("vec_id") < 400)
      val a = c.select(col("vec_id").as("src"), col("qv").as("q_qv"),
        col("n2").as("qn2"))
      val bb = c.select(col("vec_id").as("dst"), col("qv"), col("n2").as("bn2"))
      val pairs = a.join(bb, col("src") =!= col("dst"))
        .withColumn("dot", dotL(col("q_qv"), col("qv")))
        .withColumn("cos_micro", cosMicro)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("cos_micro").desc, col("dst"))
      val knn = pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("src"), col("dst"), col("cos_micro"))
      knn.as("f").join(knn.as("r"),
          col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
        .filter(col("f.src") < col("f.dst"))
        .select(col("f.src").as("vec_a"), col("f.dst").as("vec_b"),
          col("f.cos_micro").as("cos_micro"))
        .orderBy("vec_a", "vec_b")
    },
    Some(s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings WHERE vec_id < 400),
            |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
            |p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
            |   CAST(round(list_dot_product(a.qv, b.qv) / sqrt(a.n2 * b.n2) * 1000000) AS BIGINT) AS cos_micro
            | FROM n a JOIN n b ON a.vec_id <> b.vec_id),
            |k AS (SELECT src, dst, cos_micro,
            |   row_number() OVER (PARTITION BY src ORDER BY cos_micro DESC, dst) AS rn FROM p),
            |e AS (SELECT src, dst, cos_micro FROM k WHERE rn <= 3)
            |SELECT f.src AS vec_a, f.dst AS vec_b, f.cos_micro AS cos_micro
            |FROM e f JOIN e r ON f.src = r.dst AND f.dst = r.src
            |WHERE f.src < f.dst ORDER BY vec_a, vec_b""".stripMargin))

  val all: Seq[Q] = Seq(simTopk, simNearDup, simIvf, simIvfTopk, simTopkFloat, simTopkAgg,
    eCentroid, simSq8Topk, ePowerIter, ePowerChain, simPqTopk, eRandProj, eHardNegatives,
    eKmeansStep, eKnnGraph)
}
