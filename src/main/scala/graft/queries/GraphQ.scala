package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Graph-shaped dedup utilities. Near-dup detection yields PAIRS; what a
  * pipeline actually needs is CLUSTERS (keep one doc per component, drop
  * the rest). Connected components closes that gap.
  */
object GraphQ {

  /** Connected components over the embedding near-dup pair graph
    * (d_embed_neardup's edges), via Pregel-style min-label propagation:
    * each superstep every node takes the min label among itself and its
    * neighbors; converges in graph-diameter supersteps. Each superstep is
    * one join + one aggregation (both on the node id), and the frontier
    * DataFrame is localCheckpoint'ed so the plan/lineage stays O(1) deep
    * instead of O(iterations) — the pattern that keeps iterative
    * algorithms running at 100 TB (near-dup components are tiny and
    * shallow, so supersteps are few; the convergence check moves one
    * scalar to the driver, never data). Oracle: recursive CTE transitive
    * closure in DuckDB.
    */
  val dClusterCC: Q = Q(
    "d_cluster_cc",
    (spark, dir) => {
      val pairs = Registry.byName("d_embed_neardup").run(spark, dir)
        .select(col("vec_a"), col("vec_b"))
      val edges = pairs
        .unionAll(pairs.select(col("vec_b").as("vec_a"), col("vec_a").as("vec_b")))
        .localCheckpoint()
      var labels = edges.select(col("vec_a").as("id")).distinct()
        .select(col("id"), col("id").as("comp"))
        .localCheckpoint()
      // Convergence probe: labels only ever decrease (min-propagation), so
      // the label sum is strictly monotone until fixpoint — one cheap agg
      // per superstep instead of a join + isEmpty.
      def labelSum(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("comp"))).head.getLong(0)
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 10) {
        // Two propagation rounds per checkpoint+probe: halves the job
        // count (checkpoint and sum are whole jobs, the joins are lazy)
        // at the cost of at most one redundant round after convergence.
        var cur = labels.select(col("id"), col("comp"))
        for (_ <- 0 until 2) {
          val propagated = edges
            .join(cur, edges("vec_b") === cur("id"))
            .select(col("vec_a").as("id"), col("comp"))
          cur = cur.unionAll(propagated)
            .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        }
        val next = cur.localCheckpoint()
        val s = labelSum(next)
        converged = s == prevSum
        prevSum = s
        labels = next
        iter += 1
      }
      labels.orderBy("id")
    },
    Some("""WITH RECURSIVE
           |v AS (SELECT vec_id, list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)) AS qv
           |      FROM embeddings WHERE vec_id < 200),
           |n AS (SELECT vec_id, qv, list_dot_product(qv, qv) AS n2 FROM v),
           |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
           |      FROM n a JOIN n b ON a.vec_id < b.vec_id
           |      WHERE CAST(round(list_dot_product(a.qv, b.qv) / sqrt(a.n2 * b.n2) * 1000000) AS BIGINT) >= 350000),
           |e AS (SELECT vec_a, vec_b FROM p UNION ALL SELECT vec_b, vec_a FROM p),
           |reach(id, r) AS (
           |  SELECT DISTINCT vec_a, vec_a FROM e
           |  UNION
           |  SELECT e.vec_a, reach.r FROM e JOIN reach ON e.vec_b = reach.id)
           |SELECT id, MIN(r) AS comp FROM reach GROUP BY id ORDER BY id""".stripMargin))

  val all: Seq[Q] = Seq(dClusterCC)
}
