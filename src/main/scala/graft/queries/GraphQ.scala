package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Graph-shaped dedup utilities. Near-dup detection yields PAIRS; what a
  * pipeline actually needs is CLUSTERS (keep one doc per component, drop
  * the rest). Connected components closes that gap.
  */
object GraphQ {

  /** Connected components over the embedding near-dup pair graph
    * (d_embed_neardup's edges), via [[graft.ops.ConnectedComponents]]:
    * min-label propagation + pointer jumping, O(log diameter) supersteps,
    * checkpoint-bounded lineage, and a LOUD IllegalStateException if the
    * iteration cap is ever reached unconverged (never silently-wrong
    * labels). Oracle: recursive CTE transitive closure in DuckDB.
    */
  val dClusterCC: Q = Q(
    "d_cluster_cc",
    (spark, dir) => {
      val pairs = Registry.byName("d_embed_neardup").run(spark, dir)
        .select(col("vec_a").as("src"), col("vec_b").as("dst"))
      graft.ops.ConnectedComponents.run(pairs).orderBy("id")
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
