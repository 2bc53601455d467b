package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by Pregel-style min-label propagation PLUS pointer
  * jumping: every superstep each node first takes the min label among
  * itself and its neighbors (propagation), then replaces its label with
  * its label's label (comp := comp(comp) — the Shiloach–Vishkin halving
  * step). Plain propagation needs O(diameter) supersteps, so a
  * 10,000-node chain needs 10,000 rounds; the jump step halves the
  * remaining distance to the component root each round, giving
  * O(log diameter) — 20 rounds covers any graph that fits on disk.
  *
  * Each superstep is two key-equi-joins + one aggregation, all on the node
  * id; the label frontier is localCheckpoint'ed so plan/lineage depth
  * stays O(1) instead of O(iterations) — the pattern that keeps iterative
  * dataflow alive at 100 TB. The convergence probe moves ONE scalar to the
  * driver per superstep (labels only ever decrease under min-propagation,
  * so the label sum is strictly monotone until fixpoint — a cheap agg
  * instead of a changed-rows join).
  *
  * If the iteration cap is reached without convergence the result would be
  * silently wrong (plausible-looking but un-merged labels), so this THROWS
  * instead of returning — loud failure over quiet corruption.
  */
object ConnectedComponents {

  /** @param pairs undirected edges, columns (src, dst); each pair need
    *              appear in one direction only.
    * @return one row per node: (id, comp) where comp is the minimum node
    *         id reachable from id.
    */
  def run(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the pair set ONCE before mirroring it: the producer may
    // itself be an expensive query (near-dup detection), and a raw
    // self-union would both recompute it and drag its constraints through
    // every superstep's analysis.
    val p = pairs.select(col("src"), col("dst")).localCheckpoint()
    val edges = p
      .unionAll(p.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    // coalesce: sum over an EMPTY label set is null — an empty graph must
    // converge immediately (sum 0 == 0), not NPE on the driver probe.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("comp")), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // Propagation: min over neighbors' labels, folded into the node's
      // own label with least(). Every labeled node has >=1 edge (labels
      // derive from the edge set), so the inner joins never drop nodes.
      val nbr = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("nmin"))
        .withColumnRenamed("src", "nid")
      val stepped = labels.join(nbr, col("id") === col("nid"))
        .select(col("id"), least(col("comp"), col("nmin")).as("comp"))
      // Pointer jump: comp := min(comp, comp(comp)). Labels are always
      // node ids (min of ids is an id), so the self-join never drops rows.
      val m = stepped.select(col("id").as("mid"), col("comp").as("mcomp"))
      val jumped = stepped.join(m, col("comp") === col("mid"))
        .select(col("id"), least(col("comp"), col("mcomp")).as("comp"))
      val next = jumped.localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter supersteps " +
          "(graph diameter exceeds 2^maxIter) — refusing to return " +
          "partially-merged labels; raise maxIter")
    labels
  }
}
