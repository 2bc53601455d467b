package graft.ops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants of d_cluster_cc that the SQL oracle can't express directly:
  * the labeling must be a valid connected-components assignment for the
  * pair graph, on data the oracle never sees (synthetic edges here, the
  * testdata pair graph in Verify).
  */
class ClusterCCSpec extends SparkSpec {

  test("components over the sf0.001 near-dup graph are edge-consistent and min-labeled") {
    val dir = "/root/testdata/sf0.001"
    val comp = Registry.byName("d_cluster_cc").run(spark, dir)
    val pairs = Registry.byName("d_embed_neardup").run(spark, dir)
      .select(col("vec_a"), col("vec_b"))

    // every edge's endpoints share a component
    val inconsistent = pairs
      .join(comp.withColumnRenamed("id", "vec_a").withColumnRenamed("comp", "ca"), "vec_a")
      .join(comp.withColumnRenamed("id", "vec_b").withColumnRenamed("comp", "cb"), "vec_b")
      .filter(col("ca") =!= col("cb"))
    assert(inconsistent.isEmpty, "edge endpoints assigned to different components")

    // the label is the minimum id of the component (and thus <= every id)
    val compRows = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(compRows.nonEmpty)
    assert(compRows.forall { case (id, c) => c <= id })
    val byComp = compRows.groupBy(_._2)
    assert(byComp.forall { case (c, members) => members.keySet.min == c },
      "component label is not the min member id")
  }
}
