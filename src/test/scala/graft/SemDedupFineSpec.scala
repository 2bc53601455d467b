package graft

import graft.queries.DedupQ

/** Exercises the pow2 > 1 sub-clustering path of SemDeDup, which is dead
  * under the production threshold (512) at gate scale: with the split
  * threshold forced to 8 every sf0.001 label (~42–63 members) fans out
  * 8-way. Cross-engine equivalence of the split path is hash-checked by
  * the `d_semdedup_fine` oracle entry; these tests pin the Spark-side
  * invariants the oracle can't state directly.
  */
class SemDedupFineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val flat = DedupQ.semDedupDf(spark, dir).collect()
  private lazy val fine = DedupQ.semDedupDf(spark, dir, threshold = 8L).collect()

  test("threshold 8 engages pow2 > 1: per-sub-cluster centroids differ from flat") {
    // Same universe either way: one row per vector, binary dropped flag.
    assert(fine.length == flat.length)
    val fineIds = fine.map(_.getLong(1)).toSet
    assert(fineIds == flat.map(_.getLong(1)).toSet)
    assert(fineIds.size == fine.length)
    assert(fine.forall(r => r.getLong(3) == 0L || r.getLong(3) == 1L))
    // d2n is the n-scaled distance to the (label, sub) centroid; with an
    // 8-way fan-out the sub-cluster centroids cannot all coincide with
    // the whole-label centroid, so at least one vector's d2n must move.
    val flatD2 = flat.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(fine.exists(r => flatD2(r.getLong(1)) != r.getLong(2)),
      "fan-out 8 produced identical centroid distances — sub-clustering did not engage")
  }

  test("any threshold above the max label population reproduces the flat output") {
    // All sf0.001 labels are < 512 members, so both runs take fan-out 1
    // and the parameterization must be invisible.
    val huge = DedupQ.semDedupDf(spark, dir, threshold = 1L << 40).collect()
    assert(huge.map(_.toSeq).toSeq == flat.map(_.toSeq).toSeq)
  }

  test("registered d_semdedup_fine twin matches the direct builder at threshold 8") {
    val reg = SparkEntry.queries("d_semdedup_fine")(spark, dir).collect()
    assert(reg.map(_.toSeq).toSeq == fine.map(_.toSeq).toSeq)
    assert(SparkEntry.oracleSql("d_semdedup_fine").contains("WHEN COUNT(*) <= 8 THEN 1"))
  }
}
