package graft

import org.apache.spark.sql.Row

/** Value-level invariants for the round-12 additions — cross-row
  * properties the DuckDB oracle's single hash compare can't express,
  * checked at sf0.001.
  */
class RoundTwelveOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("e_kmeans_step partitions the corpus: all 8 clusters, counts sum to N") {
    val r = rows("e_kmeans_step")
    // seeds are corpus members, so every seed self-assigns at d2=0 and no
    // cluster can come back empty
    assert(r.map(_.getLong(0)).toSeq == (0L to 7L), s"cluster ids: ${r.toSeq}")
    val n = Tables(spark, dir, "embeddings").count()
    assert(r.map(_.getLong(1)).sum == n, "assignment is not a partition of the corpus")
    r.foreach(row => assert(row.getLong(2) >= 0, s"negative inertia: $row"))
  }

  test("e_kmeans_step inertia bounds the self-assigned seeds at zero contribution") {
    // each seed contributes d2=0, so every cluster's inertia is achievable
    // by (n_members - 1) non-seed members only: inertia == 0 iff singleton
    rows("e_kmeans_step").foreach { row =>
      if (row.getLong(1) == 1L) assert(row.getLong(2) == 0L, s"singleton with inertia: $row")
    }
  }

  test("e_knn_graph edges are canonical, unique, and degree-bounded by k=3") {
    val r = rows("e_knn_graph")
    assert(r.nonEmpty, "no mutual edges at sf0.001")
    val edges = r.map(row => (row.getLong(0), row.getLong(1)))
    assert(edges.forall { case (a, b) => a < b }, "non-canonical edge order")
    assert(edges.distinct.length == edges.length, "duplicate edges")
    // a vertex's mutual edges are a subset of its own directed top-3
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity)
    deg.foreach { case (v, occ) => assert(occ.length <= 3, s"degree > 3 at vertex $v") }
  }

  test("q_auc is a valid probability and num2 respects the pair budget") {
    val r = rows("q_auc")
    assert(r.length == 1)
    val (nPos, nNeg, num2, aucBp) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nPos > 0 && nNeg > 0, "degenerate eval cohort")
    assert(num2 >= 0 && num2 <= 2 * nPos * nNeg, s"num2 outside [0, den2]: ${r(0)}")
    assert(aucBp >= 0 && aucBp <= 10000, s"AUC outside [0, 1]: ${r(0)}")
  }

  test("s_reservoir draws exactly k=100 distinct docs in priority order") {
    val r = rows("s_reservoir")
    assert(r.length == 100)
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == 100, "duplicate docs in the sample")
    val prios = r.map(_.getLong(0))
    assert(prios.zip(prios.tail).forall { case (a, b) => a <= b }, "not in priority order")
  }
}
