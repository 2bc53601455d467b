package graft.ops

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** a_hll_merge has no SQL oracle (sketch internals are
  * implementation-specific), so its correctness contract lives here:
  * every per-nation estimate and the merged global estimate must sit
  * within 5% of the exact distinct counts (default lgConfigK=12 HLL is
  * ~1.6% at these cardinalities, so 5% is a stable bound, not a tuned
  * one), and the union row must genuinely reflect ALL nations. */
class HllMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-group and merged estimates within 5% of exact counts") {
    val est = Registry.byName("a_hll_merge").run(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables(spark, sf, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Tables(spark, sf, "customer")
      .select(countDistinct(col("c_custkey"))).head().getLong(0)

    exact.foreach { case (nation, n) =>
      val e = est(nation)
      assert(math.abs(e - n) <= math.max(1.0, 0.05 * n),
        s"nation $nation: est $e vs exact $n")
    }
    val eAll = est(-1L)
    assert(math.abs(eAll - total) <= math.max(1.0, 0.05 * total),
      s"union row: est $eAll vs exact $total")
    assert(est.size == exact.size + 1) // all nations + the union row
  }
}
