package graft.ops

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** a_hll_merge's 5% band check now runs under the DuckDB oracle gate
  * (the query emits exact counts + a within_band flag); this spec keeps
  * the NUMERIC evidence behind that bound — it recomputes the sketch
  * estimates inline and measures the actual error against the exact
  * distinct counts (default lgConfigK=12 HLL is ~1.6% at these
  * cardinalities, so 5% is a stable bound, not a tuned one) — and pins
  * the query's own contract: every grain flagged in-band, exact counts
  * matching an independent recomputation, union row present. */
class HllMergeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("per-group and merged estimates within 5% of exact counts") {
    val cust = Tables(spark, sf, "customer")
    val est = cust.groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
    val perNation = est
      .select(col("nation"), hll_sketch_estimate(col("sk")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val merged = est.agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0).toDouble
    val exact = cust
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = cust.select(countDistinct(col("c_custkey"))).head().getLong(0)

    exact.foreach { case (nation, n) =>
      val e = perNation(nation)
      assert(math.abs(e - n) <= math.max(1.0, 0.05 * n),
        s"nation $nation: est $e vs exact $n")
    }
    assert(math.abs(merged - total) <= math.max(1.0, 0.05 * total),
      s"union row: est $merged vs exact $total")
  }

  test("a_hll_merge query contract: exact counts verified, every grain in-band") {
    val rows = Registry.byName("a_hll_merge").run(spark, sf).collect()
    val exact = Tables(spark, sf, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(countDistinct(col("c_custkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Tables(spark, sf, "customer")
      .select(countDistinct(col("c_custkey"))).head().getLong(0)

    assert(rows.length == exact.size + 1) // all nations + the union row
    rows.foreach { r =>
      val (nation, ex, ok) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(ok == 1L, s"nation $nation estimate outside the 5% band")
      assert(ex == (if (nation == -1L) total else exact(nation)),
        s"nation $nation exact count drifted: $ex")
    }
  }
}
