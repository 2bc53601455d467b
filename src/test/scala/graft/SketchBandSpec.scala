package graft

import org.apache.spark.sql.functions._

/** Liveness + positive checks for the round-13 deterministic band
  * oracles on the approximate sketches: every flag must be 1 on the
  * real estimates (the positive half the DuckDB gate re-checks each
  * round), AND the same band formulas must return 0 when fed an
  * out-of-band estimate — a band check that cannot fail is
  * indistinguishable from no check.
  */
class SketchBandSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a_approx_distinct / a_hll_merge / a_approx_quantile flags are all 1") {
    SparkEntry.queries("a_approx_distinct")(spark, dir).collect()
      .foreach(r => assert(r.getLong(2) == 1L, s"out-of-band: $r"))
    SparkEntry.queries("a_hll_merge")(spark, dir).collect()
      .foreach(r => assert(r.getLong(2) == 1L, s"out-of-band: $r"))
    SparkEntry.queries("a_approx_quantile")(spark, dir).collect()
      .foreach { r =>
        assert(r.getLong(2) == 1L, s"p50 rank bound violated: $r")
        assert(r.getLong(3) == 1L, s"p99 rank bound violated: $r")
      }
  }

  test("the 5% band formula fails on an estimate outside the band") {
    // same expression shape as a_approx_distinct/a_hll_merge, fed a
    // deliberately-wrong estimate: 2x the exact count must flag 0,
    // and a 4% error must still flag 1
    val df = spark.range(1).select(
      lit(1000L).as("exact"), lit(2000L).as("bad_est"), lit(1040L).as("ok_est"))
    val r = df.select(
      when(abs(col("bad_est") - col("exact")) <= col("exact") * 0.05, 1L)
        .otherwise(0L).as("bad"),
      when(abs(col("ok_est") - col("exact")) <= col("exact") * 0.05, 1L)
        .otherwise(0L).as("ok")).head()
    assert(r.getLong(0) == 0L, "band check accepted a 100% error")
    assert(r.getLong(1) == 1L, "band check rejected a 4% error")
  }

  test("the rank-bound formula fails on an estimate outside eps*n ranks") {
    // a_approx_quantile's rankOk shape on a known distribution: values
    // 1..10000, p50 with eps=1/1000 admits ranks [4995, 5005]. An
    // estimate of 6000 (rank 6000) must flag 0; 5000 must flag 1.
    val n = 10000L
    val eps = 1.0 / 1000
    def rankOk(est: Long): Long = {
      val le = est // count(v <= est) for v = 1..n
      val lt = est - 1
      val lo = math.floor((0.5 - eps) * n).toLong
      val hi = math.ceil((0.5 + eps) * n).toLong
      if (le >= lo && lt <= hi) 1L else 0L
    }
    assert(rankOk(5000) == 1L)
    assert(rankOk(6000) == 0L, "rank bound accepted a 10% rank error")
    assert(rankOk(4000) == 0L, "rank bound accepted a low-side rank error")
  }
}
