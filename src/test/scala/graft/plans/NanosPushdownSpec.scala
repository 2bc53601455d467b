package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The nanos-pushdown rule must (a) put a raw-long ts predicate into the
  * parquet scan's PushedFilters and (b) never change results — checked by
  * comparing against the same filter evaluated with the rule disabled.
  */
class NanosPushdownSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ts range filter reaches PushedFilters (raw nanos bounds on long layout)") {
    // Layout-adaptive like the results test below: only the TIMESTAMP(NANOS)
    // drop stores ts as a raw long needing the rule; a timestamp[us] drop
    // pushes plain timestamp bounds natively. Assert pushdown either way,
    // and raw-long numeric bounds only when the raw schema is LongType.
    val e = Tables(spark, dir, "events") // FIRST: sets nanosAsLong so the raw probe below can't crash on a nanos drop
    val rawIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == org.apache.spark.sql.types.LongType
    val f = e.filter(col("ts").between(lit("2024-01-02 00:00:00"), lit("2024-01-05 00:00:00")))
    val plan = planOf(f)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts,"), s"no lower bound in: $pushed")
    assert(pushed.contains("LessThanOrEqual(ts,"), s"no upper bound in: $pushed")
    if (rawIsLong) {
      // bounds must be the raw nanos longs, not timestamp strings
      assert("GreaterThanOrEqual\\(ts,\\d+\\)".r.findFirstIn(pushed).isDefined,
        s"lower bound not a raw long in: $pushed")
      assert("LessThanOrEqual\\(ts,\\d+\\)".r.findFirstIn(pushed).isDefined,
        s"upper bound not a raw long in: $pushed")
    }
  }

  test("derived predicates never change results (vs rule disabled)") {
    val filters: Seq[org.apache.spark.sql.Column] = Seq(
      col("ts") >= lit("2024-01-10 00:00:00"),
      col("ts") > lit("2024-01-10 00:00:00"),
      col("ts") <= lit("2024-01-12 08:30:00"),
      col("ts") < lit("2024-01-12 08:30:00"),
      col("ts").between(lit("2024-01-05 00:00:00"), lit("2024-01-06 00:00:00")) ||
        col("ts").between(lit("2024-01-20 00:00:00"), lit("2024-01-21 00:00:00")))
    val e = Tables(spark, dir, "events") // registers the rule
    val withRule = filters.map(f => e.filter(f).count())
    val saved = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = saved.filterNot(_ eq NanosPushdown)
      val without = filters.map { f =>
        // Mirror Tables.events' schema adaptivity: older driver drops store
        // ts as TIMESTAMP(NANOS) (read as long), newer ones as timestamp[us]
        // (read natively) — the spec must not assume either layout.
        val raw = spark.read.parquet(s"$dir/events.parquet")
        val e2 =
          if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else raw
        e2.filter(f).count()
      }
      assert(withRule == without)
      assert(withRule.head > 0) // nonempty — the comparison is meaningful
    } finally spark.experimental.extraOptimizations = saved
  }

  test("boundary exactness: events at the microsecond edge stay included") {
    // build a tiny nanos-long table around a whole-second boundary
    val spark2 = spark
    import spark2.implicits._
    val boundaryUs = java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime * 1000L
    val ns = Seq(
      boundaryUs * 1000L - 1L,   // 1ns before the boundary -> us floor is boundary-1us
      boundaryUs * 1000L,        // exactly at
      boundaryUs * 1000L + 999L, // same us
      boundaryUs * 1000L + 1000L) // next us
    val df = ns.toDF("ts").withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val n = df.filter(col("ts") >= lit("2024-01-10 00:00:00")).count()
    assert(n == 3)
    val n2 = df.filter(col("ts") < lit("2024-01-10 00:00:00")).count()
    assert(n2 == 1)
  }
}
