package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated per-query profiler: runs the named registered queries in a
  * fresh `local[32]` session, three timed passes each (pass 1 includes
  * codegen/layout warmup), then prints the executed plan. The in-bench
  * numbers in BENCH_local.json are measured inside a 204-query JVM on a
  * noisy host — this is the tool that separates a real plan regression
  * from ambient load (round 7: x_shipping_priority read 19.4 s in-bench
  * on a stormy pass, 1.4 s warm isolated, plan healthy).
  *
  * Usage: sbt "runMain graft.tools.QueryProbe x_shipping_priority ..."
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"PROBE $name pass$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // Release this pass's localCheckpoint blocks (Verify/Bench do the
        // same): at the 100x probe scale three passes of an un-released
        // checkpointed grain stack up real storage pressure and pass 3
        // measures eviction, not the plan.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count() // resolve AQE before printing the final plan
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
