package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-tail fixed-cost decomposition (r18, VERDICT r17 task 7): the
  * ~300 sub-second batch keys carry ≈90 s of the committed floor total at
  * ~0.3 s/key, attributed to per-query "planning/codegen" twice now
  * without a measurement. This tool splits each key's wall time into
  *
  *   - construct: building the DataFrame (query-fn call — includes any
  *     eager fixture/localCheckpoint work a key does up front),
  *   - plan: forcing `queryExecution.executedPlan` (analysis +
  *     optimization + physical planning; whole-stage codegen SOURCE
  *     generation happens lazily at execution),
  *   - exec: the `count()` action (job run + codegen compile on first
  *     execution; Janino caches compiled classes JVM-wide, so pass 2
  *     isolates the compile share as pass1.exec - pass2.exec).
  *
  * Two passes per key; prints per-key lines plus a summed decomposition.
  * Usage: tools/run_main.sh graft.tools.TailPlanProbe [maxFloorSec]
  * (keys selected = every registered query whose committed floor in
  * BENCH_local.json is below maxFloorSec, default 0.5; pass names after
  * the threshold to probe a specific list instead).
  */
object TailPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val maxFloor = args.headOption.map(_.toDouble).getOrElse(0.5)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally {
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("v")
      (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
        .withColumn("rn", row_number().over(w))
        .groupBy("k").agg(sum("rn")).count()
      graft.Tables(spark, dir, "lineitem").select(count(lit(1))).count()
    }
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else {
        // floors line = 4th JSON line of BENCH_local.json ("isolated_floors"
        // covers only the slowest 25); use line 1's full per-query map.
        val first = scala.io.Source.fromFile("BENCH_local.json").getLines().next()
        val qpart = first.substring(first.indexOf("\"queries\":{") + 11)
        val entries = qpart.takeWhile(_ != '}').split(",")
        entries.flatMap { e =>
          val Array(k, v) = e.split(":")
          val name = k.replaceAll("\"", "")
          if (v.toDouble < maxFloor && graft.SparkEntry.queries.contains(name))
            Some(name) else None
        }.toSeq.sorted
      }
    println(s"[tail] probing ${names.size} keys with floor < $maxFloor s")
    case class T(construct: Double, plan: Double, exec: Double)
    def one(name: String): T = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      try df.count() catch { case e: Throwable =>
        System.err.println(s"[tail] $name FAILED: ${e.getMessage}")
      }
      val t3 = System.nanoTime()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      T((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    val rows = names.map { n =>
      val p1 = one(n); val p2 = one(n)
      println(f"[tail] $n%-28s p1(con=${p1.construct}%.3f plan=${p1.plan}%.3f exec=${p1.exec}%.3f) " +
        f"p2(con=${p2.construct}%.3f plan=${p2.plan}%.3f exec=${p2.exec}%.3f)")
      (n, p1, p2)
    }
    def tot(f: ((String, T, T)) => Double) = rows.map(f).sum
    println(f"[tail] TOTALS over ${rows.size} keys:")
    println(f"[tail]   pass1 construct=${tot(_._2.construct)}%.1f plan=${tot(_._2.plan)}%.1f exec=${tot(_._2.exec)}%.1f")
    println(f"[tail]   pass2 construct=${tot(_._3.construct)}%.1f plan=${tot(_._3.plan)}%.1f exec=${tot(_._3.exec)}%.1f")
    println(f"[tail]   codegen-compile share (p1.exec - p2.exec) = ${tot(_._2.exec) - tot(_._3.exec)}%.1f s " +
      "(upper bound: includes first-touch I/O cache effects)")
    spark.stop()
  }
}
