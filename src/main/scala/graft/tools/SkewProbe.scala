package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE skew-join probe (round-14 verdict stretch task): measure how
  * `spark.sql.adaptive.skewJoin` splits one hot join key, against the
  * same join with the splitter disabled — the data for SCALE.md's "when
  * is manual salting (j_skew_salted) still needed" row.
  *
  * Shape: lineitem at the decade dir, join key = `l_orderkey % 100`
  * except ~30 % of rows collapsed onto key 0 (one genuinely hot key
  * among 99 normal ones — AQE's skew detector needs a hot PARTITION
  * relative to the median, which the 3-uniformly-hot-keys shape of
  * j_skew_salted deliberately does not give it). The dim side is a
  * 100-row frame; broadcast is disabled on both the static and AQE
  * planners so the join stays sort-merge — the only join kind the
  * skew splitter rewrites.
  *
  * Thresholds: the DEFAULT skewedPartitionThresholdInBytes (256 MB) and
  * advisoryPartitionSizeInBytes (64 MB) target cluster-scale shuffle
  * partitions; at this probe's scale the hot partition is tens of MB,
  * so the probe lowers them (8 MB / 2 MB) to make the detector see the
  * same RELATIVE skew a 100 TB run would. That is the first SCALE.md
  * lesson: AQE skew-join is size-threshold-gated, so a "skewed but
  * everywhere-small" stage under the advisory size is never split —
  * manual salting remains the tool there, and for skewed AGGREGATIONS
  * (no join for AQE to rewrite).
  *
  * Reported per variant: wall seconds, join-stage task count, max and
  * median task ms — the spread collapse (max/median → ~1) is the win.
  */
object SkewProbe {

  private final class TaskStats extends SparkListener {
    val durations = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      durations += ((t.stageId, t.taskInfo.duration))
    }
    def reset(): Unit = synchronized(durations.clear())
    private def size: Int = synchronized(durations.length)
    /** Listener-bus delivery is async: wait until no new TaskEnd has
      * arrived for 500 ms (bounded at 10 s) before reading, so a variant
      * neither misses trailing events nor inherits the previous one's. */
    def quiesce(): Unit = {
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = size
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    }
    /** (task count, max ms, median ms) of the BOTTLENECK stage — the one
      * holding the longest single task. Wall-clock is gated on that task;
      * by-total-time selection flips between the (uniform) scan and the
      * (skewed) join once the page cache warms, muddying the comparison. */
    def heaviestStage(): (Int, Long, Long) = synchronized {
      if (durations.isEmpty) (0, 0L, 0L)
      else {
        val byStage = durations.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted)
        val (_, ds) = byStage.maxBy(_._2.last)
        (ds.length, ds.last, ds(ds.length / 2))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      s"${sys.props("java.io.tmpdir")}/graft_sf100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep the join a sort-merge join: broadcast would bypass both the
      // skew and the splitter
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // scale AQE's size gates down to the probe's data (see scaladoc)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      // coalescing would merge the 99 small partitions and muddy the
      // task-count comparison; leave partitions as sized
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    // One hot key (0) holding ~30% of the fact, 99 normal keys.
    val fact = graft.Tables(spark, dir, "lineitem")
      .select(
        when(col("l_orderkey") % 100 < 30, lit(0L))
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_extendedprice"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("grp_"), col("id") % 10).as("grp"))

    def run(skewJoin: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      stats.reset()
      val t0 = System.nanoTime()
      val n = fact.join(dim, "k")
        .groupBy(col("grp"))
        .agg(sum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
        .collect().map(_.getLong(2)).sum
      val wall = (System.nanoTime() - t0) / 1e9
      stats.quiesce() // async listener bus: drain before reading/resetting
      val (tasks, maxMs, medMs) = stats.heaviestStage()
      println(f"PROBE skewJoin=$skewJoin%-5s wall=$wall%6.2f s rows=$n " +
        f"joinStageTasks=$tasks maxTaskMs=$maxMs medianTaskMs=$medMs " +
        f"spread=${maxMs.toDouble / math.max(1, medMs)}%.1fx")
    }

    run(skewJoin = false) // also warms the input cache
    run(skewJoin = false)
    run(skewJoin = true)
    run(skewJoin = true)
    spark.stop()
  }
}
