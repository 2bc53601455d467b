package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** One-shot probe for the Spark 4 state data source reader surface:
  * runs a small dropDuplicatesWithinWatermark stream to a scratch
  * checkpoint, then reads it back via `format("statestore")` and
  * `format("state-metadata")` and prints the exact schemas/rows — the
  * ground truth the st_state_read / st_state_meta oracles pin.
  *
  * Usage: tools/run_main.sh graft.tools.StateProbe /root/testdata/sf0.001
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-state-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.Tables(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val landing = Files.createTempDirectory("graft_stateprobe_landing").toString
    ev.repartition(3).write.mode("overwrite").parquet(landing)

    val sink = Files.createTempDirectory("graft_stateprobe_sink").toString
    val ckpt = Files.createTempDirectory("graft_stateprobe_ckpt").toString
    val schema = spark.read.parquet(landing).schema
    val q = graft.streaming.StreamingOps.dedupEvents(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(landing),
        watermark = "3650 days")
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    println("=== state-metadata ===")
    val meta = spark.read.format("state-metadata").load(ckpt)
    meta.printSchema()
    meta.show(20, truncate = false)

    println("=== statestore ===")
    val st = spark.read.format("statestore").option("path", ckpt).load()
    st.printSchema()
    st.show(10, truncate = false)
    println("state rows: " + st.count() + "  events: " + ev.count())

    Seq(landing, sink, ckpt).foreach(p => rm(new java.io.File(p)))
    spark.stop()
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }
}
