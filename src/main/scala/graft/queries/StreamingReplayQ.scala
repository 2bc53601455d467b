package graft.queries

import graft._
import graft.ops.ColumnOps._
import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** TRUE streaming paths under the DuckDB oracle gate via deterministic
  * replay (the round-12 verdict's ask): each query stages a landing dir
  * derived from the `events` table, drives a real `readStream` →
  * stateful transform → committed sink through `Trigger.AvailableNow`
  * with `maxFilesPerTrigger = 1` (so the run spans MULTIPLE micro-batches
  * and state genuinely carries across batch boundaries), then returns
  * the committed sink's contents. The oracle is the batch twin over the
  * ORIGINAL events table — a streaming bug (lost state, double-apply,
  * torn snapshot, watermark mis-eviction) hash-fails the round.
  *
  * Determinism contract: the staged input is a pure function of the
  * events table (originals + EXACT duplicates of event_id % 10 == 0 in
  * a separate file, so a duplicate and its original land in different
  * micro-batches and dedup must hit cross-batch state); the watermark
  * delay exceeds the fixture's whole event-time span, so no row is ever
  * late-dropped or state-evicted and the result is independent of file
  * order and batch boundaries. The upsert snapshot's latest-wins order
  * (ts, event_id) is total because event_id is unique.
  *
  * 100 TB reading: both shapes are the production ones — keyed state
  * sharded across executors (dedup), and a versioned keyed snapshot
  * rewritten per micro-batch (CDC-apply); the landing fixture grows
  * linearly with events and streams through in O(|batch|) memory.
  */
object StreamingReplayQ {

  private val tsSec = "yyyy-MM-dd HH:mm:ss"

  /** Landing dir, staged ONCE per source dir (fixture discipline):
    * events written as 2 part files plus the duplicates as a third file,
    * published by ATOMIC directory rename so a killed JVM never leaves a
    * half-staged landing behind the guard. */
  private def landingDir(spark: SparkSession, dir: String): String = {
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = s"${sys.props("java.io.tmpdir")}/graft_stream_landing_v1$dirTag"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val tmp = new org.apache.hadoop.fs.Path(path + ".build")
      fs.delete(tmp, true)
      val ev = Tables(spark, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      ev.repartition(2).write.mode("overwrite").parquet(tmp.toString)
      ev.filter(pmod(col("event_id"), lit(10)) === 0)
        .coalesce(1).write.mode("append").parquet(tmp.toString)
      if (!fs.rename(tmp, p)) fs.delete(tmp, true) // benign race: winner published
    }
    path
  }

  private def fileStream(spark: SparkSession, landing: String): DataFrame = {
    val schema = spark.read.parquet(landing).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(landing)
  }

  // Delay longer than any fixture's event-time span: nothing is ever
  // late-dropped or evicted, so the replay is batching-independent.
  private val SpanProofWatermark = "3650 days"

  /** Streaming exact dedup, end-to-end: landing (with injected exact
    * duplicates) → dropDuplicatesWithinWatermark keyed state → append
    * parquet sink, AvailableNow. The sink must hold exactly one row per
    * event_id — the oracle is simply the original events table, so BOTH
    * a missed duplicate (extra row) and an over-aggressive eviction
    * (lost row) fail rows+hash. */
  val stDedupReplay: Q = Q(
    "st_dedup_replay",
    (spark, dir) => {
      val landing = landingDir(spark, dir)
      val sink = Files.createTempDirectory("graft_stdedup_sink").toString
      val ckpt = Files.createTempDirectory("graft_stdedup_ckpt").toString
      val q = StreamingOps.dedupEvents(fileStream(spark, landing), SpanProofWatermark)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(sink)
        .select(col("event_id"), date_format(col("ts"), tsSec).as("ts_s"),
          col("user_id"), col("event_type"), cents(col("value")).as("value_cents"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           | user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents
           |FROM events ORDER BY event_id""".stripMargin))

  /** Streaming CDC-apply upsert, end-to-end: landing → foreachBatch
    * versioned latest-per-user snapshot ([[StreamingOps.upsertLatestSink]],
    * one deterministic rewrite per micro-batch with replay-safe version
    * selection and pruning) → read ONLY through the newest committed
    * version. The oracle is the batch latest-per-user over events
    * (ROW_NUMBER on the total (ts, event_id) order), so a stale version,
    * a double-applied batch, or a dropped key hash-fails. */
  val stUpsertReplay: Q = Q(
    "st_upsert_replay",
    (spark, dir) => {
      val landing = landingDir(spark, dir)
      val snap = Files.createTempDirectory("graft_stupsert_snap").toString
      val ckpt = Files.createTempDirectory("graft_stupsert_ckpt").toString
      val q = StreamingOps.upsertLatestSink(fileStream(spark, landing), snap, ckpt,
        trigger = Some(Trigger.AvailableNow()))
      q.awaitTermination()
      val latest = StreamingOps.latestSnapshot(snap)
        .getOrElse(sys.error("no committed snapshot version after replay"))
      spark.read.parquet(latest)
        .select(col("user_id"), date_format(col("ts"), tsSec).as("ts_s"),
          col("event_id"), cents(col("value")).as("value_cents"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           | event_id, CAST(round(value*100) AS BIGINT) AS value_cents
           |FROM (SELECT user_id, ts, event_id, value,
           |        ROW_NUMBER() OVER (PARTITION BY user_id
           |          ORDER BY ts DESC, event_id DESC) AS rn
           |      FROM events) t
           |WHERE rn = 1 ORDER BY user_id""".stripMargin))

  val all: Seq[Q] = Seq(stDedupReplay, stUpsertReplay)
}
