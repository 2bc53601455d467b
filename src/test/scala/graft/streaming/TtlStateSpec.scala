package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** One probe-output row: the value each state held on arrival (-1 when
  * absent or TTL-expired). */
final case class TtlOut(k: Long, short_prev: Long, long_prev: Long)

/** Two ValueStates on the same key, identical writes, different
  * processing-time TTLs — so one run can show the SHORT state expired
  * while the LONG state survived, proving the eviction is TTL-driven
  * rather than a restart dropping all state. */
private final class TtlProbeProcessor(shortMs: Long, longMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), TtlOut] {
  @transient private var shortState: ValueState[Long] = _
  @transient private var longState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    shortState = getHandle.getValueState[Long]("short",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(shortMs)))
    longState = getHandle.getValueState[Long]("long",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(longMs)))
  }

  override def handleInputRows(k: Long, rows: Iterator[(Long, Long)],
                               timerValues: TimerValues): Iterator[TtlOut] = {
    val sPrev = if (shortState.exists()) shortState.get() else -1L
    val lPrev = if (longState.exists()) longState.get() else -1L
    rows.foreach { case (_, v) => shortState.update(v); longState.update(v) }
    Iterator.single(TtlOut(k, sPrev, lPrev))
  }
}

/** The state-TTL arm of transformWithState (claimed in SURVEY's TWS
  * rows, previously untested). Three separate AvailableNow runs off one
  * checkpoint (a long-lived ProcessingTime-TTL query spins empty
  * micro-batches forever — the runs must terminate):
  *  1. seed both states — NOTE each run polls for its expected output
  *     then stops the query: a ProcessingTime-mode TWS query never
  *     terminates even under AvailableNow, and even processAllAvailable
  *     never drains (the engine schedules empty TTL-eviction batches
  *     back-to-back forever — measured: thousands of empty epochs), so
  *     poll-output-then-stop is the only terminating shape;
  *  2. immediate re-touch — the LONG state must survive the restart
  *     (a TTL that expires everything, or state lost across restart,
  *     fails here);
  *  3. re-touch after sleeping past the short TTL — the SHORT state
  *     must be gone while the LONG state from run 2 is still present
  *     (a TTL that silently never expires — unbounded state at 100 TB —
  *     fails here, and the surviving long state proves the eviction was
  *     TTL-driven, not a restart artifact).
  */
class TtlStateSpec extends SparkSpec with RocksDbProvider {

  test("ValueState TTL: survives restart within TTL, expires past it") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    withRocksDbProvider(spark) {
      val ckpt = java.nio.file.Files.createTempDirectory("ttl_spec_ckpt").toString
      val in = MemoryStream[(Long, Long)]
      val out = in.toDS().groupByKey(_._1)
        .transformWithState(new TtlProbeProcessor(shortMs = 2000, longMs = 10L * 60 * 1000),
          TimeMode.ProcessingTime(), OutputMode.Update())
      val emitted = scala.collection.mutable.ListBuffer.empty[TtlOut]
      def runUntil(what: String)(expect: Seq[TtlOut] => Boolean): Seq[TtlOut] = {
        val q = out.writeStream
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Update())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[TtlOut], _: Long) =>
            emitted.synchronized { emitted ++= b.collect() }; ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        val deadline = System.currentTimeMillis() + 90000
        try {
          while (!emitted.synchronized(expect(emitted.toSeq))) {
            assert(System.currentTimeMillis() < deadline,
              s"$what: expected output never arrived; got ${emitted.synchronized(emitted.toList)}")
            Thread.sleep(100)
          }
        } finally { q.stop(); q.awaitTermination() }
        emitted.synchronized(emitted.toSeq)
      }

      in.addData((1L, 10L))
      runUntil("seed run")(_.contains(TtlOut(1L, -1L, -1L)))

      emitted.clear()
      in.addData((1L, 20L)) // immediate: within both TTLs (long = 10 min margin)
      runUntil("restart-survival run")(_.exists(_.long_prev == 10L))

      Thread.sleep(3500) // > 2 s short TTL, generous margin for a loaded host
      emitted.clear()
      in.addData((1L, 30L))
      runUntil("expiry run")(_.exists(o => o.short_prev == -1L && o.long_prev == 20L))

      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
      }
      del(new java.io.File(ckpt))
    }
  }
}
