package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The timer-closed sessionizer must be REPLAY-EQUIVALENT to plain batch
  * gap sessionization: feeding the events through the stream in ts order
  * — micro-batch boundaries drawn at random — and then flushing the
  * watermark past every gap must emit EXACTLY the session set a batch
  * islands fold computes (same starts, ends, and event counts). The
  * ground truth is computed in plain Scala, so this pins the streaming
  * semantics (timer registration, stale-timer guard, in-batch splits,
  * cross-batch merges) against an implementation-free definition rather
  * than against another Spark API.
  */
class StreamingTimerSessionSpec extends SparkSpec with RocksDbProvider {

  private val dir = "/root/testdata/sf0.001"
  private val gapMs = 6L * 3600 * 1000

  test("timer-closed sessions equal batch gap sessionization across random batch splits") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evs = graft.Tables(spark, dir, "events")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))

    // Ground truth: per-user islands fold (new session when the gap is
    // reached), identical continue-rule to the processor (diff < gap).
    val expected = evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val times = es.map(_.ts.getTime).sorted
      val sessions = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
      var start = times.head; var last = times.head; var n = 1L
      times.tail.foreach { t =>
        if (t - last < gapMs) { last = t; n += 1 }
        else { sessions += ((u, start, last, n)); start = t; last = t; n = 1 }
      }
      sessions += ((u, start, last, n))
      sessions
    }.toSet
    assert(expected.exists(_._4 >= 2), "fixture has no multi-event session — vacuous")
    assert(expected.groupBy(_._1).exists(_._2.size >= 2),
      "fixture has no user with multiple sessions — vacuous")

    val rnd = new scala.util.Random(11L)
    withRocksDbProvider(spark) {
      val in = MemoryStream[Event]
      val q = StreamingOps.timerSessions(in.toDS(), gapMs, watermark = "1 second")
        .writeStream.format("memory").queryName("t_timer_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        var rest = evs.toList
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(60)
          in.addData(rest.take(take))
          q.processAllAvailable()
          rest = rest.drop(take)
        }
        // Flush: one far-future event per user advances the watermark
        // past every real session's gap boundary, so every real session
        // closes via its timer; the flush events open sessions that are
        // never emitted. A trailing lone event pushes the watermark once
        // more so the flush batch's own timer work is observable.
        val maxTs = evs.map(_.ts.getTime).max
        val users = evs.map(_.user_id).distinct
        val flush = users.zipWithIndex.map { case (u, i) =>
          Event(900000L + i, new java.sql.Timestamp(maxTs + 10 * gapMs), u, "flush", 0.0)
        }
        in.addData(flush.toSeq)
        q.processAllAvailable()
        in.addData(Event(999999L, new java.sql.Timestamp(maxTs + 20 * gapMs), 999999L, "flush", 0.0))
        q.processAllAvailable()

        val streamed = spark.table("t_timer_sessions").as[UserSession].collect()
          .map(s => (s.user_id, s.start_ms, s.end_ms, s.n_events))
          .filter(_._2 <= maxTs) // drop the flush events' own sessions
          .toSet
        assert(streamed == expected,
          s"stream/batch divergence: onlyStream=${streamed -- expected} onlyBatch=${expected -- streamed}")
      } finally q.stop()
    }
  }
}
