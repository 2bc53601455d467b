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
        // Flush with a DISJOINT user id: the watermark advances past
        // every real session's gap boundary while the real users receive
        // NO input rows — so every end-of-stream open session must close
        // through handleExpiredTimer (the timer path), not through an
        // in-batch gap split. A second push triggers the follow-up batch
        // in which the advanced watermark fires the timers.
        val maxTs = evs.map(_.ts.getTime).max
        in.addData(Event(999998L, new java.sql.Timestamp(maxTs + 10 * gapMs), 999998L, "flush", 0.0))
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

  /** Cross-batch LATE rows (newer than the watermark, older than the open
    * session) must be placed by interval proximity, not blindly appended:
    * within the gap of the span they merge and extend the span DOWNWARD;
    * older than start − gap they close immediately as their own session.
    * Needs a watermark delay wide enough that Spark's pre-processor
    * late-record filter doesn't drop them first (rows at or below the
    * watermark never reach the fold — verified by the tight-watermark
    * replay test above, where out-of-order feeds are impossible). */
  test("late rows merge by interval proximity and never inflate the session start") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 30L * 60000
    val base = 1700000000000L
    def ev(id: Long, minute: Long, u: Long) =
      Event(id, new java.sql.Timestamp(base + minute * 60000), u, "x", 0.0)
    withRocksDbProvider(spark) {
      val in = MemoryStream[Event]
      val q = StreamingOps.timerSessions(in.toDS(), gap, watermark = "3 hours")
        .writeStream.format("memory").queryName("t_late_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(ev(1, 100, 1)); q.processAllAvailable()
        in.addData(ev(2, 95, 1)); q.processAllAvailable()  // late, within gap → merge downward
        in.addData(ev(3, 20, 1)); q.processAllAvailable()  // older than start − gap → own session
        in.addData(ev(8, 1000, 8)); q.processAllAvailable() // watermark push (disjoint user)
        in.addData(ev(9, 2000, 9)); q.processAllAvailable() // timer-firing batch
        val got = spark.table("t_late_sessions").as[UserSession].collect()
          .filter(_.user_id == 1L)
          .map(s => ((s.start_ms - base) / 60000, (s.end_ms - base) / 60000, s.n_events)).toSet
        assert(got == Set((20L, 20L, 1L), (95L, 100L, 2L)),
          s"late-row placement wrong: $got")
      } finally q.stop()
    }
  }
}
