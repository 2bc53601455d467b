package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Deterministic MemoryStream replays pinning the streaming semantics:
  * window finalization under watermark, late-data drop, stateful dedup,
  * and the flatMapGroupsWithState session machine with event-time timeout.
  */
class StreamingOpsSpec extends SparkSpec with RocksDbProvider {

  private def ts(min: Long): java.sql.Timestamp = new java.sql.Timestamp(min * 60000L)
  private def ev(id: Long, min: Long, user: Long = 1L, typ: String = "click", v: Double = 1.0) =
    Event(id, ts(min), user, typ, v)

  /** Run a query over a MemoryStream to a memory sink, processing each
    * batch of inputs as its own micro-batch. */
  private def runBatches(mode: OutputMode, build: DataFrame => DataFrame,
                         batches: Seq[Seq[Event]], name: String): Array[org.apache.spark.sql.Row] = {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q: StreamingQuery = build(in.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).collect()
    } finally q.stop()
  }

  test("tumbling windows finalize under the watermark; late rows dropped") {
    val out = runBatches(OutputMode.Append(), df => StreamingOps.tumblingCounts(df, "10 minutes", "10 minutes"),
      Seq(
        Seq(ev(1, 1), ev(2, 5), ev(3, 12)),  // windows [0,10) and [10,20)
        Seq(ev(4, 35)),                      // watermark -> 25: finalizes [0,10), [10,20)
        Seq(ev(5, 2)),                       // LATE (before watermark): must be dropped
        Seq(ev(6, 60))                       // finalizes [30,40)
      ), "t_tumble")
    val rows = out.map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(2))).sortBy(_._1)
    // [0,10) has events 1,2 only — the late event 5 did NOT land
    assert(rows.toSeq == Seq((0L, 2L), (10L, 1L), (30L, 1L)))
  }

  test("sliding windows emit overlapping finalized windows") {
    val out = runBatches(OutputMode.Append(), df => StreamingOps.slidingCounts(df, "10 minutes", "5 minutes", "5 minutes"),
      Seq(Seq(ev(1, 7)), Seq(ev(2, 40))), "t_slide")
    val rows = out.map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1))).sortBy(_._1)
    // event at min 7 belongs to [0,10) and [5,15)
    assert(rows.toSeq.take(2) == Seq((0L, 1L), (5L, 1L)))
  }

  test("session windows merge within gap and close after it") {
    val out = runBatches(OutputMode.Append(), df => StreamingOps.sessionCounts(df, "10 minutes", "10 minutes"),
      Seq(
        Seq(ev(1, 0), ev(2, 5), ev(3, 14)), // one session: gaps < 10
        Seq(ev(4, 60)),                     // watermark far ahead -> closes it
        Seq(ev(5, 100))                     // closes the min-60 session
      ), "t_session")
    val rows = out.map(r => (r.getTimestamp(0).getTime / 60000, r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.head == (0L, 1L, 3L)) // one 3-event session starting at 0
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    val out = runBatches(OutputMode.Append(), df => StreamingOps.dedupEvents(df, "30 minutes"),
      Seq(
        Seq(ev(1, 0), ev(1, 1), ev(2, 2)), // duplicate id=1 in-batch
        Seq(ev(1, 3), ev(3, 4))            // duplicate id=1 across batches
      ), "t_dedup")
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState session machine: event-time timeout closes sessions") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamingOps.userSessions(in.toDS(), gapMs = 10 * 60000L, watermark = "0 minutes")
      .writeStream.format("memory").queryName("t_fmgws").outputMode(OutputMode.Append()).start()
    try {
      // minute 1, not 0: the initial watermark is epoch 0 and a row AT the
      // watermark is dropped as late, an edge worth pinning here
      in.addData(Seq(ev(1, 1, user = 7), ev(2, 5, user = 7), ev(3, 6, user = 8)))
      q.processAllAvailable()
      in.addData(Seq(ev(4, 40, user = 9))) // watermark -> 40 > lastMs+gap: timeouts fire
      q.processAllAvailable()
      in.addData(Seq(ev(5, 80, user = 9))) // close user 9's first session too
      q.processAllAvailable()
      val rows = spark.table("t_fmgws").as[UserSession].collect()
        .map(s => (s.user_id, s.start_ms / 60000, s.end_ms / 60000, s.n_events)).sortBy(r => (r._1, r._2))
      assert(rows.toSeq == Seq((7L, 1L, 5L, 2L), (8L, 6L, 6L, 1L), (9L, 40L, 40L, 1L)))
    } finally q.stop()
  }

  test("stream-stream time-bound join pairs within the gap only") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val q = StreamingOps.timeBoundJoin(clicks.toDF(), buys.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("t_ssjoin").outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Seq(ev(1, 10, user = 1), ev(2, 30, user = 2)))
      buys.addData(Seq(
        ev(101, 15, user = 1),  // within 10 min of click 1 -> match
        ev(102, 25, user = 1),  // 15 min after click 1 -> no match
        ev(103, 29, user = 2))) // BEFORE click 2 -> no match
      q.processAllAvailable()
      clicks.addData(Seq(ev(3, 100, user = 9))) // advance watermark, flush state
      buys.addData(Seq(ev(104, 100, user = 9)))
      q.processAllAvailable()
      val got = spark.table("t_ssjoin")
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 101L), (3L, 104L)))
    } finally q.stop()
  }

  test("left-outer time-bound join emits unmatched left rows at watermark eviction") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val q = StreamingOps.leftOuterTimeBoundJoin(views.toDF(), clicks.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("t_ssouter").outputMode(OutputMode.Append()).start()
    try {
      views.addData(Seq(ev(1, 10, user = 1), ev(2, 10, user = 2)))
      clicks.addData(Seq(ev(101, 15, user = 1))) // match for view 1; view 2 never matches
      q.processAllAvailable()
      // The inner pair is emitted on arrival; view 2's outer row must NOT
      // exist yet — no-match is only provable once the watermark passes
      // its join horizon (l_ts + gap).
      val early = spark.table("t_ssouter")
        .select("l_id").collect().map(_.getLong(0)).toSet
      assert(!early.contains(2L), s"outer row emitted before eviction: $early")
      views.addData(Seq(ev(3, 100, user = 9)))   // advance both watermarks
      clicks.addData(Seq(ev(104, 100, user = 9)))
      q.processAllAvailable()
      views.addData(Seq(ev(4, 200, user = 9)))   // one more trigger to flush evictions
      clicks.addData(Seq(ev(105, 200, user = 9)))
      q.processAllAvailable()
      val got = spark.table("t_ssouter")
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got.contains((1L, 101L)), s"inner pair missing: $got")
      assert(got.contains((2L, -1L)), s"evicted outer row missing: $got")
    } finally q.stop()
  }

  test("stream-static enrichment joins dim attributes onto each micro-batch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamingOps.enrich(in.toDF(), dim)
      .writeStream.format("memory").queryName("t_enrich").outputMode(OutputMode.Append()).start()
    try {
      in.addData(Seq(ev(1, 1, user = 1), ev(2, 2, user = 2), ev(3, 3, user = 7)))
      q.processAllAvailable()
      val got = spark.table("t_enrich")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-"))).toSet
      // left join: unknown user 7 survives with no tier (stream rows are
      // never dropped by a dim miss)
      assert(got == Set((1L, "gold"), (2L, "basic"), (3L, "-")))
    } finally q.stop()
  }

  test("streaming tumbling == batch tumbling on the same data (mode parity)") {
    val spark2 = spark
    import spark2.implicits._
    val events = (0 until 200).map(i => ev(i.toLong, (i % 37).toLong, typ = if (i % 2 == 0) "a" else "b"))
    val stream = runBatches(OutputMode.Append(),
      df => StreamingOps.tumblingCounts(df, "10 minutes", "0 minutes"),
      Seq(events, Seq(ev(999, 500))), "t_parity") // sentinel advances watermark past all
    val streamRows = stream.map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
      .filter(_._1 < 500).sortBy(r => (r._1, r._2))
    val batchRows = StreamingOps.tumblingCounts(events.toDF(), "10 minutes", "0 minutes")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    assert(streamRows.toSeq == batchRows.toSeq)
  }

  test("transformWithState running totals persist typed state across micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDbProvider(spark) {
      val in = MemoryStream[Event]
      val q = StreamingOps.runningTotals(in.toDS())
        .writeStream.format("memory").queryName("t_tws").outputMode(OutputMode.Update()).start()
      try {
        in.addData(Seq(ev(1, 1, user = 7, v = 1.5), ev(2, 2, user = 7, v = 2.25), ev(3, 3, user = 8, v = 10.0)))
        q.processAllAvailable()
        in.addData(Seq(ev(4, 4, user = 7, v = 0.25), ev(5, 5, user = 9, v = 3.0)))
        q.processAllAvailable()
        val rows = spark.table("t_tws").as[UserTotal].collect()
        // batch 1 emissions
        assert(rows.contains(UserTotal(7L, 2L, 3750000L)), s"batch-1 user 7 missing in ${rows.toSeq}")
        assert(rows.contains(UserTotal(8L, 1L, 10000000L)))
        // batch 2: user 7's state carried over (2+1 events, 3.75+0.25 total)
        assert(rows.contains(UserTotal(7L, 3L, 4000000L)), s"state not carried across batches: ${rows.toSeq}")
        assert(rows.contains(UserTotal(9L, 1L, 3000000L)))
      } finally q.stop()
    }
  }
}
