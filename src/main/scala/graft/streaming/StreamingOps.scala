package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, TimeMode}

/** Typed view of the events table for streaming paths. */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** One closed per-user session (flatMapGroupsWithState output). */
final case class UserSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

private final case class SessionState(startMs: Long, lastMs: Long, n: Long)

/** Structured Streaming operators over the events stream (SURVEY.md §2.2
  * streaming rows). Batch-mode twins with DuckDB oracles live in
  * graft.queries.StreamingBatchQ — Spark defines window()/session_window()
  * identically in both modes, so these functions are intentionally just
  * the watermarked composition, shared by both tests and production.
  *
  * 100 TB rules (SURVEY.md §7.5): every stateful op is watermark-bounded,
  * so state store size is O(active windows/sessions), not O(stream
  * history); processing is keyed (hash-partitioned by group) and scales
  * with executors; no driver-side state.
  */
object StreamingOps {

  /** Tumbling-window counts+sums per event_type, late data dropped by
    * watermark. Append mode emits only finalized windows. */
  def tumblingCounts(events: DataFrame, window_ : String = "10 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** CHAINED stateful pipeline: watermarked tumbling-window aggregation
    * feeding a transformWithState rollup in the SAME query — the
    * "aggregate of finalized aggregates" shape (Spark 4.x multi-stateful
    * support with TWS downstream). The window operator emits a
    * (window, event_type) row exactly once when the watermark proves the
    * window closed; the TWS stage then folds those CLOSED windows into a
    * per-type running rollup in ValueState, emitting the running totals
    * each batch it receives windows. Callers pre-scale `value` to integer
    * cents so every accumulation is addition-order-exact. At 100 TB the
    * first stage's state is O(open windows) and the second's O(distinct
    * types) — both watermark/cardinality-bounded, sharded across
    * executors' RocksDB stores (TWS requires the RocksDB provider). */
  def windowRollup(events: DataFrame, window_ : String = "10 minutes",
                   watermark: String = "30 minutes"): Dataset[WindowRollup] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("cents_sum"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("cents_sum"))
      .as[WinRow]
      .groupByKey(_.event_type)
      .transformWithState(new WindowRollupProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Sliding-window counts (overlapping windows). */
  def slidingCounts(events: DataFrame, window_ : String = "10 minutes",
                    slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("n_events"))

  /** Session windows per user (gap-based), watermark-bounded state. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("w_start"), col("user_id"), col("n_events"))

  /** Stateful exact dedup on event_id with bounded state — the streaming
    * face of the dedup north star. */
  def dedupEvents(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: attach dimension attributes to each
    * streaming event. The static side needs no watermark (it is re-read
    * per micro-batch, so a dim refresh is picked up automatically). No
    * broadcast hint: the dim's size is the caller's, so the per-batch
    * planner decides — small reference data broadcasts on its own, and a
    * dim too large to broadcast degrades to a shuffle join instead of
    * forcing an OOM build. Zero streaming state either way. The standard
    * "enrich the firehose with reference data" shape at any scale.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Watermarked stream-stream inner join: pairs each left event with
    * right events of the same user within `maxGap` AFTER it. Both sides
    * watermarked so the join state is evictable — without the time bound
    * and watermarks a stream-stream join buffers forever (the 100 TB
    * non-negotiable).
    */
  def timeBoundJoin(left: DataFrame, right: DataFrame, maxGap: String = "30 minutes",
                    watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("l_user").as("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** LEFT OUTER watermarked stream-stream join: like [[timeBoundJoin]],
    * but a left event with NO matching right event within `maxGap` is
    * still emitted (null right columns) — once the watermark passes its
    * join horizon and the runtime can PROVE no match can arrive. That
    * proof-then-emit is the semantics under test: outer results are
    * late by construction (eviction-time, not arrival-time), which is
    * the documented cost of outer stream joins at any scale. State
    * stays evictable exactly as in the inner variant — the time bound
    * plus both-side watermarks are what make the buffer finite. */
  def leftOuterTimeBoundJoin(left: DataFrame, right: DataFrame,
                             maxGap: String = "30 minutes",
                             watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"),
      "left_outer")
      .select(col("l_user").as("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** RIGHT OUTER watermarked stream-stream join — [[leftOuterTimeBoundJoin]]
    * mirrored: a right event with no left event whose forward window
    * covers it is emitted (null left columns) once the LEFT watermark
    * proves no l_ts in [r_ts-maxGap, r_ts] can arrive. Kept as its own
    * mode rather than "swap the inputs and use left outer" because the
    * time condition is asymmetric (right events trail left events), so
    * the swap would also have to invert the interval — error-prone at a
    * call site; here the planner does it. */
  def rightOuterTimeBoundJoin(left: DataFrame, right: DataFrame,
                              maxGap: String = "30 minutes",
                              watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"),
      "right_outer")
      .select(col("r_user").as("user_id"),
        col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** FULL OUTER watermarked stream-stream join — the last mode of the
    * streaming join matrix (CDC reconciliation's shape: rows present on
    * either side but not both must surface exactly once). Semantics are
    * the union of both one-sided outer proofs: a matched pair emits on
    * arrival of the second side; an unmatched LEFT row emits (null right)
    * once the right watermark proves no r_ts in [l_ts, l_ts+maxGap] can
    * arrive; an unmatched RIGHT row emits (null left) once the left
    * watermark proves no l_ts in [r_ts-maxGap, r_ts] can arrive. Output
    * `user_id` is coalesced across sides so right-only rows keep their
    * key. State stays evictable exactly as in the inner variant — the
    * time bound plus both-side watermarks bound BOTH buffers, which is
    * what makes a 100 TB/day reconciliation stream runnable at all. */
  def fullOuterTimeBoundJoin(left: DataFrame, right: DataFrame,
                             maxGap: String = "30 minutes",
                             watermark: String = "30 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id").as("l_user"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"),
      "full_outer")
      .select(coalesce(col("l_user"), col("r_user")).as("user_id"),
        col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** Exactly-once keyed-upsert snapshot sink (CDC-apply): maintain a
    * "latest state per user" parquet snapshot from the event stream via
    * foreachBatch. Without a transactional table format, exactly-once
    * comes from VERSIONED snapshots: batch N deterministically rewrites
    * `v=N` from (`v=N-1`, batch N), so a replayed micro-batch (crash
    * after write, before checkpoint commit) overwrites its own version
    * with identical bytes instead of double-applying. One prior version
    * is retained for replay; older ones are pruned. Latest-wins is the
    * total order (ts, event_id) — unique, so the merge is deterministic
    * and idempotent. At scale the snapshot rewrite is the no-ACID-format
    * cost; the shape ports to MERGE INTO unchanged on Delta/Iceberg.
    *
    * `onBatchApplied` fires after [[applyUpsert]] writes a version but
    * BEFORE the micro-batch's epoch commits — the exactly-once crash
    * window. The replay gate (st_upsert_crash) throws from it to kill the
    * query mid-protocol and prove a restart replays the batch onto its
    * own version instead of double-applying. Production callers leave the
    * default no-op. */
  def upsertLatestSink(events: DataFrame, snapshotDir: String, checkpoint: String,
                       trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                       onBatchApplied: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyUpsert(batch, snapshotDir, batchId)
        onBatchApplied(batchId)
      }
    trigger.fold(w)(w.trigger).start()
  }

  /** Newest COMMITTED snapshot version under [[upsertLatestSink]]'s dir —
    * the read path a downstream consumer uses. A `v=N` dir without
    * `_SUCCESS` is a torn rewrite from a crashed attempt (the writer
    * creates the dir at job start and commits the marker last), so it is
    * skipped — replay will rewrite it deterministically; serving it
    * would expose a half-written snapshot. */
  def latestSnapshot(dir: String): Option[String] =
    listVersions(dir).sorted.reverseIterator
      .find(v => new java.io.File(s"$dir/v=$v/_SUCCESS").exists())
      .map(v => s"$dir/v=$v")

  /** One CDC-apply step — exposed so the replay spec can re-run a batch
    * and prove the rewrite is byte-stable. */
  private[graft] def applyUpsert(batch: DataFrame, dir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    def latestPerKey(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("s"))
        .select(col("user_id"), col("s.ts").as("ts"),
          col("s.event_id").as("event_id"), col("s.value").as("value"))
    val versions = listVersions(dir)
    // Replay safety: the previous version is the newest one STRICTLY
    // below this batch id — a half-written v=batchId from a crashed
    // attempt is never read as input to its own rewrite.
    val prev = versions.filter(_ < batchId).sorted.lastOption
    val merged = prev match {
      case Some(v) =>
        latestPerKey(spark.read.parquet(s"$dir/v=$v").unionByName(
          latestPerKey(batch)))
      case None => latestPerKey(batch)
    }
    merged.coalesce(1).write.mode("overwrite").parquet(s"$dir/v=$batchId")
    // Keep exactly one prior version (replay input); prune the rest.
    versions.filter(v => prev.exists(v < _)).foreach { v =>
      deleteRecursively(new java.io.File(s"$dir/v=$v"))
    }
  }

  private def listVersions(dir: String): Seq[Long] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Custom state machine via flatMapGroupsWithState: per-user session
    * reassembly with an event-time timeout — the streaming analogue of the
    * reference's per-flow packet view. Emits a UserSession when the gap
    * elapses (timeout fires past the watermark). State per key is O(1).
    */
  def userSessions(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
                   watermark: String = "30 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, s.startMs, s.lastMs, s.n))
          } else {
            val (closed, cur) =
              foldSessions(userId, rows.toSeq.sortBy(_.ts.getTime), state.getOption, gapMs)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Interval-correct session fold shared by the v1 (timeout) and v2
    * (timer) sessionizers, so the twins can never drift. In-batch rows
    * arrive time-sorted; a cross-batch LATE row (event time at or before
    * the open session's span) is placed by interval proximity:
    *  - within `gap` of the span → merges, extending the span DOWNWARD
    *    too (startMs = min) — late rows must not inflate the recorded
    *    start;
    *  - older than startMs − gap → it belongs to a gap-separated EARLIER
    *    session, which closes immediately as its own single-row session
    *    (best effort — an even-later arrival can no longer extend it)
    *    instead of corrupting the open session's span or count.
    * For per-key time-ordered arrival the fold is exactly batch gap
    * sessionization (the replay spec pins this). */
  private[streaming] def foldSessions(
      userId: Long, sorted: Seq[Event], init: Option[SessionState],
      gapMs: Long): (List[UserSession], Option[SessionState]) = {
    var closed = List.empty[UserSession]
    var cur = init
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t < s.startMs - gapMs =>
          closed ::= UserSession(userId, t, t, 1)
        case Some(s) if t - s.lastMs < gapMs =>
          cur = Some(SessionState(math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
        case Some(s) =>
          closed ::= UserSession(userId, s.startMs, s.lastMs, s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    (closed.reverse, cur)
  }

  /** Timer-driven per-user sessionization via transformWithState +
    * EVENT-TIME TIMERS — the v2-API twin of [[userSessions]]'s
    * flatMapGroupsWithState timeout: each batch folds its rows into the
    * per-user open session, re-registers one timer at lastMs + gap, and
    * the session closes from `handleExpiredTimer` when the watermark
    * passes the gap. Explicit timers over the v1 timeout buy multiple
    * independent timers per key, deletion, and composability with other
    * TWS state on the same key. State per user is O(1) (one session +
    * one timer in RocksDB, sharded by key across executors); a stale
    * timer that raced a session extension is ignored by the expiry
    * guard, so verdicts never depend on timer-delivery timing. Late
    * rows inside the watermark are placed by interval proximity via the
    * shared [[foldSessions]] (identical in [[userSessions]], so the
    * twins cannot drift). Emits only CLOSED sessions (append mode).
    * Callers must run with the RocksDB state store provider.
    */
  def timerSessions(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
                    watermark: String = "30 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-user running totals via transformWithState (the arbitrary-state
    * v2 API, Spark 4.x): typed ValueState survives across micro-batches
    * in the RocksDB state store, one updated row per key per batch
    * (Update mode). v2 over flatMapGroupsWithState buys composable state
    * types (value/list/map per key), state TTL, and RocksDB changelog
    * checkpointing — at 100 TB of keys the state store is per-partition
    * RocksDB, so state size scales with executors, never the driver.
    * Values are accumulated as exact micro-units (round(value·1e6)) —
    * same integer-determinism discipline as the batch queries. Callers
    * must run with the RocksDB state store provider (TWS requires it).
    */
  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Warm-start running totals: [[runningTotals]] seeded from a BATCH
    * aggregate via transformWithState's INITIAL-STATE arm — the
    * backfill-then-stream migration every production pipeline performs
    * (bootstrap state from the historical table, stream the live tail).
    * `handleInitialState` runs once per seeded key at query start,
    * before any input batch; keys absent from the seed start cold. At
    * 100 TB the seed is itself a distributed Dataset co-partitioned
    * with the state shards — no driver materialization. */
  def seededRunningTotals(events: Dataset[Event],
                          seed: Dataset[UserTotal]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    val init = seed.groupByKey(_.user_id)
      .mapValues(s => TotalState(s.n_events, s.value_micro_total))
    events.groupByKey(_.user_id)
      .transformWithState(new SeededTotalProcessor, TimeMode.None(),
        OutputMode.Update(), init)
  }

  /** Schema-evolution pair for the checkpoint-compat gate: the SAME
    * value state ("evo"), two schema generations. A deployment runs
    * [[evoTotalsV1]] (state = event count only), is stopped mid-stream,
    * and resumes from the SAME checkpoint with [[evoTotalsV2]] (state +=
    * a nullable micro-cents accumulator) — the state store must rehydrate
    * v1 rows under the v2 schema with the added field null. Requires the
    * Avro state encoding (`spark.sql.streaming.stateStore.encodingFormat
    * = avro`) — UnsafeRow state is bit-positional and cannot evolve. */
  def evoTotalsV1(events: Dataset[Event]): Dataset[EvoOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EvoV1Processor, TimeMode.None(), OutputMode.Update())
  }

  /** The evolved twin of [[evoTotalsV1]] — see there. */
  def evoTotalsV2(events: Dataset[Event]): Dataset[EvoOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new EvoV2Processor, TimeMode.None(), OutputMode.Update())
  }

  /** Incremental span-level dedup via transformWithState — the streaming
    * twin of the batch `d_span_dedup` query: documents arrive as a
    * stream, each is cut into the SAME 8-token spans with the SAME md5
    * digests, and a span is a duplicate iff its digest was already
    * claimed by an earlier span ANYWHERE in the stream's history. State
    * is keyed by digest (hash-partitioned — the corpus-wide digest table
    * shards across executors' RocksDB stores, exactly how the batch
    * query's digest-grain shuffle scales), one packed first-owner long
    * per digest. Within a batch, ties resolve by the packed
    * (doc_id, span_idx) key — so replaying a corpus in doc_id order
    * yields bit-identical verdicts to the batch query's min-key
    * attribution no matter where the micro-batch boundaries fall
    * (StreamingSpanDedupSpec pins this equivalence). Per-span verdicts
    * are emitted append-mode; per-doc rollups are a stateless downstream
    * aggregation.
    */
  def spanVerdicts(docs: Dataset[DocIn]): Dataset[SpanVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap { d =>
        val toks = d.text.split(" ").filter(_.nonEmpty)
        toks.grouped(8).zipWithIndex.map { case (g, i) =>
          SpanIn(d.doc_id, i.toLong, org.apache.commons.codec.digest.DigestUtils.md5Hex(g.mkString(" ")))
        }
      }
      .groupByKey(_.dg)
      .transformWithState(new SpanDedupProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Incremental NEAR-dup detection via transformWithState — the
    * streaming twin of the batch MinHash-LSH family: documents arrive as
    * a stream, each is shingled/minhashed/banded STATELESSLY per row
    * (array_min over the shingle-hash array — no shuffle aggregation, so
    * the stage needs no watermark), and each (band, signature) is a key
    * into a corpus-wide FIRST-CLAIM registry sharded across executors'
    * RocksDB stores. A document whose band was already claimed by an
    * earlier document emits a (doc, band, owner) claim; downstream a
    * stateless rollup counts agreeing bands per (doc, owner) pair — the
    * nightly-ingest dedup flow (d_incremental) with the index maintained
    * IN STREAM instead of rebuilt per delta. Arrival in doc_id order
    * makes first-claim attribution coincide with the batch min-doc
    * owner no matter where micro-batch boundaries fall (same argument
    * as [[spanVerdicts]]). At 100 TB: state is one long per distinct
    * band signature, hash-partitioned; per-batch work is the delta's
    * banding plus point lookups. */
  def lshBandClaims(docs: Dataset[DocIn]): Dataset[BandClaim] = {
    import docs.sparkSession.implicits._
    import graft.ops.TextHash._
    val mhs = (0 until NumHashes).map(j =>
      array_min(transform(col("h0s"), x => minHashOf(x, j))).as(s"mh$j"))
    val bandSigs = (0 until Bands).map { b =>
      val cols = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(j => col(s"mh$j").cast("string"))
      struct(lit(b.toLong).as("band"), concat_ws(",", cols: _*).as("sig"))
    }
    docs.toDF()
      .withColumn("h0s", graft.functions.shingle_hashes(col("text"), ShingleLen))
      .filter(size(col("h0s")) > 0) // sub-shingle-length docs band nowhere
      .select(col("doc_id") +: mhs: _*)
      .select(col("doc_id"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .as[BandIn]
      .groupByKey(b => b.band + "|" + b.sig)
      .transformWithState(new BandFirstClaimProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Per-user typed-state composition via transformWithState LISTSTATE +
    * MAPSTATE (the v2 arms the ValueState keys don't touch): MapState
    * keyed by event_type holds the per-type running counts (the keyed
    * sub-aggregate pattern — one RocksDB entry per (user, type), updated
    * in place, never rewritten wholesale like a map packed into a
    * ValueState would be), and ListState appends one per-batch row count
    * (bounded by the batch count, the per-key activity log pattern).
    * Emits one summary row per (user, batch-with-events) in Update mode;
    * n_events is the sum over the list, so LOST list entries under-count
    * and a broken map entry corrupts the sorted type signature. At 100 TB
    * both states shard by key across executors' stores; map entries are
    * point-updated so a hot user with a wide type vocabulary costs
    * O(types touched per batch), not O(vocabulary). */
  def userTypeSummaries(events: Dataset[Event]): Dataset[UserTypeSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeMapProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming heavy hitters — [[graft.ops.MisraGries]] summaries as
    * transformWithState state, keyed by a fingerprint hash bucket (the
    * trending-tokens pattern): every bucket holds ONE constant-size 2k-long
    * summary in RocksDB no matter how much stream has passed, and all
    * copies of a token land in one bucket, so a token with global
    * frequency > n/(k+1) exceeds its OWN bucket's n_b/(k+1) threshold
    * (n_b ≤ n) — the per-bucket superset guarantee is strictly sharper
    * than the global one (StreamingHeavyHittersSpec pins this on replay).
    * Each batch emits the bucket's current candidates plus a monotone
    * seen-count, so the freshest summary per bucket is selectable
    * downstream without ordering assumptions; an exact count over just
    * the union of candidates (a_heavy_hitters' pass 2) turns the union
    * into the exact answer at any point in the stream. */
  def bucketHeavyHitters(toks: Dataset[TokIn], k: Int = 16, buckets: Int = 32): Dataset[BucketHitters] = {
    import toks.sparkSession.implicits._
    toks
      .select(xxhash64(col("tok")).as("fp")).as[Long]
      .groupByKey(fp => ((fp % buckets) + buckets) % buckets)
      .transformWithState(new BucketMgProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}

/** Streaming heavy-hitter input token. */
final case class TokIn(tok: String)

/** One bucket's current Misra–Gries candidate fingerprints; `seen` is
  * the bucket's total item count so far (monotone — max(seen) selects
  * the freshest summary per bucket without ordering assumptions). */
final case class BucketHitters(bucket: Long, seen: Long, fps: Array[Long])

private final class BucketMgProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Long, BucketHitters] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  private val agg = new graft.ops.MisraGries(k)
  @transient private var summary: ValueState[(Array[Long], Array[Long])] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    summary = getHandle.getValueState[(Array[Long], Array[Long])](
      "mg", agg.bufferEncoder, TTLConfig.NONE)
    seen = getHandle.getValueState[Long](
      "seen", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(bucket: Long, rows: Iterator[Long],
                               timerValues: TimerValues): Iterator[BucketHitters] = {
    var buf = if (summary.exists()) summary.get() else agg.zero
    var n = if (seen.exists()) seen.get() else 0L
    rows.foreach { fp => buf = agg.reduce(buf, fp); n += 1 }
    summary.update(buf)
    seen.update(n)
    Iterator.single(BucketHitters(bucket, n, agg.finish(buf)))
  }
}

/** Streaming span-dedup input document. */
final case class DocIn(doc_id: Long, text: String)

/** One span of a streamed document (8 whitespace tokens, md5 digest). */
final case class SpanIn(doc_id: Long, span_idx: Long, dg: String)

/** Verdict for one span: dup=false iff this span is the digest's first
  * occurrence in stream history (batch-tie broken by packed key). */
final case class SpanVerdict(doc_id: Long, span_idx: Long, dup: Boolean)

private final class SpanDedupProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, SpanIn, SpanVerdict] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  // Packed first-owner key (doc_id * 2^32 + span_idx) — same packing and
  // same 2^32 span bound as the batch query's min-key attribution.
  @transient private var owner: ValueState[Long] = _

  // The packing is only injective for doc_id < 2^31 and span_idx < 2^32;
  // beyond that it would silently overflow/collide and corrupt first-owner
  // attribution, so the bound fails loudly instead.
  private def pack(s: SpanIn): Long = {
    require(s.doc_id >= 0 && s.doc_id < (1L << 31),
      s"doc_id ${s.doc_id} outside packed-key bound [0, 2^31)")
    require(s.span_idx >= 0 && s.span_idx < (1L << 32),
      s"span_idx ${s.span_idx} outside packed-key bound [0, 2^32)")
    s.doc_id * 4294967296L + s.span_idx
  }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long](
      "firstOwner", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(dg: String, rows: Iterator[SpanIn],
                               timerValues: TimerValues): Iterator[SpanVerdict] = {
    val sorted = rows.toArray.sortBy(pack)
    val claimed = owner.exists()
    if (!claimed && sorted.nonEmpty) owner.update(pack(sorted.head))
    sorted.iterator.zipWithIndex.map { case (s, i) =>
      SpanVerdict(s.doc_id, s.span_idx, dup = claimed || i > 0)
    }
  }
}

/** Session state machine for [[StreamingOps.timerSessions]]: one open
  * session per user, one event-time timer at lastMs + gap. In-batch gap
  * splits close sessions inline (same fold as the v1 userSessions);
  * cross-batch closes come from the timer once the watermark passes. */
private final class TimerSessionProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserSession] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var sess: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessionState](
      "session", org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[UserSession] = {
    val prev = if (sess.exists()) Some(sess.get()) else None
    // The previous batch's timer is superseded by whatever we register
    // below; delete it so expired-timer work stays one-per-key. (A racing
    // stale timer is harmless either way — the expiry guard drops it.)
    prev.foreach(s => getHandle.deleteTimer(s.lastMs + gapMs))
    val (closed, cur) =
      StreamingOps.foldSessions(userId, rows.toArray.sortBy(_.ts.getTime).toSeq, prev, gapMs)
    cur.foreach { s =>
      sess.update(s)
      getHandle.registerTimer(s.lastMs + gapMs)
    }
    closed.iterator
  }

  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[UserSession] = {
    if (!sess.exists()) Iterator.empty
    else {
      val s = sess.get()
      // Stale-timer guard: only a timer at (or past) the CURRENT
      // session's gap boundary may close it — an expiry registered
      // before a same-batch extension refers to a session that no
      // longer ends there.
      if (expiredTimerInfo.getExpiryTimeInMs >= s.lastMs + gapMs) {
        sess.clear()
        Iterator.single(UserSession(userId, s.startMs, s.lastMs, s.n))
      } else Iterator.empty
    }
  }
}

/** Per-user summary emitted by [[StreamingOps.userTypeSummaries]]:
  * `n_batches` = ListState length (batches in which the user appeared),
  * `n_events` = sum over the list, `types_str` = MapState entries as a
  * key-sorted "type=count" signature (total order — gate-hashable). */
final case class UserTypeSummary(user_id: Long, n_batches: Long,
                                 n_events: Long, types_str: String)

private final class TypeMapProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTypeSummary] {
  import org.apache.spark.sql.streaming.{ListState, MapState, TimeMode, TimerValues, TTLConfig}
  import org.apache.spark.sql.Encoders

  @transient private var batchCounts: ListState[Long] = _
  @transient private var typeCounts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    batchCounts = getHandle.getListState[Long](
      "batchCounts", Encoders.scalaLong, TTLConfig.NONE)
    typeCounts = getHandle.getMapState[String, Long](
      "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[UserTypeSummary] = {
    var inBatch = 0L
    rows.foreach { e =>
      inBatch += 1
      // A null type would collide with a real "∅" token only if the data
      // used that glyph; the oracle coalesces identically.
      val k = if (e.event_type == null) "∅" else e.event_type
      val prev = if (typeCounts.containsKey(k)) typeCounts.getValue(k) else 0L
      typeCounts.updateValue(k, prev + 1)
    }
    batchCounts.appendValue(inBatch)
    val perBatch = batchCounts.get().toArray
    val sig = typeCounts.iterator().toArray.sortBy(_._1)
      .map { case (t, c) => s"$t=$c" }.mkString(",")
    Iterator.single(UserTypeSummary(userId, perBatch.length.toLong, perBatch.sum, sig))
  }
}

/** Output row shared by both schema generations of the evolution pair:
  * `late_micro` is null for rows emitted by the v1 processor (the field
  * its state schema lacks) and the post-upgrade micro-cents accumulation
  * for v2 rows. */
final case class EvoOut(user_id: Long, n_events: Long, late_micro: Option[Long])

private final case class EvoStateV1(n: Long)
private final case class EvoStateV2(n: Long, lateMicro: Option[Long])

private final class EvoV1Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, EvoOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[EvoStateV1] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EvoStateV1](
      "evo", org.apache.spark.sql.Encoders.product[EvoStateV1], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[EvoOut] = {
    var n = if (state.exists()) state.get().n else 0L
    rows.foreach(_ => n += 1)
    state.update(EvoStateV1(n))
    Iterator.single(EvoOut(userId, n, None))
  }
}

private final class EvoV2Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, EvoOut] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[EvoStateV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[EvoStateV2](
      "evo", org.apache.spark.sql.Encoders.product[EvoStateV2], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[EvoOut] = {
    val prev = if (state.exists()) Some(state.get()) else None
    var n = prev.map(_.n).getOrElse(0L)
    // A v1-written row rehydrates with lateMicro null — the accumulator
    // starts at upgrade time, which is the semantics under test.
    var micro = prev.flatMap(_.lateMicro).getOrElse(0L)
    rows.foreach { e => n += 1; micro += math.round(e.value * 1e6) }
    state.update(EvoStateV2(n, Some(micro)))
    Iterator.single(EvoOut(userId, n, Some(micro)))
  }
}

/** One (doc, LSH band, signature) row entering the first-claim registry
  * ([[StreamingOps.lshBandClaims]]). */
final case class BandIn(doc_id: Long, band: Long, sig: String)

/** A band claim: owner_doc is the FIRST document to have claimed this
  * (band, signature); rows with owner_doc == doc_id are first claims,
  * rows with owner_doc < doc_id are near-dup evidence. */
final case class BandClaim(doc_id: Long, band: Long, owner_doc: Long)

/** First-claim registry keyed by band|signature: ValueState holds the
  * minimum doc_id seen for the key; within a batch ties resolve by
  * doc_id, so doc-ordered replay matches batch min-doc attribution
  * exactly (the [[SpanDedupProcessor]] argument at band granularity). */
private final class BandFirstClaimProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, BandIn, BandClaim] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var owner: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[Long](
      "bandOwner", org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandIn],
                               timerValues: TimerValues): Iterator[BandClaim] = {
    val sorted = rows.toArray.sortBy(_.doc_id)
    val first =
      if (owner.exists()) math.min(owner.get(), sorted.head.doc_id)
      else sorted.head.doc_id
    owner.update(first)
    sorted.iterator.map(b => BandClaim(b.doc_id, b.band, first))
  }
}

/** One CLOSED tumbling window entering [[StreamingOps.windowRollup]]'s
  * downstream stage (cents_sum pre-scaled to integer cents). */
final case class WinRow(w_start: java.sql.Timestamp, event_type: String,
                        n_events: Long, cents_sum: Long)

/** Running per-type rollup of closed windows ([[StreamingOps.windowRollup]]). */
final case class WindowRollup(event_type: String, n_windows: Long,
                              ev_total: Long, cents_total: Long)

private final case class RollState(nw: Long, ev: Long, cents: Long)

/** Folds closed-window rows into a per-type running rollup. Every
  * emission strictly grows n_windows (a key is handed rows only in
  * batches where at least one of its windows closed), so downstream
  * consumers can select the final row by monotone max. */
private final class WindowRollupProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[String, WinRow, WindowRollup] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[RollState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[RollState](
      "rollup", org.apache.spark.sql.Encoders.product[RollState], TTLConfig.NONE)

  override def handleInputRows(eventType: String, rows: Iterator[WinRow],
                               timerValues: TimerValues): Iterator[WindowRollup] = {
    val prev = Option(state.get()).getOrElse(RollState(0L, 0L, 0L))
    var nw = prev.nw
    var ev = prev.ev
    var cents = prev.cents
    rows.foreach { w => nw += 1; ev += w.n_events; cents += w.cents_sum }
    state.update(RollState(nw, ev, cents))
    Iterator.single(WindowRollup(eventType, nw, ev, cents))
  }
}

/** Running per-user aggregate emitted by [[StreamingOps.runningTotals]]. */
final case class UserTotal(user_id: Long, n_events: Long, value_micro_total: Long)

private final case class TotalState(n: Long, totalMicro: Long)

/** [[RunningTotalProcessor]] with the initial-state arm: the seed value
  * lands in the SAME ValueState the input path accumulates into, so a
  * lost or ignored seed under-counts exactly the backfilled half. */
private final class SeededTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
      Long, Event, UserTotal, TotalState] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[TotalState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TotalState](
      "totals", org.apache.spark.sql.Encoders.product[TotalState], TTLConfig.NONE)

  override def handleInitialState(userId: Long, initial: TotalState,
                                  timerValues: TimerValues): Unit =
    state.update(initial)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[UserTotal] = {
    val prev = Option(state.get()).getOrElse(TotalState(0L, 0L))
    var n = prev.n
    var total = prev.totalMicro
    rows.foreach { e => n += 1; total += math.round(e.value * 1e6) }
    state.update(TotalState(n, total))
    Iterator.single(UserTotal(userId, n, total))
  }
}

private final class RunningTotalProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotal] {
  import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var state: ValueState[TotalState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TotalState](
      "totals", org.apache.spark.sql.Encoders.product[TotalState], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
                               timerValues: TimerValues): Iterator[UserTotal] = {
    val prev = Option(state.get()).getOrElse(TotalState(0L, 0L))
    var n = prev.n
    var total = prev.totalMicro
    rows.foreach { e => n += 1; total += math.round(e.value * 1e6) }
    state.update(TotalState(n, total))
    Iterator.single(UserTotal(userId, n, total))
  }
}
