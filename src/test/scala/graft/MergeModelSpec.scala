package graft

import java.sql.Timestamp

/** Reference-model check for x_merge_apply: a plain-Scala sequential CDC
  * fold over the collected sf0.001 event log (group per user, order by
  * (ts, event_id), last writer wins per half, 'error' change deletes)
  * must reproduce the distributed merge row-for-row. Pins the
  * upsert/delete/carry semantics against an implementation with no SQL
  * engine in it — the same role [[BpeModelSpec]] plays for the
  * tokenizer.
  */
class MergeModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("x_merge_apply matches a sequential last-writer-wins CDC fold") {
    // Build the split as an instant: Timestamp.valueOf parses in the JVM
    // default zone, but the query's lit('2024-01-16').cast('timestamp')
    // resolves in the session zone (UTC) — on a non-UTC host the two
    // would disagree and misclassify boundary events.
    val split = Timestamp.from(java.time.Instant.parse("2024-01-16T00:00:00Z"))
    val events = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))

    // microsecond-exact ordering key: getTime is millis-truncated, and the
    // engine tie-breaks on the FULL micro timestamp before event_id
    def micros(ts: Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    def latest(half: Seq[(Long, Timestamp, Long, String, Double)]) =
      half.maxBy { case (_, ts, eid, _, _) => (micros(ts), eid) }

    val expected = events.groupBy(_._1).toSeq.flatMap { case (user, evs) =>
      val (base, delta) = evs.toSeq.partition(_._2.before(split))
      val b = if (base.nonEmpty) Some(latest(base)) else None
      val d = if (delta.nonEmpty) Some(latest(delta)) else None
      (b, d) match {
        case (_, Some(del)) if del._4 == "error" => None // CDC delete
        case (None, Some(ins)) =>
          Some((user, ins._4, math.round(ins._5 * 100), ins._3, "insert"))
        case (Some(up0), Some(up)) =>
          val _ = up0
          Some((user, up._4, math.round(up._5 * 100), up._3, "update"))
        case (Some(c), None) =>
          Some((user, c._4, math.round(c._5 * 100), c._3, "carry"))
        case (None, None) => None
      }
    }.sortBy(_._1)

    val got = SparkEntry.queries("x_merge_apply")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSeq

    assert(got == expected,
      s"distributed CDC merge diverged from the sequential fold:\n" +
        s"  got      ${got.take(5)}\n  expected ${expected.take(5)}")
    assert(expected.nonEmpty, "fixture produced an empty merge — test is vacuous")
  }
}
