package graft.queries

import graft._
import graft.ops._
import org.apache.spark.sql.functions._

/** Reference-core semantics (SURVEY.md §2.1 R7/R8/R9) exercised on the
  * driver's `events` table: src id = user_id, dst id = event_id % 15
  * (a deterministic synthetic "peer"), timestamp = ts.
  * The same operators drive the pcap pipeline on real IPs (graft.pipeline).
  */
object RefCoreQ {

  // Rule set: note rule overlap in Jan-12..14 where the later 'exfil'
  // rule must win over 'scan'/'flood' (last-match-wins, BytesProcessor.py:326-327).
  val rules: Seq[LabelRule] = Seq(
    LabelRule("2024-01-05 00:00:00", "2024-01-15 00:00:00", Seq(1L, 2L, 3L), Nil, "scan"),
    LabelRule("2024-01-10 00:00:00", "2024-01-20 00:00:00", Nil, Seq(4L, 5L), "flood"),
    LabelRule("2024-01-12 00:00:00", "2024-01-14 00:00:00", Seq(2L, 4L), Seq(7L, 8L, 9L), "exfil"))

  val ranges: Seq[(String, String)] = Seq(
    ("2024-01-02 00:00:00", "2024-01-05 00:00:00"),
    ("2024-01-10 00:00:00", "2024-01-12 00:00:00"),
    ("2024-01-20 06:00:00", "2024-01-21 18:00:00"))

  private val rangeSql = ranges
    .map { case (lo, hi) => s"ts BETWEEN TIMESTAMP '$lo' AND TIMESTAMP '$hi'" }
    .mkString("(", " OR ", ")")

  val r7RangeFilter: Q = Q(
    "r7_range_filter",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      e.filter(RangeFilter.inTsRanges(col("ts").cast("timestamp"), ranges))
        .select(
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    },
    Some(s"""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
            |       user_id, event_type, value
            |FROM events WHERE $rangeSql ORDER BY event_id""".stripMargin))

  val r8RuleLabel: Q = Q(
    "r8_rule_label",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      val ts = col("ts").cast("timestamp")
      val src = col("user_id")
      val dst = col("event_id") % 15
      e.select(
        col("event_id"), col("user_id"), dst.as("peer_id"),
        RuleLabeler.labelCol(ts, src, dst, rules).as("label"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_id % 15 AS peer_id,
           | CASE
           |  WHEN ts BETWEEN TIMESTAMP '2024-01-12 00:00:00' AND TIMESTAMP '2024-01-14 00:00:00'
           |   AND ((user_id IN (2,4) AND (event_id % 15) IN (7,8,9))
           |     OR ((event_id % 15) IN (2,4) AND user_id IN (7,8,9))) THEN 'exfil'
           |  WHEN ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
           |   AND (event_id % 15) IN (4,5) THEN 'flood'
           |  WHEN ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00'
           |   AND user_id IN (1,2,3) THEN 'scan'
           |  ELSE 'benign' END AS label
           |FROM events ORDER BY event_id""".stripMargin))

  val r9ForwardMask: Q = Q(
    "r9_forward_mask",
    (spark, dir) => {
      val e = Tables(spark, dir, "events")
      e.filter(RuleLabeler.forwardMask(col("ts").cast("timestamp"), col("user_id"), rules))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type FROM events
           |WHERE (ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-15 00:00:00' AND user_id IN (1,2,3))
           |   OR (ts BETWEEN TIMESTAMP '2024-01-12 00:00:00' AND TIMESTAMP '2024-01-14 00:00:00' AND user_id IN (2,4))
           |ORDER BY event_id""".stripMargin))

  val all: Seq[Q] = Seq(r7RangeFilter, r8RuleLabel, r9ForwardMask)
}
