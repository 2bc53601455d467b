package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the st_state_repartition migration that the
  * oracle hash can't see: the gated totals prove the VALUES survived,
  * these prove the migration actually moved state between DIFFERENT
  * shardings (not a no-op resume) and that the extracted seed was the
  * complete first-half aggregate.
  */
class StateMigrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("st_state_repartition migrates complete state across shard counts") {
    val out = graft.SparkEntry.queries("st_state_repartition")(spark, dir)
      .collect()
    assert(out.nonEmpty, "migration produced no rows")
    // the gated n_state_parts column is the TARGET sharding — must be 8
    // on every row (the in-query requires pin source=4 separately)
    assert(out.forall(_.getLong(3) == 8L), "target shard count not 8")

    // completeness: the emitted user set must equal the second-half
    // active users (a seed-only user never emits; a dropped seed would
    // still emit but the oracle catches the value; a dropped STREAM key
    // would vanish here)
    val ev = graft.Tables(spark, dir, "events")
    val Array(t0, t1) = ev.agg(min(col("ts")), max(col("ts"))).head()
      .toSeq.map(_.asInstanceOf[java.sql.Timestamp].getTime).toArray
    val mid = t0 + (t1 - t0) / 2
    val h2Users = ev.filter(unix_millis(col("ts")) >= mid)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == h2Users,
      "emitted users != second-half-active users")

    // and the totals must be FULL-table (seed applied), not stream-only:
    // pick the user with the largest first-half presence and check its
    // n_events equals its full count, strictly greater than its
    // second-half count (i.e. the seed contributed)
    val h1Counts = ev.filter(unix_millis(col("ts")) < mid)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullCounts = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probe = h2Users.filter(u => h1Counts.getOrElse(u, 0L) > 0)
    assert(probe.nonEmpty, "fixture has no user active in both halves")
    out.filter(r => probe.contains(r.getLong(0))).foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(1) == fullCounts(u),
        s"user $u migrated total ${r.getLong(1)} != full count ${fullCounts(u)}")
      assert(r.getLong(1) > fullCounts(u) - h1Counts(u),
        s"user $u total looks stream-only (seed lost)")
    }
  }
}
