package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, MergeIntoTable, UpdateAction}

/** Parser-level verification of the generated MERGE INTO statements:
  * Catalyst parses MERGE natively (execution needs a transactional v2
  * table, which the offline classpath lacks — the generator exists
  * precisely so the port is lift-verbatim on a cluster that has one).
  * Each canned port must parse into a MergeIntoTable with the expected
  * action set, not merely not-throw.
  */
class MergeSqlSpec extends SparkSpec {

  private def parsed(sql: String): MergeIntoTable =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => m
      case other => fail(s"expected MergeIntoTable, got ${other.getClass}: $other")
    }

  test("sink_upsert port: UPDATE + INSERT, no DELETE, subquery source") {
    val m = parsed(MergeSql.sinkUpsertPort)
    assert(m.matchedActions.map(_.getClass.getSimpleName) == Seq("UpdateAction"))
    assert(m.notMatchedActions.map(_.getClass.getSimpleName) == Seq("InsertAction"))
    val upd = m.matchedActions.head.asInstanceOf[UpdateAction]
    assert(upd.condition.isEmpty && upd.assignments.size == 2)
    val ins = m.notMatchedActions.head.asInstanceOf[InsertAction]
    assert(ins.assignments.size == 3) // k, price_cents, status
  }

  test("x_merge_apply port: guarded DELETE before UPDATE, INSERT on miss") {
    val m = parsed(MergeSql.mergeApplyPort)
    assert(m.matchedActions.map(_.getClass.getSimpleName) ==
      Seq("DeleteAction", "UpdateAction"))
    val del = m.matchedActions.head.asInstanceOf[DeleteAction]
    assert(del.condition.nonEmpty, "CDC delete must be guarded, not unconditional")
    assert(del.condition.get.sql.contains("error"))
    assert(m.notMatchedActions.size == 1)
  }

  test("streaming upsert port: latest-wins UPDATE guard, no DELETE") {
    val m = parsed(MergeSql.streamingUpsertPort)
    assert(m.matchedActions.map(_.getClass.getSimpleName) == Seq("UpdateAction"))
    val upd = m.matchedActions.head.asInstanceOf[UpdateAction]
    assert(upd.condition.nonEmpty, "replay idempotence needs the newer-than guard")
    assert(m.notMatchedActions.map(_.getClass.getSimpleName) == Seq("InsertAction"))
  }

  test("generator invariants: keys joined on every key col, disjoint col sets enforced") {
    val twoKey = MergeSql.mergeInto(MergeSql.MergeSpec(
      target = "t1", source = "s1", keyCols = Seq("a", "b"), payloadCols = Seq("v")))
    val m = parsed(twoKey)
    assert(twoKey.contains("t.a = s.a AND t.b = s.b"))
    assert(m.matchedActions.size == 1 && m.notMatchedActions.size == 1)
    intercept[IllegalArgumentException] {
      MergeSql.MergeSpec(target = "t", source = "s",
        keyCols = Seq("a"), payloadCols = Seq("a"))
    }
    intercept[IllegalArgumentException] {
      MergeSql.MergeSpec(target = "t", source = "s",
        keyCols = Nil, payloadCols = Seq("v"))
    }
  }
}
