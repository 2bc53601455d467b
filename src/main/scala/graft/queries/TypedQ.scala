package graft.queries

import graft._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed Dataset[T] surface: case-class encoders, typed filter/map,
  * `groupByKey` + a typed `Aggregator` — the compile-time-checked face of
  * the engine (SURVEY §1.4). Same physical machinery underneath (encoders
  * deserialize inside codegen; groupByKey hash-shuffles the key), so the
  * typed path costs one extra serialization boundary but keeps the same
  * partial+final aggregation shape — demonstrated by sharing an oracle
  * with plain SQL.
  */
object TypedQ {

  final case class OrderRow(o_orderkey: Long, o_orderstatus: String, o_totalprice: Double)
  final case class StatusStats(status: String, n: Long, total_cents: Long, max_cents: Long)

  /** Typed sum+max aggregator over exact cents. */
  private object CentsAgg extends Aggregator[OrderRow, (Long, Long, Long), (Long, Long, Long)] {
    def zero: (Long, Long, Long) = (0L, 0L, Long.MinValue)
    private def cents(o: OrderRow): Long = math.round(o.o_totalprice * 100)
    def reduce(b: (Long, Long, Long), o: OrderRow): (Long, Long, Long) =
      (b._1 + 1, b._2 + cents(o), math.max(b._3, cents(o)))
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
      (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3))
    def finish(r: (Long, Long, Long)): (Long, Long, Long) = r
    def bufferEncoder: Encoder[(Long, Long, Long)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[(Long, Long, Long)] = bufferEncoder
  }

  val qTyped: Q = Q(
    "q_typed",
    (spark, dir) => {
      import spark.implicits._
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .as[OrderRow]
        .filter((o: OrderRow) => o.o_orderkey % 3 != 0) // typed predicate
        .groupByKey((o: OrderRow) => o.o_orderstatus)
        .agg(CentsAgg.toColumn)
        .map { case (status, (n, total, mx)) => StatusStats(status, n, total, mx) }
        .toDF()
        .orderBy("status")
    },
    Some("""SELECT o_orderstatus AS status, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
           | CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS max_cents
           |FROM orders WHERE o_orderkey % 3 <> 0
           |GROUP BY 1 ORDER BY status""".stripMargin))

  val all: Seq[Q] = Seq(qTyped)
}
