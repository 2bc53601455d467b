package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF demo surface (SURVEY.md §2.2 "UDAF" row).
  *
  * Kept in exact integer space so results hash-match the DuckDB oracle
  * (`sum(x*x)`). Aggregators get map-side partial aggregation for free
  * (partial `reduce` per partition, `merge` after the shuffle), so this
  * scales exactly like a built-in sum at 100 TB.
  */
object SumSqLong extends Aggregator[Long, Long, Long] {
  def zero: Long = 0L
  def reduce(b: Long, a: Long): Long = b + a * a
  def merge(b1: Long, b2: Long): Long = b1 + b2
  def finish(r: Long): Long = r
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Per-byte-value histogram over binary payloads — the NIDS feature the
  * reference's byte-matrix hints at (byte-distribution statistics per
  * flow/label). Buffer is a fixed 256-long array: constant state per
  * group, map-side combinable, merge is elementwise add — the exact
  * shape that stays cheap when one group spans millions of packets.
  */
object ByteHistogram extends Aggregator[Array[Byte], Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](256)
  def reduce(b: Array[Long], a: Array[Byte]): Array[Long] = {
    var i = 0
    while (i < a.length) { b(a(i) & 0xff) += 1; i += 1 }
    b
  }
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 256) { x(i) += y(i); i += 1 }
    x
  }
  def finish(r: Array[Long]): Array[Long] = r
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
