package graft.ops

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
