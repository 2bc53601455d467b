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

/** Exact top-k (score, id) per group as a bounded-buffer Aggregator — the
  * aggregate Spark lacks natively (the built-in route is a window sort,
  * which sorts EVERY candidate per group). State is at most k pairs, so
  * map-side partial aggregation reduces each partition's candidates to k
  * before the shuffle: k×partitions rows move instead of all candidates.
  * Order: score desc, id asc (ties), matching the window formulation.
  * Encoded as (scores, ids) parallel arrays kept sorted; insert is O(k)
  * per row, merge O(k).
  */
class TopKPairs(k: Int) extends Aggregator[(Long, Long), (Array[Long], Array[Long]), Array[Array[Long]]]
    with Serializable {
  private def better(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)
  def zero: (Array[Long], Array[Long]) = (Array.empty[Long], Array.empty[Long])
  def reduce(b: (Array[Long], Array[Long]), a: (Long, Long)): (Array[Long], Array[Long]) = {
    val (ss, ids) = b
    val n = ss.length
    if (n == k && !better(a._1, a._2, ss(n - 1), ids(n - 1))) b
    else {
      // position of the new element in the sorted buffer
      var p = n
      while (p > 0 && better(a._1, a._2, ss(p - 1), ids(p - 1))) p -= 1
      val m = math.min(n + 1, k)
      val ns = new Array[Long](m); val ni = new Array[Long](m)
      System.arraycopy(ss, 0, ns, 0, p); System.arraycopy(ids, 0, ni, 0, p)
      ns(p) = a._1; ni(p) = a._2
      val tail = m - p - 1
      if (tail > 0) { System.arraycopy(ss, p, ns, p + 1, tail); System.arraycopy(ids, p, ni, p + 1, tail) }
      (ns, ni)
    }
  }
  def merge(x: (Array[Long], Array[Long]), y: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    var acc = x
    var i = 0
    while (i < y._1.length) { acc = reduce(acc, (y._1(i), y._2(i))); i += 1 }
    acc
  }
  def finish(r: (Array[Long], Array[Long])): Array[Array[Long]] =
    r._1.indices.map(i => Array(r._1(i), r._2(i))).toArray
  def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Long], Array[Long])]()
  def outputEncoder: Encoder[Array[Array[Long]]] = ExpressionEncoder[Array[Array[Long]]]()
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
