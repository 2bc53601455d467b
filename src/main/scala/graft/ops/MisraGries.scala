package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries frequent-items summary over long-fingerprinted keys — the
  * mergeable heavy-hitter sketch (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012: the summary merge
  * below preserves the error bound under ARBITRARY merge trees, which is
  * exactly Spark's partial-aggregate shape).
  *
  * Guarantee: after summarizing n items with k counters, every item whose
  * true frequency exceeds n/(k+1) is present in the summary — so `finish`
  * returns a SUPERSET of the true heavy hitters above that threshold.
  * A second exact pass over just these ≤k candidates turns the sketch
  * into an EXACT heavy-hitter answer (see `a_heavy_hitters`): the sketch
  * never decides membership, it only prunes the shuffle.
  *
  * Scale shape: constant state (2k longs) per partition regardless of
  * input size, map-side combinable; the decrement step amortizes to O(1)
  * per item (each decrement event destroys k+1 units of count mass, so
  * there are at most n/(k+1) events of cost O(k)). Keys are hashed to
  * longs UPSTREAM (xxhash64) so the inner scan compares machine words,
  * not strings; a hash collision only merges two keys' counts in the
  * sketch, which can only ADD a candidate — the superset guarantee is
  * collision-proof.
  */
class MisraGries(k: Int) extends Aggregator[Long, (Array[Long], Array[Long]), Array[Long]]
    with Serializable {

  def zero: (Array[Long], Array[Long]) = (Array.empty[Long], Array.empty[Long])

  private def insert(b: (Array[Long], Array[Long]), key: Long, w: Long): (Array[Long], Array[Long]) = {
    val (ks, cs) = b
    var i = 0
    while (i < ks.length) {
      if (ks(i) == key) { cs(i) += w; return b }
      i += 1
    }
    if (ks.length < k) (ks :+ key, cs :+ w)
    else {
      // full and key absent: decrement all by the smallest of (w, min count),
      // drop zeros, re-insert any remainder of w. Looping the classic
      // decrement-by-one here would be O(min), not amortized-O(1).
      var mn = w
      i = 0
      while (i < cs.length) { if (cs(i) < mn) mn = cs(i); i += 1 }
      var keep = 0
      i = 0
      while (i < cs.length) { if (cs(i) > mn) keep += 1; i += 1 }
      val nk = new Array[Long](keep); val nc = new Array[Long](keep)
      var j = 0
      i = 0
      while (i < cs.length) {
        if (cs(i) > mn) { nk(j) = ks(i); nc(j) = cs(i) - mn; j += 1 }
        i += 1
      }
      val rest = w - mn
      if (rest > 0) insert((nk, nc), key, rest) else (nk, nc)
    }
  }

  def reduce(b: (Array[Long], Array[Long]), key: Long): (Array[Long], Array[Long]) =
    insert(b, key, 1L)

  def merge(x: (Array[Long], Array[Long]), y: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    var acc = x
    var i = 0
    while (i < y._1.length) { acc = insert(acc, y._1(i), y._2(i)); i += 1 }
    acc
  }

  /** Candidate key fingerprints, ascending (deterministic output order). */
  def finish(r: (Array[Long], Array[Long])): Array[Long] = {
    val out = r._1.clone()
    java.util.Arrays.sort(out)
    out
  }

  def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Long], Array[Long])]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
