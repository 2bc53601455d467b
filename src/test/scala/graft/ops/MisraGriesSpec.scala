package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** MisraGries against its contract (the guarantee a_heavy_hitters'
  * exactness rests on): for ANY stream split across ANY merge tree, the
  * finished summary contains every key with true frequency > n/(k+1) —
  * the superset guarantee of Misra & Gries 1982 preserved under merge
  * (Agarwal et al., PODS 2012). The weighted decrement (decrement-by-min
  * with remainder re-insert) and arbitrary-tree merge are the subtle
  * parts; seeded randomized trials over skewed streams + random binary
  * merge trees pin both. Also pinned: the size bound (≤ k counters) and
  * the count-error bound (each kept counter underestimates its key's
  * true frequency by at most n/(k+1)).
  */
class MisraGriesSpec extends AnyFunSuite {

  /** Fold the stream through random-sized partitions, then combine the
    * partial summaries in a random binary merge tree — Spark's partial
    * aggregation makes no ordering promise, so neither do we. */
  private def viaRandomTree(
      agg: MisraGries,
      xs: Seq[Long],
      rnd: scala.util.Random): (Array[Long], Array[Long]) = {
    val nParts = 1 + rnd.nextInt(6)
    val parts =
      if (xs.isEmpty) Seq(Seq.empty[Long])
      else xs.grouped(math.max(1, math.ceil(xs.size.toDouble / nParts).toInt)).toSeq
    val partials = scala.collection.mutable.ArrayBuffer(
      parts.map(_.foldLeft(agg.zero)(agg.reduce)): _*)
    while (partials.size > 1) {
      val i = rnd.nextInt(partials.size)
      val a = partials.remove(i)
      val j = rnd.nextInt(partials.size)
      val b = partials.remove(j)
      // randomize argument order too — merge(x, y) need not be symmetric
      partials.append(if (rnd.nextBoolean()) agg.merge(a, b) else agg.merge(b, a))
    }
    partials.head
  }

  test("superset guarantee under random streams and random merge trees (300 seeded trials)") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 300) {
      val k = 1 + rnd.nextInt(12)
      val nKeys = 1 + rnd.nextInt(30)
      // Zipf-ish skew: key i drawn with weight ~ 1/(i+1); stream length up to ~600
      val n = rnd.nextInt(600)
      val xs = Seq.fill(n) {
        var key = 0
        var r = rnd.nextDouble() * (1 to nKeys).map(1.0 / _).sum
        var i = 1
        while (r > 0 && i <= nKeys) { r -= 1.0 / i; key = i - 1; i += 1 }
        key.toLong
      }
      val agg = new MisraGries(k)
      val buf = viaRandomTree(agg, xs, rnd)
      val kept = agg.finish(buf).toSet
      val freq = xs.groupBy(identity).map { case (key, g) => key -> g.size.toLong }
      val threshold = n.toDouble / (k + 1)
      val heavy = freq.collect { case (key, f) if f > threshold => key }.toSet
      assert(heavy.subsetOf(kept),
        s"trial=$trial k=$k n=$n missing=${heavy -- kept} kept=$kept freqs=$freq")
      assert(buf._1.length <= k, s"trial=$trial summary holds ${buf._1.length} > k=$k counters")
      // count-error bound: kept counter c(key) satisfies f(key) - n/(k+1) <= c <= f(key)
      buf._1.zip(buf._2).foreach { case (key, c) =>
        val f = freq.getOrElse(key, 0L)
        assert(c <= f, s"trial=$trial key=$key overcounted: c=$c > f=$f")
        assert(c >= f - threshold, s"trial=$trial key=$key undercounted past bound: c=$c f=$f thr=$threshold")
      }
    }
  }

  test("degenerate cases: empty stream, single key, k=1") {
    val agg = new MisraGries(4)
    assert(agg.finish(agg.zero).isEmpty)
    val one = (1 to 50).foldLeft(agg.zero)((b, _) => agg.reduce(b, 7L))
    assert(agg.finish(one).toSeq == Seq(7L))
    // k=1: the single counter must still catch a strict-majority element
    val maj = new MisraGries(1)
    val xs = scala.util.Random.shuffle(List.fill(60)(1L) ++ (2L to 41L).toList)
    val buf = xs.foldLeft(maj.zero)(maj.reduce)
    assert(maj.finish(buf).toSeq == Seq(1L)) // freq 60 > 100/2
  }
}
