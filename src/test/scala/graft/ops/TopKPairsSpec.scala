package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** TopKPairs against its model: however the input is split into
  * partitions and merged, the result must equal sort-by-(score desc, id
  * asc) take k. The arraycopy-based bounded insert is exactly the kind of
  * code an off-by-one ruins silently — seeded randomized trials pin it.
  */
class TopKPairsSpec extends AnyFunSuite {

  private def model(xs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  private def viaAgg(k: Int, parts: Seq[Seq[(Long, Long)]]): Seq[(Long, Long)] = {
    val agg = new TopKPairs(k)
    val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = partials.foldLeft(agg.zero)(agg.merge)
    agg.finish(merged).map(a => (a(0), a(1))).toSeq
  }

  test("bounded-heap top-k equals sort-take-k under any partitioning (500 seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(60)
      // narrow score range => plenty of ties; unique ids => total order
      val xs = rnd.shuffle((0 until n).map(_.toLong).toList)
        .map(id => (rnd.nextInt(21).toLong - 10, id))
      val k = 1 + rnd.nextInt(8)
      val nParts = 1 + rnd.nextInt(5)
      val parts: Seq[Seq[(Long, Long)]] =
        if (xs.isEmpty) Seq(Seq.empty)
        else xs.grouped(math.max(1, math.ceil(xs.size.toDouble / nParts).toInt)).toSeq
      assert(viaAgg(k, parts) == model(xs, k),
        s"mismatch at n=$n k=$k nParts=$nParts")
    }
  }

  test("degenerate cases: empty input, k larger than input") {
    assert(viaAgg(5, Seq(Seq.empty)) == Seq.empty)
    val xs = Seq((3L, 1L), (3L, 0L), (7L, 2L))
    assert(viaAgg(10, Seq(xs)) == Seq((7L, 2L), (3L, 0L), (3L, 1L)))
  }
}
