package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property proof of the identity ts_cusum's distributed plan rests on:
  * for EVERY integer series, the closed form S_t = P_t − min_{0≤k≤t} P_k
  * (P = prefix sum, P_0 = 0 included via the least-with-zero) equals the
  * literal control-chart recursion S_t = max(0, S_{t−1} + y_t). The
  * RoundTenOpsSpec pin checks it on the fixture; this checks it on 500
  * seeded random series plus the degenerate shapes (empty, all-negative,
  * all-positive, alternating extremes).
  */
class CusumIdentitySpec extends AnyFunSuite {

  private def closedForm(ys: Seq[Long]): Seq[Long] = {
    val prefixes = ys.scanLeft(0L)(_ + _).tail // P_1..P_n
    prefixes
      .scanLeft((0L, 0L)) { case ((runMin, _), p) =>
        val m = math.min(runMin, p) // running min INCLUDING P_0 = 0
        (m, p - m)
      }
      .tail.map(_._2)
  }

  private def recursion(ys: Seq[Long]): Seq[Long] =
    ys.scanLeft(0L)((s, y) => math.max(0L, s + y)).tail

  test("closed form P - min prefix == max(0, S + y) recursion, 500 random series") {
    val rnd = new scala.util.Random(42) // seeded: deterministic suite
    for (trial <- 1 to 500) {
      val n = rnd.nextInt(60)
      val ys = Seq.fill(n)(rnd.nextLong(2000001L) - 1000000L)
      assert(closedForm(ys) == recursion(ys), s"trial $trial diverged on $ys")
    }
  }

  test("degenerate shapes: empty, monotone, alternating extremes") {
    for (ys <- Seq(
        Seq.empty[Long],
        Seq(-5L, -1L, -100L),
        Seq(3L, 7L, 1L),
        Seq(1000000L, -1000000L, 1000000L, -1000000L),
        Seq(0L, 0L, 0L)))
      assert(closedForm(ys) == recursion(ys), s"diverged on $ys")
  }
}
