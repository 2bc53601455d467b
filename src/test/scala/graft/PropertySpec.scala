package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pcap.{PcapFormat, PcapRecord}

/** Property-based suites (scalacheck driven directly — no scalatestplus
  * bridge on the offline classpath): randomized inputs against model
  * implementations for the pure-JVM kernels whose example specs can
  * only pin single points.
  */
class PropertySpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(200)
    .withInitialSeed(org.scalacheck.rng.Seed(20260815L))

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  test("PcapFormat write->records round-trips frames exactly and ts to format precision") {
    val genRec = for {
      ts <- Gen.chooseNum(0L, 4000000000L).map(_ / 1e3) // µs-aligned epochs
      n <- Gen.chooseNum(0, 256)
      bytes <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield PcapRecord(ts, bytes.toArray)
    check("classic round-trip", Prop.forAll(Gen.listOfN(20, genRec)) { recs =>
      val out = PcapFormat.records(PcapFormat.write(recs)).toSeq
      out.length == recs.length &&
        out.zip(recs).forall { case (a, b) =>
          java.util.Arrays.equals(a.frame, b.frame) &&
            math.abs(a.ts - b.ts) <= 1e-6 // classic pcap stores sec+µs
        }
    })
    check("nanos round-trip", Prop.forAll(Gen.listOfN(20, genRec)) { recs =>
      val out = PcapFormat.records(PcapFormat.write(recs, nanos = true)).toSeq
      out.zip(recs).forall { case (a, b) => math.abs(a.ts - b.ts) <= 1e-9 }
    })
  }

  test("MisraGries(k) result is a superset of every key with frequency > n/k") {
    val genStream = for {
      domain <- Gen.chooseNum(1, 12)
      n <- Gen.chooseNum(1, 500)
      // skewed: low keys drawn much more often than high ones
      xs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.chooseNum(0, 1)), (3, Gen.chooseNum(0, domain / 2)),
        (1, Gen.chooseNum(0, domain))))
    } yield xs.map(_.toLong)
    val genK = Gen.chooseNum(2, 8)
    check("superset guarantee (sequential)", Prop.forAll(genStream, genK) { (xs, k) =>
      val mg = new graft.ops.MisraGries(k)
      val kept = mg.finish(xs.foldLeft(mg.zero)(mg.reduce)).toSet
      val freq = xs.groupBy(identity).view.mapValues(_.size).toMap
      freq.forall { case (key, c) => c * k <= xs.length || kept.contains(key) }
    })
    check("superset guarantee survives arbitrary merge splits",
      Prop.forAll(genStream, genK, Gen.chooseNum(0, 100)) { (xs, k, cut) =>
        val mg = new graft.ops.MisraGries(k)
        val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.length + 1))
        val merged = mg.merge(
          l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
        val kept = mg.finish(merged).toSet
        val freq = xs.groupBy(identity).view.mapValues(_.size).toMap
        freq.forall { case (key, c) => c * k <= xs.length || kept.contains(key) }
      })
  }
}
