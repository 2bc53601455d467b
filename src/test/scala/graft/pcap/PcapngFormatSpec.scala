package graft.pcap

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for pcapng framing: SHB/IDB/EPB round-trip, per-interface
  * timestamp resolution (both the 10^-v and 2^-v forms), little-endian
  * sections, unknown-block skipping, SPB, truncated tails, and
  * multi-section files with order + interface-table reset. Pure format
  * layer — no SparkSession needed.
  */
class PcapngFormatSpec extends AnyFunSuite {
  import Fixtures._

  private def recs(n: Int): Seq[PcapRecord] =
    (0 until n).map(i => PcapRecord(1000.0 + i + 0.25,
      frame(s"10.0.${i % 7}.1", "10.0.9.9", 1000 + i, 80, if (i % 3 == 0) 17 else 6,
        Array.tabulate[Byte](i % 50)(j => (i + j).toByte))))

  test("EPB round-trip: frames byte-exact, micro timestamps") {
    val in = recs(20)
    val out = PcapngFormat.records(PcapngFormat.write(in)).toSeq
    assert(out.length == in.length)
    out.zip(in).foreach { case (g, e) =>
      assert(g.frame.sameElements(e.frame))
      assert(math.abs(g.ts - e.ts) < 1e-6)
    }
  }

  test("per-interface if_tsresol: micro ifc0, nano ifc1, 2^-10 ifc2") {
    val in = Seq(
      PcapRecord(3.000001, frame("10.0.0.1", "10.0.0.2", 1, 2, 6)),      // ifc0 micro
      PcapRecord(3.000000001, frame("10.0.0.3", "10.0.0.4", 3, 4, 17)),  // ifc1 nano
      PcapRecord(4.5, frame("10.0.0.5", "10.0.0.6", 5, 6, 6)))           // ifc2 2^-10
    val img = PcapngFormat.write(in, divisors = Seq(1e6, 1e9, 1024.0), ifcFor = i => i)
    val out = PcapngFormat.records(img).toSeq
    assert(out.length == 3)
    assert(math.abs(out(0).ts - 3.000001) < 1e-9)      // micro keeps 1 us
    assert(math.abs(out(1).ts - 3.000000001) < 1e-12)  // nano keeps 1 ns
    assert(out(2).ts == 4.5)                           // 4.5 * 1024 exact
    // the nano value is NOT representable at micro resolution — proves
    // the divisor really is per-interface, not global
    assert(out(1).ts != 3.0)
  }

  test("little-endian section parses identically") {
    val in = recs(5)
    val be = PcapngFormat.records(PcapngFormat.write(in)).toSeq
    val le = PcapngFormat.records(PcapngFormat.write(in, littleEndian = true)).toSeq
    assert(le.map(_.ts) == be.map(_.ts))
    assert(le.zip(be).forall { case (a, b) => a.frame.sameElements(b.frame) })
  }

  /** Hand-build one raw block (big-endian) for injection tests. */
  private def rawBlock(blockType: Int, body: Array[Byte]): Array[Byte] = {
    val pad = (4 - body.length % 4) % 4
    val total = 12 + body.length + pad
    val bb = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(blockType).putInt(total).put(body).put(new Array[Byte](pad)).putInt(total)
    bb.array()
  }

  test("unknown block types are skipped by length") {
    val in = recs(4)
    val img = PcapngFormat.write(in)
    // split the image after the 2nd EPB and inject a Name Resolution
    // Block (type 4) plus a custom block (type 0x40000bad)
    val it = PcapngFormat.records(img) // sanity
    assert(it.size == 4)
    val insertAt = {
      // walk blocks to find the offset after the 2nd EPB
      var off = 0; var epbs = 0
      val bb = ByteBuffer.wrap(img).order(ByteOrder.BIG_ENDIAN)
      while (epbs < 2) {
        if (bb.getInt(off) == PcapngFormat.EpbType) epbs += 1
        off += bb.getInt(off + 4)
      }
      off
    }
    val nrb = rawBlock(4, Array.tabulate[Byte](17)(_.toByte))
    val custom = rawBlock(0x40000bad, Array[Byte](1, 2, 3))
    val spliced = img.take(insertAt) ++ nrb ++ custom ++ img.drop(insertAt)
    val out = PcapngFormat.records(spliced).toSeq
    assert(out.length == 4)
    assert(out.zip(in).forall { case (g, e) => g.frame.sameElements(e.frame) })
  }

  test("Simple Packet Block: frame surfaces with ts=0") {
    val f = frame("10.0.0.1", "10.0.0.2", 7, 8, 6)
    val spb = rawBlock(PcapngFormat.SpbType,
      ByteBuffer.allocate(4 + f.length).order(ByteOrder.BIG_ENDIAN)
        .putInt(f.length).put(f).array())
    val img = PcapngFormat.write(recs(1)) ++ spb
    val out = PcapngFormat.records(img).toSeq
    assert(out.length == 2)
    assert(out(1).ts == 0.0 && out(1).frame.sameElements(f))
  }

  test("truncated trailing block ends quietly, keeping prior records") {
    val img = PcapngFormat.write(recs(6))
    val cut = img.dropRight(10)
    val out = PcapngFormat.records(cut).toSeq
    assert(out.length == 5)
  }

  test("multi-section: second SHB resets byte order AND interface table") {
    val s1 = PcapngFormat.write(recs(3), divisors = Seq(1e9)) // ifc0 = nano
    val s2In = Seq(PcapRecord(7.000001, frame("10.1.0.1", "10.1.0.2", 9, 10, 17)))
    val s2 = PcapngFormat.write(s2In, littleEndian = true)    // new section: ifc0 = micro
    val out = PcapngFormat.records(s1 ++ s2).toSeq
    assert(out.length == 4)
    assert(math.abs(out(3).ts - 7.000001) < 1e-9,
      "section-2 EPB must use section-2's interface table (micro), not section-1's nano ifc")
  }

  test("if_tsoffset (option 14): raw hand-built IDB shifts EPB timestamps") {
    // Golden fixture built WITHOUT our writer: SHB, then an IDB whose
    // option walk carries a comment (1), if_tsoffset=1499000000 (14),
    // and if_tsresol (9, micro) — offset deliberately NOT first, so the
    // walk must keep scanning past other options.
    val shb = rawBlock(PcapngFormat.ShbType, ByteBuffer.allocate(16)
      .order(ByteOrder.BIG_ENDIAN)
      .putInt(PcapngFormat.ByteOrderMagic).putShort(1).putShort(0).putLong(-1L).array())
    val idbBody = ByteBuffer.allocate(48).order(ByteOrder.BIG_ENDIAN)
    idbBody.putShort(1).putShort(0).putInt(65535)          // linktype, snaplen
    idbBody.putShort(1).putShort(4).put("eth0".getBytes)   // if_name (code 1)
    idbBody.putShort(14).putShort(8).putLong(1499000000L)  // if_tsoffset
    idbBody.putShort(9).putShort(1).put(6.toByte).put(new Array[Byte](3)) // micro
    idbBody.putShort(0).putShort(0)                        // opt_endofopt
    val idb = rawBlock(PcapngFormat.IdbType, idbBody.array().take(idbBody.position()))
    val f = frame("10.0.0.1", "10.0.0.2", 7, 8, 6)
    val raw = 350500000L // 350.5 s in micro units, relative to the offset
    val epb = rawBlock(PcapngFormat.EpbType, ByteBuffer.allocate(20 + f.length)
      .order(ByteOrder.BIG_ENDIAN)
      .putInt(0).putInt((raw >>> 32).toInt).putInt(raw.toInt)
      .putInt(f.length).putInt(f.length).put(f).array())
    val out = PcapngFormat.records(shb ++ idb ++ epb).toSeq
    assert(out.length == 1)
    assert(out.head.ts == 1499000350.5,
      s"absolute ts must be offset + raw/divisor, got ${out.head.ts}")
    // headMeta (split planning) must surface the same table
    val meta = PcapngFormat.headMeta(shb ++ idb ++ epb).get
    assert(meta.ifaces == Seq(PcapngFormat.IfaceTs(1e6, 1499000000L)))
  }

  test("if_tsoffset writer round-trip: absolute in, absolute out, per interface") {
    val in = Seq(
      PcapRecord(1600000000.25, frame("10.0.0.1", "10.0.0.2", 1, 2, 6)), // ifc0: offset
      PcapRecord(123.5, frame("10.0.0.3", "10.0.0.4", 3, 4, 17)))        // ifc1: none
    val img = PcapngFormat.write(in, divisors = Seq(1e6, 1e6), ifcFor = i => i,
      tsOffsets = Seq(1600000000L, 0L))
    val out = PcapngFormat.records(img).toSeq
    assert(out.map(_.ts) == Seq(1600000000.25, 123.5))
    // The on-wire raw ts for ifc0 must be RELATIVE (0.25 s), not absolute:
    // reading the same image with the offset ignored must NOT round-trip.
    assert(PcapngFormat.headMeta(img).get.ifaces.head.offsetSeconds == 1600000000L)
  }

  test("PcapFormat.records dispatches on magic: both framings, one entry point") {
    val in = recs(3)
    val classic = PcapFormat.records(PcapFormat.write(in)).toSeq
    val ng = PcapFormat.records(PcapngFormat.write(in)).toSeq
    assert(ng.length == classic.length)
    assert(ng.zip(classic).forall { case (a, b) => a.frame.sameElements(b.frame) })
    assert(PcapFormat.records("not a capture at all".getBytes).isEmpty)
  }
}
