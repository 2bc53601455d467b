package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the IPv6 decode extension: 40-B header, next-header
  * walk over extension chains, v6 address anonymization, payload-length
  * trim, and the reference-parity default that still DROPS v6. Pure
  * decoder layer — no SparkSession.
  */
class PacketDecoderV6Spec extends AnyFunSuite {
  import Fixtures._

  private def v6(frame: Array[Byte]): Option[Packet] =
    PacketDecoder.decode(100.0, frame, ipv6 = true)

  test("reference-parity default still drops IPv6 frames") {
    val f = frame6(1, 2, 443, 55000)
    assert(PacketDecoder.decode(100.0, f).isEmpty)
    assert(v6(f).isDefined)
  }

  test("TCP over plain IPv6: metadata before anonymization") {
    val p = v6(frame6(7, 9, 443, 55000, proto = 6,
      appPayload = Array[Byte](0x11, 0x22))).get
    assert(p.src_ip == "2001:db8:0:0:0:0:0:7")
    assert(p.dst_ip == "2001:db8:0:0:0:0:0:9")
    assert(p.src_port == 443 && p.dst_port == 55000)
    assert(p.protocol == "6")
    assert(p.payload.length == 40 + 20 + 2)
  }

  test("anonymization: 32 address bytes + ports zeroed, checksums stale, header intact") {
    val p = v6(frame6(7, 9, 443, 55000, proto = 6)).get
    (8 until 40).foreach(i => assert(p.payload(i) == 0, s"address byte $i not zeroed"))
    (40 until 44).foreach(i => assert(p.payload(i) == 0, s"port byte $i not zeroed"))
    assert((p.payload(0) & 0xf0) == 0x60, "version nibble must survive")
    assert((p.payload(7) & 0xff) == 64, "hop limit must survive")
    // TCP checksum at transport+16 stays STALE (0xCAFE), like the v4 path
    assert((p.payload(40 + 16) & 0xff) == 0xCA && (p.payload(40 + 17) & 0xff) == 0xFE)
  }

  test("UDP decode, checksum stale at transport+6") {
    val p = v6(frame6(1, 2, 53, 5353, proto = 17, appPayload = Array[Byte](9))).get
    assert(p.protocol == "17" && p.src_port == 53 && p.dst_port == 5353)
    assert((p.payload(40 + 6) & 0xff) == 0xCA && (p.payload(40 + 7) & 0xff) == 0xFE)
    assert(p.payload.length == 40 + 8 + 1)
  }

  test("extension chain hop-by-hop -> dest-opts -> TCP: walk lands on the transport") {
    val p = v6(frame6(3, 4, 80, 9999, proto = 6, exts = Seq(0, 60))).get
    assert(p.protocol == "6" && p.src_port == 80 && p.dst_port == 9999)
    // ports live after the two 8-B exts and are zeroed there
    (56 until 60).foreach(i => assert(p.payload(i) == 0))
    // the extension bytes themselves are untouched (only addresses+ports anonymize)
    assert(p.payload(41) == 0) // hbh hdrExtLen survives as written
    assert((p.payload(42) & 0xff) == 0x40) // first hbh option byte (0x40 + type 0 + j 0)
  }

  test("routing extension before UDP") {
    val p = v6(frame6(3, 4, 123, 124, proto = 17, exts = Seq(43))).get
    assert(p.protocol == "17" && p.src_port == 123)
  }

  test("first fragment decodes; non-first fragment drops (no transport header)") {
    assert(v6(frame6(1, 2, 80, 81, exts = Seq(44), fragOffsetUnits = 0)).isDefined)
    assert(v6(frame6(1, 2, 80, 81, exts = Seq(44), fragOffsetUnits = 5)).isEmpty)
  }

  test("unsupported next header (ICMPv6) drops") {
    assert(v6(frame6(1, 2, 0, 0, proto = 58)).isEmpty)
  }

  test("payload-length trim excludes Ethernet padding") {
    val p = v6(frame6(1, 2, 80, 81, proto = 17, padTo = 200)).get
    assert(p.payload.length == 40 + 8, "pad bytes leaked into the datagram")
  }

  test("truncations drop: inside v6 header, inside ext, inside transport") {
    val full = frame6(1, 2, 80, 81, proto = 6, exts = Seq(0))
    assert(v6(full).isDefined)
    assert(v6(full.take(14 + 30)).isEmpty)      // mid fixed header
    assert(v6(full.take(14 + 44)).isEmpty)      // mid extension
    assert(v6(full.take(14 + 48 + 10)).isEmpty) // mid TCP header
  }

  test("decode stays total on arbitrary v6-tagged bytes") {
    val rnd = new scala.util.Random(13)
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120)); rnd.nextBytes(b)
      if (b.length >= 14) { b(12) = 0x86.toByte; b(13) = 0xDD.toByte }
      v6(b) // must not throw
    }
  }
}
