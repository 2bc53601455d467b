package graft.pcap

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for pcap framing + packet decode/anonymize, pinning the
  * reference semantics listed in SURVEY.md §1.3 / §5.2.
  */
class PcapSpec extends AnyFunSuite {
  import Fixtures._

  private val tcp = frame("10.0.0.1", "10.0.0.2", 1234, 80, 6,
    appPayload = Array.tabulate[Byte](5)(i => (0xF0 + i).toByte))
  private val udp = frame("192.168.1.9", "8.8.8.8", 5353, 53, 17,
    appPayload = Array[Byte](1, 2, 3))

  test("pcap roundtrip: write then read records (micro + nano, BE)") {
    for (nanos <- Seq(false, true)) {
      val img = PcapFormat.write(Seq(
        PcapRecord(1000.25, tcp), PcapRecord(1001.5, udp)), nanos = nanos)
      val out = PcapFormat.records(img).toSeq
      assert(out.map(_.ts) == Seq(1000.25, 1001.5))
      assert(out(0).frame.sameElements(tcp))
      assert(out(1).frame.sameElements(udp))
    }
  }

  test("little-endian pcap images parse") {
    val be = PcapFormat.write(Seq(PcapRecord(7.0, tcp)))
    // byte-swap the 32-bit words of header + record header by rewriting
    val bb = java.nio.ByteBuffer.allocate(be.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val src = java.nio.ByteBuffer.wrap(be).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(src.getInt()) // magic: LE writer flips its representation
    bb.putShort(src.getShort()).putShort(src.getShort())
    bb.putInt(src.getInt()).putInt(src.getInt()).putInt(src.getInt()).putInt(src.getInt())
    bb.putInt(src.getInt()).putInt(src.getInt()).putInt(src.getInt()).putInt(src.getInt())
    val rest = new Array[Byte](src.remaining()); src.get(rest); bb.put(rest)
    val out = PcapFormat.records(bb.array()).toSeq
    assert(out.size == 1 && out.head.ts == 7.0 && out.head.frame.sameElements(tcp))
  }

  test("truncated trailing record = flush-and-finish, not failure") {
    val img = PcapFormat.write(Seq(PcapRecord(1.0, tcp), PcapRecord(2.0, udp)))
    val cut = img.dropRight(3) // cut into the last record's bytes
    val out = PcapFormat.records(cut).toSeq
    assert(out.size == 1 && out.head.ts == 1.0)
  }

  test("non-pcap bytes yield no records") {
    assert(PcapFormat.records("not a pcap at all".getBytes).isEmpty)
    assert(PcapFormat.records(Array.empty[Byte]).isEmpty)
  }

  test("decode TCP: metadata read before anonymization") {
    val p = PacketDecoder.decode(42.5, tcp).get
    assert(p.timestamp == 42.5)
    assert(p.src_ip == "10.0.0.1" && p.dst_ip == "10.0.0.2")
    assert(p.src_port == 1234L && p.dst_port == 80L)
    assert(p.protocol == "6" && p.label == "benign")
  }

  test("anonymization zeroes addresses+ports in payload, keeps checksums stale") {
    val p = PacketDecoder.decode(0.0, tcp).get
    val pl = p.payload
    assert(pl.length == 20 + 20 + 5) // full IP datagram: hdr + tcp + app
    assert((12 until 20).forall(pl(_) == 0))          // src+dst zeroed
    assert(pl(20) == 0 && pl(21) == 0 && pl(22) == 0 && pl(23) == 0) // ports zeroed
    assert((pl(10) & 0xff) == 0xBE && (pl(11) & 0xff) == 0xEF) // IP checksum untouched
    assert((pl(36) & 0xff) == 0xCA && (pl(37) & 0xff) == 0xFE) // TCP checksum untouched
    assert((pl(40) & 0xff) == 0xF0) // app payload intact
  }

  test("UDP decode") {
    val p = PacketDecoder.decode(1.0, udp).get
    assert(p.protocol == "17" && p.src_port == 5353L && p.dst_port == 53L)
    assert(p.payload.length == 20 + 8 + 3)
    assert(p.payload(20) == 0 && p.payload(23) == 0) // udp ports zeroed
  }

  test("Ethernet padding is trimmed to the IP total-length (dpkt parity)") {
    val padded = frame("1.2.3.4", "5.6.7.8", 1, 2, 17, Array[Byte](9), padTo = 60)
    val p = PacketDecoder.decode(0.0, padded).get
    assert(p.payload.length == 20 + 8 + 1) // pad bytes excluded
  }

  test("single 802.1Q VLAN tag is unwrapped") {
    val v = frame("10.0.0.1", "10.0.0.2", 1234, 80, 6, vlan = true)
    val p = PacketDecoder.decode(0.0, v).get
    assert(p.src_ip == "10.0.0.1" && p.protocol == "6")
  }

  test("QinQ / 802.1ad stacked tags are dropped (single-tag unwrap only, dpkt parity)") {
    // 0x8100-in-0x8100: after the single unwrap the ethertype is still
    // 0x8100, not IPv4, so the filter cascade drops the frame — QinQ is
    // out of scope exactly as in the reference (SURVEY.md §7.5).
    val inner = frame("10.0.0.1", "10.0.0.2", 1234, 80, 6, vlan = true)
    val qinq = java.nio.ByteBuffer.allocate(inner.length + 4)
    qinq.put(inner, 0, 12) // macs
    qinq.putShort(0x8100.toShort).putShort(0x00C8.toShort) // outer tag, VID 200
    qinq.put(inner, 12, inner.length - 12) // inner tag + payload
    assert(PacketDecoder.decode(0.0, qinq.array()).isEmpty)
    // 802.1ad S-tag (0x88A8) is not 0x8100 → dropped without any unwrap.
    val stag = inner.clone()
    stag(12) = 0x88.toByte; stag(13) = 0xA8.toByte
    assert(PacketDecoder.decode(0.0, stag).isEmpty)
  }

  test("filter cascade: non-IP, IPv6, non-TCP/UDP, truncated all drop") {
    assert(PacketDecoder.decode(0.0, arpFrame).isEmpty)
    assert(PacketDecoder.decode(0.0, ipv6Frame).isEmpty)
    val icmp = frame("1.1.1.1", "2.2.2.2", 0, 0, 17).clone()
    icmp(14 + 9) = 1 // rewrite proto to ICMP
    assert(PacketDecoder.decode(0.0, icmp).isEmpty)
    assert(PacketDecoder.decode(0.0, tcp.take(20)).isEmpty) // truncated IP header
    assert(PacketDecoder.decode(0.0, tcp.take(14 + 20 + 10)).isEmpty) // truncated TCP header
    assert(PacketDecoder.decode(0.0, Array.empty[Byte]).isEmpty)
  }

  test("IPv4 options (ihl > 20) shift the transport offset correctly") {
    // hand-build: eth + 24-byte IP header (ihl=6, 4 option bytes) + UDP
    val bb = java.nio.ByteBuffer.allocate(14 + 24 + 8)
    bb.put(macs); bb.putShort(0x0800.toShort)
    bb.put(0x46.toByte).put(0.toByte).putShort((24 + 8).toShort) // ihl=6
    bb.putShort(0x1234.toShort).putShort(0x4000.toShort)
    bb.put(64.toByte).put(17.toByte).putShort(0xBEEF.toShort)
    bb.put(ipBytes("1.2.3.4")).put(ipBytes("5.6.7.8"))
    bb.putInt(0x01010100) // NOP NOP NOP EOL options
    bb.putShort(1111.toShort).putShort(2222.toShort) // UDP at offset ihl*4
    bb.putShort(8.toShort).putShort(0xCAFE.toShort)
    val p = PacketDecoder.decode(0.0, bb.array()).get
    assert(p.src_port == 1111L && p.dst_port == 2222L)
    // ports zeroed at the SHIFTED offset, options untouched
    assert(p.payload(24) == 0 && p.payload(27) == 0)
    assert((p.payload(20) & 0xff) == 1) // first option byte intact
  }

  test("snaplen truncation at exactly the TCP header: decodes, byte-exact payload") {
    // Capture cut at 54 B = eth(14) + ip(20) + tcp(20): the 5 app bytes are
    // lost but dpkt still parses (slices data to what's available) and the
    // IP total-length FIELD keeps its pre-truncation value 45 (dpkt parity:
    // re-serialization does not rewrite ip.len). Expected bytes are
    // hand-computed against BytesProcessor.py:211-268 semantics, not
    // derived from the input.
    val p = PacketDecoder.decode(3.0, tcp.take(54)).get
    assert(p.src_ip == "10.0.0.1" && p.src_port == 1234L && p.dst_port == 80L)
    val expected: Array[Byte] = Array(
      0x45, 0x00, 0x00, 0x2D, 0x12, 0x34, 0x40, 0x00, // vihl,tos,len=45,id,DF
      0x40, 0x06, 0xBE, 0xEF, 0x00, 0x00, 0x00, 0x00, // ttl,tcp,STALE cksum,src=0
      0x00, 0x00, 0x00, 0x00,                         // dst=0
      0x00, 0x00, 0x00, 0x00,                         // ports zeroed
      0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, // seq, ack
      0x50, 0x18, 0x02, 0x00, 0xCA, 0xFE, 0x00, 0x00  // off,flags,win,STALE cksum,urg
    ).map(_.toByte)
    assert(p.payload.sameElements(expected),
      s"payload ${p.payload.map("%02x".format(_)).mkString} != expected")
  }

  test("snaplen sweep: every prefix length decodes iff the transport header survives") {
    // tcp is 59 B (14+20+20+5). dpkt exposes ports only with a full
    // transport header => Some iff >= 54 captured bytes; below that the
    // NeedData path swallows the packet. Never throws at ANY cut point.
    for (n <- 0 to tcp.length) {
      val r = PacketDecoder.decode(0.0, tcp.take(n))
      assert(r.isDefined == (n >= 54), s"cut at $n: got $r")
      r.foreach { p =>
        assert(p.src_ip == "10.0.0.1" && p.dst_ip == "10.0.0.2")
        assert(p.src_port == 1234L && p.dst_port == 80L)
        assert(p.payload.length == math.min(n - 14, 45)) // trimmed to ip.len
      }
    }
    val udpLen = udp.length // 14+20+8+3
    for (n <- 0 to udpLen) {
      val r = PacketDecoder.decode(0.0, udp.take(n))
      assert(r.isDefined == (n >= 14 + 20 + 8), s"udp cut at $n: got $r")
    }
  }

  test("snaplen cut inside IPv4 options (ihl=6, capture ends mid-options) drops") {
    val bb = java.nio.ByteBuffer.allocate(14 + 24 + 8)
    bb.put(macs); bb.putShort(0x0800.toShort)
    bb.put(0x46.toByte).put(0.toByte).putShort((24 + 8).toShort) // ihl=6
    bb.putShort(0x1234.toShort).putShort(0x4000.toShort)
    bb.put(64.toByte).put(17.toByte).putShort(0xBEEF.toShort)
    bb.put(ipBytes("1.2.3.4")).put(ipBytes("5.6.7.8"))
    bb.putInt(0x01010100)
    bb.putShort(1111.toShort).putShort(2222.toShort)
    bb.putShort(8.toShort).putShort(0xCAFE.toShort)
    val full = bb.array()
    assert(PacketDecoder.decode(0.0, full).isDefined) // sanity: intact frame decodes
    assert(PacketDecoder.decode(0.0, full.take(14 + 22)).isEmpty) // mid-options
    assert(PacketDecoder.decode(0.0, full.take(14 + 24 + 4)).isEmpty) // mid-UDP
  }

  test("QinQ (stacked 802.1Q tags) drops — only a single tag is unwrapped") {
    val inner = tcp.drop(14) // ip datagram of the tcp fixture
    val bb = java.nio.ByteBuffer.allocate(12 + 4 + 4 + 2 + inner.length)
    bb.put(macs)
    bb.putShort(0x8100.toShort).putShort(0x0064.toShort) // outer tag
    bb.putShort(0x8100.toShort).putShort(0x00C8.toShort) // inner tag
    bb.putShort(0x0800.toShort)
    bb.put(inner)
    assert(PacketDecoder.decode(0.0, bb.array()).isEmpty)
  }

  test("padded UDP frame: byte-exact anonymized payload (pad excluded)") {
    val padded = frame("1.2.3.4", "5.6.7.8", 1, 2, 17, Array[Byte](9), padTo = 60)
    assert(padded.length == 60)
    val p = PacketDecoder.decode(0.0, padded).get
    val expected: Array[Byte] = Array(
      0x45, 0x00, 0x00, 0x1D, 0x12, 0x34, 0x40, 0x00, // len=29
      0x40, 0x11, 0xBE, 0xEF, 0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00,
      0x00, 0x00, 0x00, 0x00,                         // udp ports zeroed
      0x00, 0x09, 0xCA, 0xFE,                         // udp len, STALE cksum
      0x09                                            // app byte
    ).map(_.toByte)
    assert(p.payload.sameElements(expected))
  }

  test("decode is total on truncations/corruptions of valid frames (never throws)") {
    val rnd = new scala.util.Random(7)
    val bases = Seq(tcp, udp, frame("9.9.9.9", "8.8.4.4", 443, 60000, 6,
      Array.tabulate[Byte](12)(_.toByte), vlan = true))
    for (base <- bases; _ <- 0 until 500) {
      val mutated = base.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      PacketDecoder.decode(0.0, mutated)                    // corrupted byte
      PacketDecoder.decode(0.0, mutated.take(rnd.nextInt(mutated.length + 1)))
    }
  }

  test("decode is total on arbitrary bytes (never throws)") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val n = rnd.nextInt(80)
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      PacketDecoder.decode(0.0, junk) // must not throw
    }
  }
}
