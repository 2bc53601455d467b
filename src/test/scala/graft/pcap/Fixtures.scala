package graft.pcap

import java.nio.ByteBuffer

/** Hand-crafted frame builders for golden tests (FIXTURES.md / SURVEY.md
  * §5.2). Deterministic bytes, nonzero fake checksums so the
  * stale-checksum anonymization contract is observable.
  */
object Fixtures {

  def macs: Array[Byte] = Array.tabulate[Byte](12)(i => (0x10 + i).toByte)

  def ipBytes(dotted: String): Array[Byte] =
    dotted.split('.').map(s => s.toInt.toByte)

  /** Ethernet/IPv4/{TCP,UDP} frame. appPayload rides after the transport
    * header. ihl fixed 20, IP checksum 0xBEEF, TCP/UDP checksum 0xCAFE.
    */
  def frame(
      srcIp: String, dstIp: String,
      sport: Int, dport: Int,
      proto: Int, // 6 or 17
      appPayload: Array[Byte] = Array.empty,
      vlan: Boolean = false,
      padTo: Int = 0): Array[Byte] = {
    val transportLen = if (proto == 6) 20 else 8
    val totalLen = 20 + transportLen + appPayload.length
    val ethLen = if (vlan) 18 else 14
    val frameLen = math.max(ethLen + totalLen, padTo)
    val bb = ByteBuffer.allocate(frameLen)
    bb.put(macs)
    if (vlan) { bb.putShort(0x8100.toShort); bb.putShort(0x0064.toShort) } // tag, VID 100
    bb.putShort(0x0800.toShort)
    // IPv4 header
    bb.put(0x45.toByte).put(0.toByte).putShort(totalLen.toShort)
    bb.putShort(0x1234.toShort).putShort(0x4000.toShort) // id, DF
    bb.put(64.toByte).put(proto.toByte).putShort(0xBEEF.toShort) // ttl, proto, checksum
    bb.put(ipBytes(srcIp)).put(ipBytes(dstIp))
    // transport header
    if (proto == 6) {
      bb.putShort(sport.toShort).putShort(dport.toShort)
      bb.putInt(0x01020304).putInt(0x05060708) // seq, ack
      bb.put(0x50.toByte).put(0x18.toByte).putShort(0x0200.toShort) // off, PSH|ACK, win
      bb.putShort(0xCAFE.toShort).putShort(0.toShort) // checksum, urg
    } else {
      bb.putShort(sport.toShort).putShort(dport.toShort)
      bb.putShort((8 + appPayload.length).toShort).putShort(0xCAFE.toShort)
    }
    bb.put(appPayload)
    bb.array() // trailing zeros = Ethernet pad when padTo > natural size
  }

  /** Non-IP frame (ARP ethertype). */
  def arpFrame: Array[Byte] = {
    val bb = ByteBuffer.allocate(42)
    bb.put(macs); bb.putShort(0x0806.toShort)
    bb.put(Array.fill[Byte](28)(0x0A))
    bb.array()
  }

  /** IPv6 frame (ethertype 0x86DD) — must be dropped. */
  def ipv6Frame: Array[Byte] = {
    val bb = ByteBuffer.allocate(14 + 40)
    bb.put(macs); bb.putShort(0x86DD.toShort)
    bb.put(0x60.toByte); bb.put(Array.fill[Byte](39)(0))
    bb.array()
  }

  /** Ethernet/IPv6/{TCP,UDP} frame with an optional extension-header
    * chain. Addresses are 2001:db8::src / 2001:db8::1:dst (last byte
    * given). `exts` lists extension-header type codes in chain order;
    * non-fragment exts are minimal (8 B, hdrExtLen=0) with deterministic
    * option bytes, a fragment ext (44) takes `fragOffsetUnits` 8-byte
    * units. Fake transport checksums 0xCAFE so staleness is observable.
    */
  def frame6(
      srcLast: Int, dstLast: Int,
      sport: Int, dport: Int,
      proto: Int = 6, // 6 or 17
      exts: Seq[Int] = Nil,
      appPayload: Array[Byte] = Array.empty,
      fragOffsetUnits: Int = 0,
      padTo: Int = 0): Array[Byte] = {
    val transportLen = if (proto == 6) 20 else 8
    val extBytes = exts.length * 8
    val payloadLen = extBytes + transportLen + appPayload.length
    val frameLen = math.max(14 + 40 + payloadLen, padTo)
    val bb = ByteBuffer.allocate(frameLen)
    bb.put(macs); bb.putShort(0x86DD.toShort)
    val firstNh = exts.headOption.getOrElse(proto)
    bb.putInt(0x60000000) // version 6, tc/flow 0
    bb.putShort(payloadLen.toShort).put(firstNh.toByte).put(64.toByte) // plen, nh, hop limit
    def addr(last: Int): Array[Byte] = {
      val a = new Array[Byte](16)
      a(0) = 0x20; a(1) = 0x01; a(2) = 0x0d; a(3) = 0xb8.toByte; a(15) = last.toByte
      a
    }
    bb.put(addr(srcLast)); bb.put(addr(dstLast))
    // extension chain: each header's first byte = NEXT header in chain
    exts.zipWithIndex.foreach { case (t, i) =>
      val nh = exts.lift(i + 1).getOrElse(proto)
      if (t == 44) { // fragment: nh, reserved, offset(13b)+M, identification
        bb.put(nh.toByte).put(0.toByte)
        bb.putShort(((fragOffsetUnits << 3) | (if (fragOffsetUnits > 0) 1 else 0)).toShort)
        bb.putInt(0x0000BEEF)
      } else { // minimal ext: nh, hdrExtLen=0, 6 deterministic option bytes
        bb.put(nh.toByte).put(0.toByte)
        bb.put(Array.tabulate[Byte](6)(j => (0x40 + t + j).toByte))
      }
    }
    if (proto == 6) {
      bb.putShort(sport.toShort).putShort(dport.toShort)
      bb.putInt(0x01020304).putInt(0x05060708)
      bb.put(0x50.toByte).put(0x18.toByte).putShort(0x0200.toShort)
      bb.putShort(0xCAFE.toShort).putShort(0.toShort)
    } else {
      bb.putShort(sport.toShort).putShort(dport.toShort)
      bb.putShort((8 + appPayload.length).toShort).putShort(0xCAFE.toShort)
    }
    bb.put(appPayload)
    bb.array()
  }

  def pcapOf(recs: (Double, Array[Byte])*): Array[Byte] =
    PcapFormat.write(recs.map { case (ts, f) => PcapRecord(ts, f) })
}
