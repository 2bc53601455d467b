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

  def pcapOf(recs: (Double, Array[Byte])*): Array[Byte] =
    PcapFormat.write(recs.map { case (ts, f) => PcapRecord(ts, f) })
}
