package graft.pcap

/** One decoded+anonymized packet — the reference's per-packet dict
  * (/root/reference/BytesProcessor.py:241-250), as a case class so
  * Dataset[Packet] gets a compile-time schema and a codegen'd encoder.
  *
  * Column quirks preserved for output parity (SURVEY.md §1.2-1.3):
  * timestamp stays a float-epoch double, protocol is the stringified IP
  * protocol number ("6"/"17"), ports are int64, label defaults "benign".
  */
final case class Packet(
    timestamp: Double,
    src_ip: String,
    dst_ip: String,
    src_port: Long,
    dst_port: Long,
    protocol: String,
    payload: Array[Byte],
    label: String)

/** Ethernet → IPv4 → TCP/UDP decode over the raw frame bytes, with
  * in-place anonymization (/root/reference/BytesProcessor.py:211-268).
  *
  * Decode is TOTAL: every malformed/unsupported frame returns None,
  * mirroring the reference's filter cascade and its swallow-per-packet
  * try/except (:222-223, :238-239, :251-253). IPv6 is excluded (the
  * reference only checks dpkt.ip.IP), pcapng/VLAN-QinQ likewise; a single
  * 802.1Q tag is unwrapped because dpkt's Ethernet does so transparently.
  *
  * Anonymization (:258-268): the reference sets ip.src=ip.dst=0.0.0.0 and
  * sport=dport=0 then re-serializes via dpkt, which does NOT recompute
  * nonzero checksums — so the bytes keep checksums computed over the
  * PRE-anonymization values. We reproduce that exactly by zeroing fixed
  * offsets in the copied datagram (src 12-15, dst 16-19, ports ihl*4+0..3)
  * and touching nothing else. Metadata columns are read BEFORE zeroing
  * (:225-237 vs :248), so they keep the real addresses.
  */
object PacketDecoder {
  private val EthHeaderLen = 14
  private val EtherTypeIPv4 = 0x0800
  private val EtherTypeVlan = 0x8100
  private val ProtoTcp = 6
  private val ProtoUdp = 17

  @inline private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def dotted(b: Array[Byte], i: Int): String =
    s"${b(i) & 0xff}.${b(i + 1) & 0xff}.${b(i + 2) & 0xff}.${b(i + 3) & 0xff}"

  /** Decode one captured Ethernet frame; None = dropped (non-IP frame,
    * non-TCP/UDP datagram, or truncated structure = parse error).
    */
  def decode(ts: Double, frame: Array[Byte]): Option[Packet] = {
    if (frame.length < EthHeaderLen) return None
    var ipOff = EthHeaderLen
    var etherType = u16(frame, 12)
    if (etherType == EtherTypeVlan) { // one 802.1Q tag, like dpkt
      if (frame.length < 18) return None
      etherType = u16(frame, 16)
      ipOff = 18
    }
    if (etherType != EtherTypeIPv4) return None // non-IP frame: drop (:222-223)
    if (frame.length < ipOff + 20) return None  // truncated IP header
    val vihl = frame(ipOff) & 0xff
    if ((vihl >> 4) != 4) return None           // not IPv4 (IPv6 via 0x0800 impossible, defensive)
    val ihl = (vihl & 0xf) * 4
    if (ihl < 20 || frame.length < ipOff + ihl) return None
    val totalLen = u16(frame, ipOff + 2)
    // dpkt trims the datagram to the IP total-length field (Ethernet pads
    // short frames to 60 B; those pad bytes must NOT reach the payload).
    val avail = frame.length - ipOff
    val ipLen = math.min(totalLen, avail)
    if (ipLen < ihl) return None
    val proto = frame(ipOff + 9) & 0xff
    if (proto != ProtoTcp && proto != ProtoUdp) return None // drop (:238-239)
    // dpkt needs a full transport header to expose ports (TCP 20 B, UDP 8 B);
    // anything shorter raised NeedData and was swallowed (:251-253).
    val transportMin = if (proto == ProtoTcp) 20 else 8
    if (ipLen < ihl + transportMin) return None

    // metadata BEFORE anonymization
    val srcIp = dotted(frame, ipOff + 12)
    val dstIp = dotted(frame, ipOff + 16)
    val sport = u16(frame, ipOff + ihl).toLong
    val dport = u16(frame, ipOff + ihl + 2).toLong

    // payload = the (copied) IP datagram, then zero addresses+ports in place
    val payload = java.util.Arrays.copyOfRange(frame, ipOff, ipOff + ipLen)
    java.util.Arrays.fill(payload, 12, 20, 0.toByte)     // src+dst IPv4
    java.util.Arrays.fill(payload, ihl, ihl + 4, 0.toByte) // sport+dport
    Some(Packet(ts, srcIp, dstIp, sport, dport, proto.toString, payload, "benign"))
  }
}
