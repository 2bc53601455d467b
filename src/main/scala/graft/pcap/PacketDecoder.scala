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
  * try/except (:222-223, :238-239, :251-253). The DEFAULT path excludes
  * IPv6 (the reference only checks dpkt.ip.IP) — reference parity; the
  * opt-in `ipv6 = true` overload adds EtherType 0x86DD as an engine
  * extension: fixed 40-B header, next-header walk over hop-by-hop /
  * routing / destination-options / first-fragment extension headers to
  * TCP/UDP, anonymization zeroing the 32 v6 address bytes. VLAN-QinQ
  * stays excluded; a single 802.1Q tag is unwrapped because dpkt's
  * Ethernet does so transparently.
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
  private val EtherTypeIPv6 = 0x86dd
  private val EtherTypeVlan = 0x8100
  private val ProtoTcp = 6
  private val ProtoUdp = 17
  // IPv6 extension headers the walk skips (RFC 8200): hop-by-hop,
  // routing, fragment, destination options.
  private val ExtHopByHop = 0
  private val ExtRouting = 43
  private val ExtFragment = 44
  private val ExtDestOpts = 60

  @inline private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def dotted(b: Array[Byte], i: Int): String =
    s"${b(i) & 0xff}.${b(i + 1) & 0xff}.${b(i + 2) & 0xff}.${b(i + 3) & 0xff}"

  /** Decode one captured Ethernet frame; None = dropped (non-IP frame,
    * non-TCP/UDP datagram, or truncated structure = parse error).
    * Reference-parity preset: IPv4 only.
    */
  def decode(ts: Double, frame: Array[Byte]): Option[Packet] =
    decode(ts, frame, ipv6 = false)

  /** Decode with optional IPv6 support (engine extension — the
    * reference's dpkt path is v4-only, BytesProcessor.py:222). */
  def decode(ts: Double, frame: Array[Byte], ipv6: Boolean): Option[Packet] = {
    if (frame.length < EthHeaderLen) return None
    var ipOff = EthHeaderLen
    var etherType = u16(frame, 12)
    if (etherType == EtherTypeVlan) { // one 802.1Q tag, like dpkt
      if (frame.length < 18) return None
      etherType = u16(frame, 16)
      ipOff = 18
    }
    if (ipv6 && etherType == EtherTypeIPv6) return decodeV6(ts, frame, ipOff)
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

  /** Uncompressed textual v6 address (deterministic; no DNS — the bytes
    * come straight from the header). */
  private def v6str(b: Array[Byte], i: Int): String =
    java.net.InetAddress.getByAddress(
      java.util.Arrays.copyOfRange(b, i, i + 16)).getHostAddress

  /** IPv6 datagram decode (engine extension): fixed 40-B header, trim to
    * 40 + payload-length (Ethernet pad exclusion, same discipline as the
    * v4 total-length trim), next-header walk to TCP/UDP. Anonymization
    * zeroes the 32 address bytes (offsets 8-39) and the 4 port bytes at
    * the transport offset; checksums stay stale, hop limit / flow label
    * untouched — the byte-level twin of the v4 contract. Non-first
    * fragments carry no transport header and drop, matching the v4
    * cascade's NeedData swallow.
    */
  private def decodeV6(ts: Double, frame: Array[Byte], ipOff: Int): Option[Packet] = {
    if (frame.length < ipOff + 40) return None
    if (((frame(ipOff) & 0xff) >> 4) != 6) return None
    val payloadLen = u16(frame, ipOff + 4)
    val avail = frame.length - ipOff
    val ipLen = math.min(40 + payloadLen, avail)
    if (ipLen < 40) return None

    // next-header walk; the guard bounds pathological ext chains
    var nh = frame(ipOff + 6) & 0xff
    var off = 40
    var guard = 0
    while (guard < 8 &&
           (nh == ExtHopByHop || nh == ExtRouting || nh == ExtFragment || nh == ExtDestOpts)) {
      if (ipLen < off + 8) return None // truncated extension header
      if (nh == ExtFragment) { // fixed 8 B; only the first fragment has transport
        val fragOffset = u16(frame, ipOff + off + 2) & 0xfff8
        if (fragOffset != 0) return None
        nh = frame(ipOff + off) & 0xff
        off += 8
      } else {
        val next = frame(ipOff + off) & 0xff
        val extLen = ((frame(ipOff + off + 1) & 0xff) + 1) * 8
        if (ipLen < off + extLen) return None
        nh = next
        off += extLen
      }
      guard += 1
    }
    if (nh != ProtoTcp && nh != ProtoUdp) return None
    val transportMin = if (nh == ProtoTcp) 20 else 8
    if (ipLen < off + transportMin) return None

    // metadata BEFORE anonymization, same ordering contract as v4
    val srcIp = v6str(frame, ipOff + 8)
    val dstIp = v6str(frame, ipOff + 24)
    val sport = u16(frame, ipOff + off).toLong
    val dport = u16(frame, ipOff + off + 2).toLong

    val payload = java.util.Arrays.copyOfRange(frame, ipOff, ipOff + ipLen)
    java.util.Arrays.fill(payload, 8, 40, 0.toByte)        // src+dst IPv6
    java.util.Arrays.fill(payload, off, off + 4, 0.toByte) // sport+dport
    Some(Packet(ts, srcIp, dstIp, sport, dport, nh.toString, payload, "benign"))
  }
}
