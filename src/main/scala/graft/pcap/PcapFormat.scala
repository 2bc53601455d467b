package graft.pcap

import java.nio.{ByteBuffer, ByteOrder}

/** One raw capture record: float epoch seconds + captured frame bytes.
  * Mirrors the (ts, buf) pairs dpkt's reader yields
  * (/root/reference/BytesProcessor.py:59-61).
  */
final case class PcapRecord(ts: Double, frame: Array[Byte])

/** Classic libpcap file framing (public format, observable in the
  * reference via its dpkt usage: /root/reference/BytesProcessor.py:56-62).
  *
  * Global header (24 B): magic, version, thiszone, sigfigs, snaplen,
  * network. Magic selects byte order and timestamp fraction unit:
  * 0xa1b2c3d4 micros, 0xa1b23c4d nanos (and their byte-swapped forms).
  * Each record: ts_sec, ts_frac, incl_len, orig_len (16 B) + incl_len
  * frame bytes.
  *
  * A truncated final record ends iteration quietly — the reference treats
  * EOFError as flush-and-finish, not failure
  * (/root/reference/BytesProcessor.py:96-104). pcapng — which the
  * reference punts on (/root/reference/README.md:72) — is an engine
  * extension handled by [[PcapngFormat]]; [[records]] dispatches on the
  * leading magic so callers never care which framing a capture uses.
  */
object PcapFormat {
  val MagicMicro = 0xa1b2c3d4
  val MagicMicroSwapped = 0xd4c3b2a1
  val MagicNano = 0xa1b23c4d
  val MagicNanoSwapped = 0x4d3cb2a1
  val GlobalHeaderLen = 24
  val RecordHeaderLen = 16

  final case class Header(order: ByteOrder, fracDivisor: Double, snaplen: Int)

  /** Parse the 24-byte global header; None for non-pcap bytes. */
  def header(buf: Array[Byte]): Option[Header] = {
    if (buf.length < GlobalHeaderLen) return None
    val magicBE = ByteBuffer.wrap(buf, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt
    val (order, div) = magicBE match {
      case MagicMicro        => (ByteOrder.BIG_ENDIAN, 1e6)
      case MagicMicroSwapped => (ByteOrder.LITTLE_ENDIAN, 1e6)
      case MagicNano         => (ByteOrder.BIG_ENDIAN, 1e9)
      case MagicNanoSwapped  => (ByteOrder.LITTLE_ENDIAN, 1e9)
      case _                 => return None
    }
    val bb = ByteBuffer.wrap(buf, 0, GlobalHeaderLen).order(order)
    val snaplen = bb.getInt(16)
    Some(Header(order, div, snaplen))
  }

  /** Lazily iterate records from an in-memory capture image — classic
    * pcap, or pcapng via [[PcapngFormat]] (magic-dispatched, so every
    * consumer of this entry point reads both). Stops (without throwing)
    * at EOF or a truncated trailing record. Unrecognized input yields no
    * records.
    */
  def records(buf: Array[Byte]): Iterator[PcapRecord] =
    if (PcapngFormat.isPcapng(buf)) PcapngFormat.records(buf)
    else classicRecords(buf)

  private def classicRecords(buf: Array[Byte]): Iterator[PcapRecord] = header(buf) match {
    case None => Iterator.empty
    case Some(h) =>
      new Iterator[PcapRecord] {
        private var off = GlobalHeaderLen
        private var nextRec: PcapRecord = _
        private var done = false

        private def advance(): Unit = {
          if (off + RecordHeaderLen > buf.length) { done = true; return }
          val bb = ByteBuffer.wrap(buf, off, RecordHeaderLen).order(h.order)
          val tsSec = bb.getInt & 0xffffffffL
          val tsFrac = bb.getInt & 0xffffffffL
          val inclLen = bb.getInt
          if (inclLen < 0 || off + RecordHeaderLen + inclLen > buf.length) {
            done = true; return // truncated capture: flush-and-finish
          }
          val frame = java.util.Arrays.copyOfRange(
            buf, off + RecordHeaderLen, off + RecordHeaderLen + inclLen)
          nextRec = PcapRecord(tsSec + tsFrac / h.fracDivisor, frame)
          off += RecordHeaderLen + inclLen
        }

        override def hasNext: Boolean = {
          if (!done && nextRec == null) advance()
          !done && nextRec != null
        }
        override def next(): PcapRecord = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextRec; nextRec = null; r
        }
      }
  }

  /** Serialize records back to classic pcap bytes (micro, big-endian).
    * Used by tests/fixtures; the engine itself only reads.
    */
  def write(records: Seq[PcapRecord], nanos: Boolean = false): Array[Byte] = {
    val body = records.map(r => RecordHeaderLen + r.frame.length).sum
    val bb = ByteBuffer.allocate(GlobalHeaderLen + body).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(if (nanos) MagicNano else MagicMicro)
    bb.putShort(2.toShort).putShort(4.toShort) // version 2.4
    bb.putInt(0).putInt(0).putInt(65535).putInt(1) // zone, sigfigs, snaplen, LINKTYPE_ETHERNET
    val div = if (nanos) 1e9 else 1e6
    records.foreach { r =>
      val sec = math.floor(r.ts).toLong
      val frac = math.rint((r.ts - sec) * div).toLong
      bb.putInt(sec.toInt).putInt(frac.toInt)
      bb.putInt(r.frame.length).putInt(r.frame.length)
      bb.put(r.frame)
    }
    bb.array()
  }
}
