package graft.pcap

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** pcapng (next-generation capture) framing — the format modern
  * `tcpdump`/Wireshark write by default. The reference punts on it
  * ("dpkt does not support pcapng", /root/reference/README.md:72); this
  * is an engine extension so a user's un-converted captures ingest
  * directly. Public block layout (IETF draft-tuexen-opsawg-pcapng):
  *
  * Every block: type (4 B), total length (4 B), body, total length again
  * (4 B trailer); total length includes the 12 framing bytes and is
  * padded to a 4-byte multiple. Blocks handled:
  *  - Section Header (0x0A0D0D0A): byte-order magic 0x1A2B3C4D selects
  *    endianness for the section; a new SHB resets the interface table.
  *  - Interface Description (1): link type, snaplen, options — option 9
  *    (`if_tsresol`) sets the timestamp divisor: value v with MSB clear
  *    means 10^v units/second, MSB set means 2^v; absent means 10^6.
  *    Option 14 (`if_tsoffset`, 64-bit signed seconds) makes packet
  *    timestamps RELATIVE: absolute time = offset + raw/divisor; absent
  *    (or zero) means raw timestamps are already absolute.
  *  - Enhanced Packet (6): interface id, 64-bit timestamp in that
  *    interface's resolution (high word first), captured/original
  *    length, frame bytes.
  *  - Simple Packet (3): original length + frame, NO timestamp (emitted
  *    with ts=0.0) — present for completeness.
  *  - Anything else (name resolution, statistics, custom): skipped by
  *    total length, as the spec requires for unknown types.
  *
  * A truncated trailing block ends iteration quietly, matching the
  * classic reader's flush-and-finish EOF contract
  * (/root/reference/BytesProcessor.py:96-104).
  */
object PcapngFormat {
  val ShbType = 0x0a0d0d0a
  val ByteOrderMagic = 0x1a2b3c4d
  val IdbType = 1
  val SpbType = 3
  val EpbType = 6
  /** block framing: type + 2× total length */
  val FramingLen = 12

  /** The SHB type field reads the same under either byte order, so this
    * is order-independent. */
  def isPcapng(buf: Array[Byte]): Boolean =
    buf.length >= 4 &&
      ByteBuffer.wrap(buf, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt == ShbType

  /** One interface's timestamp interpretation: `absolute = offsetSeconds
    * + raw / divisor` (divisor in units/second). */
  final case class IfaceTs(divisor: Double, offsetSeconds: Long) {
    def toSeconds(raw: Long): Double = offsetSeconds + raw / divisor
  }
  val DefaultIfaceTs: IfaceTs = IfaceTs(1e6, 0L)

  /** Walk an IDB's options for if_tsresol (9) and if_tsoffset (14). */
  private def ifaceTsOpts(buf: Array[Byte], order: ByteOrder,
                          optStart: Int, optEnd: Int): IfaceTs = {
    val bb = ByteBuffer.wrap(buf).order(order)
    var div = 1e6
    var off = 0L
    var o = optStart
    var stop = false
    while (!stop && o + 4 <= optEnd) {
      val code = bb.getShort(o) & 0xffff
      val len = bb.getShort(o + 2) & 0xffff
      if (code == 0) stop = true // opt_endofopt
      else {
        if (code == 9 && len >= 1 && o + 4 < optEnd) {
          val v = buf(o + 4) & 0xff
          div = if ((v & 0x80) == 0) math.pow(10, v) else math.pow(2, v & 0x7f)
        }
        if (code == 14 && len >= 8 && o + 12 <= optEnd)
          off = bb.getLong(o + 4)
        o += 4 + ((len + 3) & ~3)
      }
    }
    IfaceTs(div, off)
  }

  /** Lazily iterate packet records from an in-memory pcapng image.
    * Handles multiple sections (each with its own byte order and
    * interface table). Non-pcapng input yields no records; a truncated
    * tail stops quietly.
    */
  def records(buf: Array[Byte]): Iterator[PcapRecord] = {
    if (!isPcapng(buf)) return Iterator.empty
    new Iterator[PcapRecord] {
      private var off = 0
      private var order: ByteOrder = ByteOrder.BIG_ENDIAN
      private val ifaces = ArrayBuffer.empty[IfaceTs]
      private var nextRec: PcapRecord = _
      private var done = false

      private def u32(o: Int): Long =
        ByteBuffer.wrap(buf, o, 4).order(order).getInt & 0xffffffffL

      private def advance(): Unit = {
        while (!done && nextRec == null) {
          if (off + FramingLen > buf.length) { done = true; return }
          // SHB first: its type is order-palindromic and it RESETS order
          val beType = ByteBuffer.wrap(buf, off, 4).order(ByteOrder.BIG_ENDIAN).getInt
          if (beType == ShbType) {
            if (off + 12 > buf.length) { done = true; return }
            val magicBE = ByteBuffer.wrap(buf, off + 8, 4).order(ByteOrder.BIG_ENDIAN).getInt
            order =
              if (magicBE == ByteOrderMagic) ByteOrder.BIG_ENDIAN
              else if (Integer.reverseBytes(magicBE) == ByteOrderMagic) ByteOrder.LITTLE_ENDIAN
              else { done = true; return } // corrupt section header
            ifaces.clear() // new section, new interface table
          }
          val totalLen = u32(off + 4)
          if (totalLen < FramingLen || totalLen % 4 != 0 ||
              off + totalLen > buf.length) { done = true; return } // truncated
          val blockType = u32(off).toInt
          val bodyStart = off + 8
          val bodyEnd = off + totalLen.toInt - 4
          blockType match {
            case IdbType if bodyEnd - bodyStart >= 8 =>
              ifaces += ifaceTsOpts(buf, order, bodyStart + 8, bodyEnd)
            case EpbType if bodyEnd - bodyStart >= 20 =>
              val bb = ByteBuffer.wrap(buf).order(order)
              val ifc = bb.getInt(bodyStart)
              val ts64 = (bb.getInt(bodyStart + 4).toLong << 32) |
                (bb.getInt(bodyStart + 8) & 0xffffffffL)
              val capLen = bb.getInt(bodyStart + 12)
              if (capLen >= 0 && bodyStart + 20 + capLen <= bodyEnd) {
                val ts =
                  if (ifc >= 0 && ifc < ifaces.length) ifaces(ifc) else DefaultIfaceTs
                nextRec = PcapRecord(ts.toSeconds(ts64),
                  java.util.Arrays.copyOfRange(buf, bodyStart + 20, bodyStart + 20 + capLen))
              }
            case SpbType if bodyEnd - bodyStart >= 4 =>
              val orig = ByteBuffer.wrap(buf).order(order).getInt(bodyStart)
              val cap = math.min(math.max(orig, 0), bodyEnd - bodyStart - 4)
              nextRec = PcapRecord(0.0,
                java.util.Arrays.copyOfRange(buf, bodyStart + 4, bodyStart + 4 + cap))
            case _ => // SHB handled above; unknown types skipped by length
          }
          off += totalLen.toInt
        }
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

  /** Section metadata for split planning: byte order plus the interface
    * timestamp table — (divisor, tsoffset) per IDB — collected from the
    * file's LEADING blocks (one pass over the first `headBytes`).
    * tcpdump/Wireshark declare every interface before the first packet
    * block, which is the layout the splittable path supports; IDBs
    * appearing later in the file are handled only by the whole-file
    * reader. */
  final case class SectionMeta(bigEndian: Boolean, ifaces: Seq[IfaceTs]) {
    def divisors: Seq[Double] = ifaces.map(_.divisor)
  }

  def headMeta(head: Array[Byte]): Option[SectionMeta] = {
    if (!isPcapng(head) || head.length < 12) return None
    val magicBE = ByteBuffer.wrap(head, 8, 4).order(ByteOrder.BIG_ENDIAN).getInt
    val order =
      if (magicBE == ByteOrderMagic) ByteOrder.BIG_ENDIAN
      else if (Integer.reverseBytes(magicBE) == ByteOrderMagic) ByteOrder.LITTLE_ENDIAN
      else return None
    val ifaces = ArrayBuffer.empty[IfaceTs]
    var off = 0
    val bb = ByteBuffer.wrap(head).order(order)
    while (off + FramingLen <= head.length) {
      val totalLen = bb.getInt(off + 4) & 0xffffffffL
      if (totalLen < FramingLen || totalLen % 4 != 0 ||
          off + totalLen > head.length) {
        return Some(SectionMeta(order == ByteOrder.BIG_ENDIAN, ifaces.toSeq))
      }
      val t = bb.getInt(off)
      if (t == IdbType && totalLen >= FramingLen + 8)
        ifaces += ifaceTsOpts(head, order, off + 16, off + totalLen.toInt - 4)
      off += totalLen.toInt
    }
    Some(SectionMeta(order == ByteOrder.BIG_ENDIAN, ifaces.toSeq))
  }

  /** Serialize records to pcapng bytes — fixtures/tests only, the engine
    * just reads. One SHB, one IDB per divisor (with `if_tsresol` when not
    * the 10^-6 default; powers of two use the MSB form; `if_tsoffset`
    * when a nonzero per-interface offset is given — EPB raw timestamps
    * are then written RELATIVE to it, as the spec requires), then one
    * EPB per record via `ifcFor(index)`.
    */
  def write(records: Seq[PcapRecord], divisors: Seq[Double] = Seq(1e6),
            ifcFor: Int => Int = _ => 0, littleEndian: Boolean = false,
            snaplen: Int = 65535, tsOffsets: Seq[Long] = Nil): Array[Byte] = {
    val order = if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    def offsetOf(ifc: Int): Long = if (ifc < tsOffsets.length) tsOffsets(ifc) else 0L
    val out = new java.io.ByteArrayOutputStream()
    def block(blockType: Int, body: ByteBuffer): Unit = {
      val b = body.array().take(body.position())
      val pad = (4 - b.length % 4) % 4
      val total = FramingLen + b.length + pad
      val bb = ByteBuffer.allocate(total).order(order)
      bb.putInt(blockType).putInt(total).put(b).put(new Array[Byte](pad)).putInt(total)
      out.write(bb.array())
    }
    // SHB: magic, version 1.0, section length -1 (unknown)
    val shb = ByteBuffer.allocate(16).order(order)
    shb.putInt(ByteOrderMagic).putShort(1).putShort(0).putLong(-1L)
    block(ShbType, shb)
    divisors.zipWithIndex.foreach { case (d, ifc) =>
      val idb = ByteBuffer.allocate(48).order(order)
      idb.putShort(1).putShort(0).putInt(snaplen) // LINKTYPE_ETHERNET
      val off = offsetOf(ifc)
      if (d != 1e6) {
        val log10 = math.round(math.log10(d)).toInt
        val v: Int =
          if (math.pow(10, log10) == d) log10
          else 0x80 | java.lang.Long.numberOfTrailingZeros(d.toLong)
        idb.putShort(9).putShort(1).put(v.toByte).put(new Array[Byte](3))
      }
      if (off != 0L)
        idb.putShort(14).putShort(8).putLong(off)
      if (d != 1e6 || off != 0L)
        idb.putShort(0).putShort(0) // opt_endofopt
      block(IdbType, idb)
    }
    records.zipWithIndex.foreach { case (r, i) =>
      val ifc = ifcFor(i)
      val div = divisors(ifc)
      val ts64 = math.rint((r.ts - offsetOf(ifc)) * div).toLong
      val epb = ByteBuffer.allocate(20 + r.frame.length).order(order)
      epb.putInt(ifc).putInt((ts64 >>> 32).toInt).putInt(ts64.toInt)
      epb.putInt(r.frame.length).putInt(r.frame.length).put(r.frame)
      block(EpbType, epb)
    }
    out.toByteArray
  }
}
