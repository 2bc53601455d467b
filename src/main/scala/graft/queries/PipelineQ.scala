package graft.queries

import graft._
import graft.ops.LabelRule
import graft.pcap.{PcapFormat, PcapRecord, PcapSource}
import graft.pipeline.BytesPipeline
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

/** The flagship pcap pipeline as a bench/verify entry (no SQL oracle —
  * binary input; correctness is pinned by the golden-fixture and
  * end-to-end specs instead, SURVEY.md §2.3). The query synthesizes a
  * deterministic capture once (seeded, content-addressed path), then runs
  * decode -> anonymize -> range filter -> label -> vectorize at the real
  * 1525-byte width. Wall-clock here IS the reference workload's
  * throughput shape: one narrow stage, no shuffle.
  */
object PipelineQ {

  private val NumPackets = 20000
  private val Attacker = "172.16.0.66"
  private val Victim = "192.168.10.50"

  def mkFrame(srcIp: String, dstIp: String, sport: Int, dport: Int,
                      proto: Int, appLen: Int, fill: Byte): Array[Byte] = {
    val transportLen = if (proto == 6) 20 else 8
    val totalLen = 20 + transportLen + appLen
    val bb = ByteBuffer.allocate(14 + totalLen)
    bb.put(Array.tabulate[Byte](12)(i => (0x10 + i).toByte)); bb.putShort(0x0800.toShort)
    bb.put(0x45.toByte).put(0.toByte).putShort(totalLen.toShort)
    bb.putShort(0x1234.toShort).putShort(0x4000.toShort)
    bb.put(64.toByte).put(proto.toByte).putShort(0xBEEF.toShort)
    bb.put(srcIp.split('.').map(_.toInt.toByte)).put(dstIp.split('.').map(_.toInt.toByte))
    bb.putShort(sport.toShort).putShort(dport.toShort)
    if (proto == 6) {
      bb.putInt(1).putInt(2)
      bb.put(0x50.toByte).put(0x18.toByte).putShort(512.toShort)
      bb.putShort(0xCAFE.toShort).putShort(0.toShort)
    } else bb.putShort((8 + appLen).toShort).putShort(0xCAFE.toShort)
    bb.put(Array.fill[Byte](appLen)(fill))
    bb.array()
  }

  /** Deterministic capture, written once per JVM tmpdir (seeded rng). */
  def pcapPath(): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft_flagship_$NumPackets.pcap")
    if (!Files.exists(p)) {
      val rnd = new scala.util.Random(20240101)
      val recs = (0 until NumPackets).map { i =>
        val ts = 1499350000.0 + i * 0.01
        val f =
          if (i % 20 == 0) mkFrame(Attacker, Victim, 666, 80, 6, 1800, 0x41.toByte)
          else mkFrame(s"192.168.10.${i % 9 + 1}", s"10.0.0.${i % 7 + 1}",
            1024 + (i % 5000), if (i % 3 == 0) 443 else 53,
            if (i % 3 == 0) 6 else 17, rnd.nextInt(600), 0x2A.toByte)
        PcapRecord(ts, f)
      }
      Files.write(p, PcapFormat.write(recs))
    }
    p.toString
  }

  val cfg: BytesPipeline.Config = BytesPipeline.Config(
    rules = Seq(LabelRule(1499350000.0, 1499350600.0, Seq(Attacker), Seq(Victim), "dos")),
    rangesToExtract = Seq((1499350000.0, 1499350150.0), (1499350160.0, 1499350999.0)))

  /** Full compute core at width 1525; projected to compact per-packet
    * stats so verify's parquet dump stays small while every stage
    * (decode, anonymize, filter, label, vectorize) still executes. */
  val pipeFlagship: Q = Q(
    "pipe_flagship",
    (spark, _) => {
      import org.apache.spark.sql.functions._
      val feats = BytesPipeline.features(
        PcapSource.packets(spark, Seq(pcapPath())), cfg)
      feats.select(
        col("timestamp"), col("src_ip"), col("dst_ip"),
        col("src_port"), col("dst_port"), col("protocol"), col("label"),
        aggregate(col("features"), lit(0.0d), (acc, x) => acc + x.cast("double")).as("feat_sum"),
        element_at(col("features"), 13).as("byte12"))
        .orderBy("timestamp")
    },
    oracle = None)

  /** Classic NIDS flow aggregation over the decoded capture: group by
    * the 5-tuple, per-flow packet/byte/duration stats plus a per-flow
    * byte-value-entropy proxy via the ByteHistogram UDAF. One shuffle on
    * the flow key — at 100 TB flows are the natural partitioning unit.
    * No SQL oracle (binary input); pinned by unit/spec + rows-only.
    */
  val pipeFlows: Q = Q(
    "pipe_flows",
    (spark, _) => {
      import org.apache.spark.sql.functions._
      val spark2 = spark; import spark2.implicits._
      val pk = PcapSource.packets(spark, Seq(pcapPath()))
      val hist = udaf(graft.ops.ByteHistogram)
      pk.toDF()
        .groupBy(col("src_ip"), col("dst_ip"), col("src_port"), col("dst_port"), col("protocol"))
        .agg(
          count(lit(1)).as("n_packets"),
          sum(length(col("payload"))).as("sum_bytes"),
          min(col("timestamp")).as("ts_first"),
          max(col("timestamp")).as("ts_last"),
          hist(col("payload")).as("byte_hist"))
        .select(
          col("src_ip"), col("dst_ip"), col("src_port"), col("dst_port"), col("protocol"),
          col("n_packets"), col("sum_bytes"),
          round((col("ts_last") - col("ts_first")) * 1000).cast("long").as("duration_ms"),
          element_at(col("byte_hist"), 1).as("n_zero_bytes"), // histogram[0]
          aggregate(col("byte_hist"), lit(0L), (a, x) => a + x).as("total_bytes_hist"))
        .orderBy("src_ip", "src_port", "dst_ip", "dst_port", "protocol")
    },
    oracle = None)

  val all: Seq[Q] = Seq(pipeFlagship, pipeFlows)
}
