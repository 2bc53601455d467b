package graft.pipeline

import graft.SparkSpec
import graft.pcap.{PcapFormat, PcapRecord, PcapSource}
import graft.queries.PipelineQ.mkFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The CICIDS2017 Thursday preset must reproduce the reference
  * `__main__`'s labeling on packets placed inside its attack windows
  * (`/root/reference/BytesProcessor.py:357-420` semantics).
  */
class PresetsSpec extends SparkSpec {

  test("preset labels attack-window packets and drops out-of-range ones") {
    val recs = Seq(
      // inside Bruteforce window, attacker->victim => Bruteforce, forward
      PcapRecord(1499343700.0, mkFrame("172.16.0.1", "192.168.10.50", 4444, 80, 6, 40, 0x41.toByte)),
      // same window, victim->attacker (bidirectional match) => Bruteforce, NOT forward
      PcapRecord(1499343701.0, mkFrame("192.168.10.50", "172.16.0.1", 80, 4444, 6, 40, 0x42.toByte)),
      // same window, unrelated hosts => benign (in-range keeps it)
      PcapRecord(1499343702.0, mkFrame("192.168.10.9", "10.0.0.2", 1234, 53, 17, 40, 0x43.toByte)),
      // outside every extraction range => dropped entirely
      PcapRecord(1499340000.0, mkFrame("172.16.0.1", "192.168.10.50", 4444, 80, 6, 40, 0x44.toByte)),
      // inside the last Infiltration window, attacker 192.168.10.8 => Infiltration
      PcapRecord(1499364300.0, mkFrame("192.168.10.8", "192.168.10.8", 1, 2, 6, 40, 0x45.toByte)))
    val path = Paths.get(sys.props("java.io.tmpdir"), "graft_presets_spec.pcap")
    Files.write(path, PcapFormat.write(recs))

    val cfg = Presets.cicids2017Thursday.copy(widen = false)
    val out = BytesPipeline.features(
      PcapSource.packets(spark, Seq(path.toString)), cfg)
      .select(col("timestamp"), col("label")).collect()
      .map(r => (r.getDouble(0), r.getString(1))).toMap

    assert(out.size == 4, s"expected 4 in-range packets, got ${out.keySet}")
    assert(out(1499343700.0) == "Bruteforce")
    assert(out(1499343701.0) == "Bruteforce")
    assert(out(1499343702.0) == "benign")
    assert(out(1499364300.0) == "Infiltration")
    assert(!out.contains(1499340000.0), "out-of-range packet not dropped")

    // forward mask: only attacker-sourced rows
    val fwd = BytesPipeline.features(
      PcapSource.packets(spark, Seq(path.toString)), cfg)
      .filter(BytesPipeline.forwardMask(cfg.rules))
      .select(col("timestamp")).collect().map(_.getDouble(0)).toSet
    assert(fwd.contains(1499343700.0) && !fwd.contains(1499343701.0),
      "forward mask must select attacker-sourced packets only")
  }
}
