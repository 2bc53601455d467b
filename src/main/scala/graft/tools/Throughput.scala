package graft.tools

import graft.pcap.{PcapFormat, PcapRecord, PcapSource}
import graft.pipeline.BytesPipeline
import graft.ops.LabelRule
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

/** One-off flagship throughput measurement (mirrors BASELINE.md row):
  * synthesizes a ~620 MB capture incrementally, runs the full feature
  * pipeline (decode -> anonymize -> range filter -> label -> 1525-float
  * vectorize), reports packets/s and MB/s.
  * Run: `sbt "runMain graft.tools.Throughput"`.
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val n = 2000000
    val path = Paths.get("/tmp/graft_throughput.pcap")
    if (!Files.exists(path)) {
      val rnd = new scala.util.Random(7)
      val out = new BufferedOutputStream(new FileOutputStream(path.toFile), 1 << 20)
      // global header via a tiny write() call, then records incrementally
      out.write(PcapFormat.write(Seq.empty))
      var i = 0
      while (i < n) {
        val appLen = rnd.nextInt(560)
        val frame = graft.queries.PipelineQ.mkFrame(
          s"192.168.10.${i % 9 + 1}", s"10.0.0.${i % 7 + 1}",
          1024 + (i % 5000), if (i % 3 == 0) 443 else 53,
          if (i % 3 == 0) 6 else 17, appLen, 0x2A.toByte)
        val rec = PcapFormat.write(Seq(PcapRecord(1499350000.0 + i * 0.001, frame)))
        out.write(rec, 24, rec.length - 24) // strip repeated global header
        i += 1
      }
      out.close()
    }
    val bytes = Files.size(path)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = BytesPipeline.Config(
      rules = Seq(LabelRule(1499350000.0, 1499352000.0, Seq("192.168.10.1"), Seq("10.0.0.1"), "dos")),
      rangesToExtract = Seq((1499350000.0, 1499360000.0)))
    // warm: class load + codegen on a tiny slice
    BytesPipeline.features(PcapSource.packets(spark, Seq(graft.queries.PipelineQ.pcapPath())), cfg).count()
    val t0 = System.nanoTime()
    val cnt = BytesPipeline.features(
      PcapSource.packetsSplittable(spark, Seq(path.toString), targetSplitBytes = 64L << 20), cfg).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"THROUGHPUT rows=$cnt bytes=$bytes sec=$sec%.2f pkt_s=${cnt / sec}%.0f mb_s=${bytes / 1e6 / sec}%.1f")
    spark.stop()
  }
}
