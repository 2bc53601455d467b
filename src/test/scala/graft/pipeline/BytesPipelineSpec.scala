package graft.pipeline

import graft.SparkSpec
import graft.ops.LabelRule
import graft.pcap.{Fixtures, PcapSource}
import java.nio.file.Files

/** End-to-end flagship test: synthesize a pcap on disk, run the full
  * pipeline, read back both parquet sinks, assert the reference contract
  * (schema, labels, anonymized bytes, normalization, adversarial subset).
  */
class BytesPipelineSpec extends SparkSpec {
  import Fixtures._

  private val width = 64 // small width keeps the widened schema readable

  // attacker 10.0.0.66 -> victim 10.0.0.2 inside [100,200); benign flows around it
  private val frames = Seq(
    (50.0, frame("10.0.0.1", "10.0.0.2", 1111, 80, 6)),   // outside ranges -> excluded
    (120.0, frame("10.0.0.1", "10.0.0.2", 1111, 80, 6)),  // in range, benign
    (130.0, frame("10.0.0.66", "10.0.0.2", 666, 80, 6, Array.fill[Byte](200)(0x7F))), // attack fwd
    (140.0, frame("10.0.0.2", "10.0.0.66", 80, 666, 6)),  // attack reverse (victim->attacker)
    (150.0, arpFrame),                                    // dropped by decode
    (260.0, frame("10.0.0.66", "10.0.0.9", 666, 81, 17)), // attacker, but outside rule window
  )

  private val cfg = BytesPipeline.Config(
    rules = Seq(LabelRule(100.0, 200.0, Seq("10.0.0.66"), Seq("10.0.0.2"), "dos")),
    rangesToExtract = Seq((100.0, 300.0)),
    width = width)

  private def runPipeline(): (String, Option[String]) = {
    val dir = Files.createTempDirectory("graft-pipe").toFile
    dir.deleteOnExit()
    val pcap = new java.io.File(dir, "cap.pcap")
    Files.write(pcap.toPath, pcapOf(frames: _*))
    BytesPipeline.run(spark, Seq(pcap.getAbsolutePath), s"$dir/out", cfg)
  }

  test("flagship dual-sink pipeline end-to-end") {
    val (dataPath, advPath) = runPipeline()
    val data = spark.read.parquet(dataPath).collect()

    // 4 decodable packets in range (arp dropped, ts=50 filtered)
    assert(data.length == 4)
    val cols = spark.read.parquet(dataPath).columns
    assert(cols.take(7).toSeq ==
      Seq("timestamp", "src_ip", "dst_ip", "src_port", "dst_port", "protocol", "label"))
    assert(cols.length == 7 + width && cols(7) == "byte(0)" && cols.last == s"byte(${width - 1})")

    val byTs = data.map(r => r.getDouble(0) -> r).toMap
    assert(byTs(120.0).getAs[String]("label") == "benign")
    assert(byTs(130.0).getAs[String]("label") == "dos") // forward direction
    assert(byTs(140.0).getAs[String]("label") == "dos") // bidirectional match
    assert(byTs(260.0).getAs[String]("label") == "benign") // outside rule ts-range

    // anonymization visible through the widened floats: src ip bytes (offsets
    // 12..15) are zero, yet the metadata keeps the true address
    assert(byTs(130.0).getAs[String]("src_ip") == "10.0.0.66")
    (12 to 15).foreach(i => assert(byTs(130.0).getAs[Float](s"byte($i)") == 0.0f))
    // normalization: app payload of 0x7F at byte(40) -> 127/255
    assert(math.abs(byTs(130.0).getAs[Float]("byte(40)") - 127f / 255f) < 1e-7)
    // truncation: the 200-byte app payload overflows width=64 -> no column to see it,
    // padding: benign 60-byte datagram zero-pads the tail
    assert(byTs(120.0).getAs[Float](s"byte(${width - 1})") == 0.0f)

    // adversarial sink = forward rows only (src in attackers & ts in rule range)
    val adv = spark.read.parquet(advPath.get).collect()
    assert(adv.map(_.getDouble(0)).toSeq == Seq(130.0))
  }

  test("no adversarial sink when no rule fires") {
    val dir = Files.createTempDirectory("graft-pipe2").toFile
    dir.deleteOnExit()
    val pcap = new java.io.File(dir, "cap.pcap")
    Files.write(pcap.toPath, pcapOf((120.0, frame("10.0.0.1", "10.0.0.2", 1, 2, 6))))
    val quiet = cfg.copy(rules = Seq(LabelRule(100.0, 200.0, Seq("99.9.9.9"), Nil, "x")))
    val (_, advPath) = BytesPipeline.run(spark, Seq(pcap.getAbsolutePath), s"$dir/out", quiet)
    assert(advPath.isEmpty)
  }

  test("splittable source matches whole-file read on a multi-record capture") {
    val rnd = new scala.util.Random(7)
    val many = (0 until 500).map { i =>
      val app = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(app)
      (1000.0 + i, frame(s"10.0.${i % 5}.1", "10.0.9.9", 1000 + i, 80, if (i % 3 == 0) 17 else 6, app))
    }
    val dir = Files.createTempDirectory("graft-split").toFile
    dir.deleteOnExit()
    val pcap = new java.io.File(dir, "big.pcap")
    Files.write(pcap.toPath, pcapOf(many: _*))

    val whole = PcapSource.packets(spark, Seq(pcap.getAbsolutePath))
      .collect().map(p => (p.timestamp, p.src_port, p.payload.toSeq)).sortBy(_._1)
    val split = PcapSource.packetsSplittable(spark, Seq(pcap.getAbsolutePath), targetSplitBytes = 4096)
      .collect().map(p => (p.timestamp, p.src_port, p.payload.toSeq)).sortBy(_._1)
    assert(split.length == whole.length)
    assert(split.sameElements(whole))
  }
}
