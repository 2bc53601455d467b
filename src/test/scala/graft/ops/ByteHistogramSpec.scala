package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteHistogramSpec extends SparkSpec {

  test("histogram counts every byte value, sign-safely, across groups") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      ("a", Array[Byte](0, 0, 1, -1)),       // -1 = 0xFF
      ("a", Array[Byte](1)),
      ("b", Array.empty[Byte]))
    val hist = udaf(ByteHistogram)
    val out = rows.toDF("k", "payload")
      .groupBy("k").agg(hist(col("payload")).as("h"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a")(0) == 2L && out("a")(1) == 2L && out("a")(255) == 1L)
    assert(out("a").sum == 5L)
    assert(out("b").sum == 0L && out("b").length == 256)
  }

  test("pipe_flows query: flow stats + histogram consistency") {
    val df = graft.queries.PipelineQ.pipeFlows.run(spark, "unused")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // histogram total equals summed payload bytes for every flow
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bytes_hist") == r.getAs[Long]("sum_bytes"),
        s"histogram mass != byte count for flow $r")
    }
    // attacker flow present with its 1000 oversized packets
    val atk = rows.filter(_.getAs[String]("src_ip") == "172.16.0.66")
    assert(atk.length == 1 && atk.head.getAs[Long]("n_packets") == 1000L)
  }
}
