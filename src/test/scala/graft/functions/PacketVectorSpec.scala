package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom Catalyst expression, through both eval paths: interpreted
  * (collect on a tiny local relation hits eval) and whole-stage codegen
  * (projection over a real scan hits doGenCode).
  */
class PacketVectorSpec extends SparkSpec {

  test("pad/truncate/normalize with sign fix, both codegen and interpreted") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array[Byte](0, 127, -1)),          // -1 = 0xFF must become 1.0f, NOT negative
      (2L, Array.tabulate[Byte](10)(_.toByte)), // truncated to width 4
      (3L, Array.empty[Byte]))
    val df = rows.toDF("id", "payload")

    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val out = df.select($"id", packet_vector($"payload", 4).as("v"))
          .orderBy("id").as[(Long, Seq[Float])].collect()
        assert(out(0)._2 == Seq(0.0f, 127f / 255f, 1.0f, 0.0f)) // pad tail
        assert(out(1)._2 == Seq(0.0f, 1f / 255f, 2f / 255f, 3f / 255f)) // truncate
        assert(out(2)._2 == Seq(0.0f, 0.0f, 0.0f, 0.0f)) // all pad
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null binary yields null array") {
    import spark.implicits._
    val df = Seq((1L, Some(Array[Byte](1))), (2L, None))
      .toDF("id", "payload")
    val out = df.select(packet_vector(col("payload"), 2)).orderBy("id").collect()
    assert(out(0).getSeq[Float](0) == Seq(1f / 255f, 0.0f))
    assert(out(1).isNullAt(0))
  }
}
