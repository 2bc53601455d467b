package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sink_zorder bit-interleave against a plain Scala reference:
  * z(d, p) must equal the canonical Morton encoding for all 12-bit
  * inputs sampled across the range, and be injective on distinct pairs
  * (a silent bit-order bug would destroy the two-dim locality the layout
  * exists for while still producing "working" output).
  */
class ZorderSpec extends SparkSpec {

  private def mortonRef(d: Long, p: Long): Long =
    (0 until 12).map { i =>
      (((d >> i) & 1L) << (2 * i + 1)) | (((p >> i) & 1L) << (2 * i))
    }.foldLeft(0L)(_ | _)

  test("column z-value matches the reference Morton encoding") {
    val spark2 = spark
    import spark2.implicits._
    val samples = for {
      d <- Seq(0L, 1L, 7L, 255L, 2047L, 4095L)
      p <- Seq(0L, 1L, 64L, 1000L, 4095L)
    } yield (d, p)
    val df = samples.toDF("d", "p")
    val z = (0 until 12).map { i =>
      val dBit = shiftleft(shiftright(col("d"), i).bitwiseAND(1L), 2 * i + 1)
      val pBit = shiftleft(shiftright(col("p"), i).bitwiseAND(1L), 2 * i)
      dBit.bitwiseOR(pBit)
    }.reduce(_.bitwiseOR(_))
    val got = df.withColumn("z", z).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    samples.foreach { case (d, p) =>
      assert(got((d, p)) == mortonRef(d, p), s"z($d,$p) mismatch")
    }
    assert(got.values.toSet.size == samples.size, "z-values not injective")
  }
}
