package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-style test: the reversed-when fold must equal a sequential
  * overwrite model — the reference assigns labels rule-by-rule, later
  * rules overwriting earlier (/root/reference/BytesProcessor.py:326-327).
  * Seeded random generation (no scalatestplus bridge in the offline
  * cache), 20 independent rule-set/row-set trials.
  */
class RuleLabelerSpec extends SparkSpec {

  private case class R(ts: Double, src: Long, dst: Long)

  /** Direct reimplementation of the reference's sequential overwrite. */
  private def model(r: R, rules: Seq[LabelRule]): String = {
    var label = "benign"
    rules.foreach { rule =>
      val tsOk = r.ts >= rule.tsLo.asInstanceOf[Double] && r.ts <= rule.tsHi.asInstanceOf[Double]
      val idOk = (rule.attackers.nonEmpty, rule.victims.nonEmpty) match {
        case (true, true) =>
          (rule.attackers.contains(r.src) && rule.victims.contains(r.dst)) ||
            (rule.attackers.contains(r.dst) && rule.victims.contains(r.src))
        case (true, false) => rule.attackers.contains(r.src)
        case (false, true) => rule.victims.contains(r.dst)
        case _             => false
      }
      if (tsOk && idOk) label = rule.label
    }
    label
  }

  test("labelCol == sequential-overwrite model (last match wins)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20240612)
    def ids(): Seq[Any] = Seq.fill(rnd.nextInt(4))(rnd.nextLong(10)).distinct
    (0 until 20).foreach { trial =>
      val rules = Seq.fill(1 + rnd.nextInt(4)) {
        val lo = rnd.nextInt(80).toDouble
        LabelRule(lo, lo + 1 + rnd.nextInt(40),
          ids(), ids(), Seq("scan", "dos", "exfil", "probe")(rnd.nextInt(4)))
      }
      val rows = Seq.fill(40)(R(rnd.nextInt(120).toDouble, rnd.nextLong(10), rnd.nextLong(10)))
      val df = rows.map(r => (r.ts, r.src, r.dst)).toDF("ts", "src", "dst")
      val got = df.select(
          RuleLabeler.labelCol(col("ts"), col("src"), col("dst"), rules).as("l"))
        .as[String].collect().toSeq
      val want = rows.map(model(_, rules))
      assert(got == want, s"trial $trial rules=$rules")
    }
  }

  test("forward mask: attacker-less rules contribute false (reference KeyError fixed)") {
    import spark.implicits._
    val rules = Seq(
      LabelRule(0.0, 10.0, Nil, Seq(5L), "victim_only"),
      LabelRule(5.0, 20.0, Seq(1L), Nil, "fwd"))
    val df = Seq((1.0, 1L), (7.0, 1L), (7.0, 2L), (25.0, 1L)).toDF("ts", "src")
    val got = df.filter(RuleLabeler.forwardMask(col("ts"), col("src"), rules))
      .as[(Double, Long)].collect().toSet
    assert(got == Set((7.0, 1L))) // only ts in [5,20] with src=1
  }

  test("empty range list filters everything (reference raised TypeError)") {
    import spark.implicits._
    val df = Seq(1.0, 2.0).toDF("ts")
    assert(df.filter(RangeFilter.inRanges(col("ts"), Nil)).count() == 0)
  }

  test("range filter == union of per-range filters") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vals = Seq.fill(200)(rnd.nextInt(1000).toDouble)
    val ranges = Seq((100.0, 250.0), (240.0, 400.0), (900.0, 950.0))
    val df = vals.toDF("ts")
    val got = df.filter(RangeFilter.inRanges(col("ts"),
      ranges.map { case (l, h) => (lit(l), lit(h)) })).as[Double].collect().sorted.toSeq
    val want = vals.filter(v => ranges.exists(r => v >= r._1 && v <= r._2)).sorted
    assert(got == want)
  }
}
