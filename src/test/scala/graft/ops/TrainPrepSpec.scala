package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Soundness checks for the corpus-prep operators beyond the oracle's
  * hash-match: redaction must actually remove every PII-shaped span, and
  * the mixture gate must keep every source's sample inside its configured
  * rate band.
  */
class TrainPrepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t_pii_redact leaves no email/IP/phone match in the redacted text") {
    val out = SparkEntry.queries("t_pii_redact")(spark, dir)
    val residual = out.filter(
      col("redacted").rlike("[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
        col("redacted").rlike("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b") ||
        col("redacted").rlike("\\b\\d{3}-\\d{3}-\\d{4}\\b")).count()
    assert(residual == 0, s"$residual rows still contain PII-shaped spans")
    // Every row had PII planted, so every row must report >=3 matches and
    // carry all three placeholder tokens.
    val weak = out.filter(col("n_email") + col("n_ip") + col("n_phone") < 3).count()
    assert(weak == 0, "planted PII not detected in some rows")
    val missingTag = out.filter(
      !col("redacted").contains("<EMAIL>") ||
        !col("redacted").contains("<IP>") ||
        !col("redacted").contains("<PHONE>")).count()
    assert(missingTag == 0, "redaction placeholders missing")
  }

  test("s_mix_weighted keeps every source within its configured rate band") {
    val rows = SparkEntry.queries("s_mix_weighted")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, total, kept) = (r.getString(0), r.getLong(1), r.getLong(2))
      val rate = if (Set("src0", "src1")(src)) 0.9
        else if (Set("src2", "src3", "src4")(src)) 0.5 else 0.15
      // Hash-gate realization over small strata is noisy; bound loosely
      // but meaningfully (a swapped rate would trip this immediately).
      val frac = kept.toDouble / total
      assert(math.abs(frac - rate) < 0.35,
        s"$src kept $frac, configured $rate")
    }
  }

  test("d_decontam never flags an eval-cohort document and counts are positive") {
    val out = SparkEntry.queries("d_decontam")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) >= 50, "eval doc leaked into the contamination report")
      assert(r.getLong(1) > 0)
    }
  }
}
