package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NormalizeText semantics (NFC + control→space + collapse + trim) through
  * both eval paths, pinned against an independent reference model built
  * from java.text.Normalizer + the same regex chain the DuckDB oracle
  * runs — the expression's fused single pass must be indistinguishable
  * from the three-stage regex formulation on every input.
  */
class NormalizeTextSpec extends SparkSpec {

  private def reference(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    nfc.replaceAll("[\\x00-\\x1F\\x7F]", " ").replaceAll(" +", " ").trim
  }

  private val cases = Seq(
    "",                                   // empty
    "plain ascii text",                   // already normal
    "cafe\u0301",                         // decomposed -> must compose
    "\t\n\r\u0007\u001b",                 // all controls -> empty after trim
    "  leading and trailing   ",          // trim + inner collapse
    "a\u0000b\u001fc\u007fd",               // NUL, US, DEL interleaved
    "tabs\tand\nnewlines\r\nmixed",        // controls between words
    "A\u030a ring",                       // A + combining ring -> composed
    "already \u00e9 composed",            // composed char survives unchanged
    "x" + (" " * 50) + "y",               // long space run
    "\u00a0nbsp\u00a0stays\u00a0")          // non-breaking space is NOT collapsed

  test("matches the regex reference model, codegen and interpreted") {
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val out = df.select($"id", normalize_text($"s").as("n"))
          .orderBy("id").as[(Long, String)].collect()
        out.foreach { case (i, got) =>
          assert(got == reference(cases(i.toInt)),
            s"case $i: <${cases(i.toInt)}> got <$got> want <${reference(cases(i.toInt))}>")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((1L, Option("a b")), (2L, Option.empty[String])).toDF("id", "s")
    val out = df.select(normalize_text(col("s"))).orderBy("id").collect()
    assert(out(0).getString(0) == "a b")
    assert(out(1).isNullAt(0))
  }

  test("composition actually reduces char count") {
    // 'cafe' + U+0301 is 5 chars decomposed, 4 composed: proves NFC ran.
    assert(NormalizeText.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString("cafe\u0301")).numChars() == 4)
  }
}
