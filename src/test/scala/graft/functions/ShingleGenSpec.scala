package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordShingles (custom Generator) vs the explode-of-arrays reference
  * formulation: identical multisets of shingles on randomized inputs,
  * plus the edge shapes (null text, empty text, fewer tokens than n,
  * repeated separators).
  */
class ShingleGenSpec extends SparkSpec {

  import spark.implicits._

  private def reference(n: Int) = {
    // split → filter empties → sliding n-gram join, all built-ins
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    explode(transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  private def both(rows: Seq[(Long, String)], n: Int): (Seq[(Long, String)], Seq[(Long, String)]) = {
    val df = rows.toDF("id", "text")
    val gen = df.select(col("id"), graft.functions.word_shingles(col("text"), n).as("s"))
      .as[(Long, String)].collect().sorted.toSeq
    val ref = df.filter(size(filter(split(col("text"), " "), t => length(t) > 0)) >= n)
      .select(col("id"), reference(n).as("s"))
      .as[(Long, String)].collect().sorted.toSeq
    (gen, ref)
  }

  test("generator matches the explode-of-arrays reference on random texts") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val rows = (1L to 100L).map { i =>
      i -> Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    for (n <- Seq(1, 2, 3)) {
      val (gen, ref) = both(rows, n)
      assert(gen == ref, s"n=$n diverged")
    }
  }

  test("edge shapes: null, empty, short, repeated separators") {
    val rows = Seq[(Long, String)](
      1L -> null, 2L -> "", 3L -> "one", 4L -> "one two",
      5L -> "  a   b  c ", 6L -> "x x x x")
    val (gen, ref) = both(rows, 3)
    assert(gen == ref, s"edge shapes diverged: $gen vs $ref")
    assert(gen == Seq(5L -> "a b c", 6L -> "x x x", 6L -> "x x x"))
  }
}
