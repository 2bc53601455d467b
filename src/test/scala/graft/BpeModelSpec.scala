package graft

/** Reference-model check for t_bpe_apply: a plain sequential Scala BPE
  * encoder (char-space the token, fold the ranked merge table with
  * literal left-to-right non-overlapping replaces, split, count) must
  * produce EXACTLY the query's top-40 symbol frequencies at sf0.001.
  * This pins the semantics the DuckDB oracle shares with the Spark plan
  * against an implementation with no SQL engine in it at all — if both
  * engines agreed on the wrong greedy-merge semantics, this catches it.
  */
class BpeModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val merges = Seq(
    "t h" -> "th", "th e" -> "the", "i n" -> "in", "a n" -> "an",
    "an d" -> "and", "e r" -> "er", "o n" -> "on", "r e" -> "re")

  private def encode(tok: String): Seq[String] = {
    val spaced = tok.map(c => s"$c").mkString(" ")
    val merged = merges.foldLeft(spaced) { case (s, (a, b)) => s.replace(a, b) }
    merged.split(" ").toSeq
  }

  test("t_bpe_apply matches a sequential reference encoder symbol-for-symbol") {
    val texts = Tables(spark, dir, "documents")
      .select("text").collect().map(_.getString(0))
    val counts = collection.mutable.Map.empty[String, Long]
    for {
      text <- texts
      tok <- text.toLowerCase.split(" ", -1)
      if tok.matches("[a-z]+")
      sym <- encode(tok)
    } counts(sym) = counts.getOrElse(sym, 0L) + 1L
    val expected = counts.toSeq
      .sortBy { case (sym, freq) => (-freq, sym) }
      .take(40)
    val got = SparkEntry.queries("t_bpe_apply")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected,
      s"distributed BPE apply diverged from the sequential model:\n" +
        s"  got      ${got.take(10)}\n  expected ${expected.take(10)}")
  }

  test("reference encoder sanity: composed merges apply in rank order") {
    assert(encode("the") == Seq("the"), "t h->th then th e->the must compose")
    assert(encode("and") == Seq("and"))
    assert(encode("rethink") == Seq("re", "th", "in", "k"),
      "greedy left-to-right application order broken")
    assert(encode("banana") == Seq("b", "an", "an", "a"),
      "non-overlapping scan must merge both 'a n' pairs")
  }
}
