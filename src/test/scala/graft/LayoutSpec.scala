package graft

/** Physical-layout assertions for the lakehouse maintenance operators —
  * the file-count effects the DuckDB oracle (which sees only logical
  * content) cannot check.
  */
class LayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def parquetFiles(path: String): Int =
    Option(new java.io.File(path).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)

  test("sink_compact rewrites the 64-file layout into 4 files, content intact") {
    val out = SparkEntry.queries("sink_compact")(spark, dir)
    val n = out.collect().map(_.getLong(1)).sum
    assert(n > 0, "compacted table read back empty")
    val small = parquetFiles(queries.LayoutQ.tmp(spark, "sink_compact_small", dir))
    val big = parquetFiles(queries.LayoutQ.tmp(spark, "sink_compact_big", dir))
    assert(small == 64, s"expected the 64-file fixture layout to persist for reuse, found $small files")
    assert(big == 4, s"expected 4 compacted files, found $big")
  }

  test("scan_evolve surfaces pre-schema rows under the null-status bucket") {
    val rows = SparkEntry.queries("scan_evolve")(spark, dir).collect()
    val statuses = rows.map(_.getString(0)).toSet
    assert(statuses.contains("<pre-schema>"), s"missing evolved-null bucket in $statuses")
    assert(statuses.size >= 2, "expected at least one real status besides the pre-schema bucket")
  }
}
