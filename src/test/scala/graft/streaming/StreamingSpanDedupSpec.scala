package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The streaming span-dedup must be REPLAY-EQUIVALENT to the batch
  * `d_span_dedup` query: feeding the same corpus through the stream in
  * doc_id order — with the micro-batch boundaries drawn at random —
  * must yield per-doc (n_spans, n_dup_spans) identical to the batch
  * query's min-key attribution. This is the property that lets a 100 TB
  * corpus be deduped incrementally (new drops stream in) instead of
  * recomputed from scratch, without changing a single verdict.
  */
class StreamingSpanDedupSpec extends SparkSpec with RocksDbProvider {

  private val dir = "/root/testdata/sf0.001"

  test("streamed verdicts equal the batch d_span_dedup rollup across random batch splits") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.Tables(spark, dir, "documents")
      .selectExpr("doc_id", "text").as[DocIn]
      .collect().sortBy(_.doc_id) // replay in doc_id order (see scaladoc)
    val rnd = new scala.util.Random(7L)

    withRocksDbProvider(spark) {
      val in = MemoryStream[DocIn]
      val q = StreamingOps.spanVerdicts(in.toDS())
        .writeStream.format("memory").queryName("t_span_stream")
        .outputMode(OutputMode.Append()).start()
      try {
        var rest = docs.toList
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(40)
          in.addData(rest.take(take))
          q.processAllAvailable()
          rest = rest.drop(take)
        }
        val streamed = spark.table("t_span_stream").as[SpanVerdict].collect()
          .groupBy(_.doc_id)
          .map { case (id, vs) => (id, vs.length.toLong, vs.count(_.dup).toLong) }
          .toSet
        val batch = graft.SparkEntry.queries("d_span_dedup")(spark, dir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .filter(_._2 > 0) // empty docs emit no streamed spans
          .toSet
        assert(streamed == batch,
          s"stream/batch divergence: onlyStream=${streamed -- batch} onlyBatch=${batch -- streamed}")
        assert(batch.nonEmpty && batch.exists(_._3 > 0), "fixture has no dup spans — test is vacuous")
      } finally q.stop()
    }
  }
}
