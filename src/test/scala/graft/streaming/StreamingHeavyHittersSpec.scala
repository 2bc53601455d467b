package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The streaming Misra–Gries buckets must preserve the sketch's superset
  * guarantee under replay: after streaming the corpus tokens through in
  * random micro-batches, every token with global frequency > n/(k+1)
  * must appear in the union of the buckets' freshest candidate sets,
  * each bucket must hold ≤ k counters, and the per-bucket seen-counts
  * must sum to the corpus token count. This is what makes the stream's
  * state CONSTANT-SIZE at 100 TB: 32 buckets × 2k longs, forever.
  */
class StreamingHeavyHittersSpec extends SparkSpec with RocksDbProvider {

  private val dir = "/root/testdata/sf0.001"
  private val K = 64 // same k as the batch a_heavy_hitters (threshold n/65)

  test("bucket union covers all true heavy hitters after a random-batch replay") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // same tokenization as a_heavy_hitters: lower, whitespace, non-empty
    val toks = graft.Tables(spark, dir, "documents")
      .selectExpr("explode(filter(split(lower(text), ' '), x -> length(x) > 0)) AS tok")
      .as[String].collect()
    val rnd = new scala.util.Random(99L)
    val shuffled = rnd.shuffle(toks.toList)

    withRocksDbProvider(spark) {
      val in = MemoryStream[TokIn]
      val q = StreamingOps.bucketHeavyHitters(in.toDS(), k = K)
        .writeStream.format("memory").queryName("t_hh_stream")
        .outputMode(OutputMode.Update()).start()
      try {
        var rest = shuffled
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(4000)
          in.addData(rest.take(take).map(TokIn))
          q.processAllAvailable()
          rest = rest.drop(take)
        }
        val rows = spark.table("t_hh_stream").as[BucketHitters].collect()
        // freshest summary per bucket = max monotone seen-count
        val fresh = rows.groupBy(_.bucket).map { case (_, rs) => rs.maxBy(_.seen) }
        assert(fresh.forall(_.fps.length <= K), "a bucket exceeded k counters")
        assert(fresh.map(_.seen).sum == toks.length.toLong,
          s"bucket seen-counts ${fresh.map(_.seen).sum} != corpus tokens ${toks.length}")
        val candidates = fresh.flatMap(_.fps).toSet
        // true heavy hitters over token fingerprints (same xxhash64 as the stream)
        val freq = toks.toSeq.toDF("tok")
          .selectExpr("xxhash64(tok) AS fp").as[Long].collect()
          .groupBy(identity).map { case (fp, g) => fp -> g.length.toLong }
        val threshold = toks.length.toDouble / (K + 1)
        val heavy = freq.collect { case (fp, n) if n > threshold => fp }.toSet
        assert(heavy.nonEmpty, "fixture has no heavy hitters — test is vacuous")
        assert(heavy.subsetOf(candidates),
          s"missing heavy hitters: ${heavy -- candidates} (|candidates|=${candidates.size})")
      } finally q.stop()
    }
  }
}
