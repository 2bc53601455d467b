package graft

import org.apache.spark.sql.functions._

/** Invariants for the state data source reader and raw-file scan keys
  * that the oracle's hash compare can't express: state sharding, reader
  * cross-agreement, and listing-time glob pruning.
  */
class StateReadSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("statestore read is sharded: entries spread across store partitions, all in range") {
    val ckpt = queries.StateReadQ.ckptFixture(spark, dir)
    val parts = spark.read.format("statestore").option("path", ckpt).load()
      .select("partition_id").distinct().collect().map(_.getInt(0))
    val n = spark.sessionState.conf.numShufflePartitions
    assert(parts.forall(p => p >= 0 && p < n), s"partition_id outside [0, $n)")
    assert(parts.length > 1, "all state in one shard — keyed state is not distributed")
  }

  test("state-metadata shard count bounds the shards statestore actually returns") {
    val ckpt = queries.StateReadQ.ckptFixture(spark, dir)
    val meta = spark.read.format("state-metadata").load(ckpt)
      .select("numPartitions").head().getInt(0)
    val used = spark.read.format("statestore").option("path", ckpt).load()
      .select("partition_id").distinct().count()
    assert(used <= meta, s"statestore returned $used shards, metadata claims $meta")
  }

  test("binaryFile and wholetext readers agree byte-for-byte on every file") {
    val a = SparkEntry.queries("scan_binaryfile")(spark, dir)
      .select(col("doc_id"), col("body_md5").as("md5_bin"))
    val b = SparkEntry.queries("scan_text")(spark, dir)
      .select(col("doc_id"), col("body_md5").as("md5_txt"))
    val joined = a.join(b, Seq("doc_id"), "full_outer")
    assert(joined.count() == 200, "reader outputs cover different file sets")
    assert(joined.filter(col("md5_bin") =!= col("md5_txt") ||
      col("md5_bin").isNull || col("md5_txt").isNull).isEmpty,
      "binaryFile bytes and wholetext chars disagree")
  }

  test("binaryFile pathGlobFilter prunes non-matching files at the listing") {
    val scratch = java.nio.file.Files.createTempDirectory("graft_glob_spec")
    java.nio.file.Files.write(scratch.resolve("keep.txt"), "kept".getBytes)
    java.nio.file.Files.write(scratch.resolve("skip.bin"), "skipped".getBytes)
    try {
      val read = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt").load(scratch.toString)
      assert(read.count() == 1, "glob did not prune at listing")
      assert(read.head().getAs[String]("path").endsWith("keep.txt"))
    } finally {
      scratch.toFile.listFiles().foreach(_.delete())
      scratch.toFile.delete()
    }
  }
}
