package graft.queries

import graft._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
import org.apache.spark.sql.functions._

/** Multimodal/binary-column surface. `documents.text` is encoded to an
  * opaque binary column (the container ships no media files), and the
  * typed decode pipeline treats it exactly as it would image bytes.
  */
object MultimodalQ {

  /** Binary column metadata via pure column expressions. */
  val mmBinaryMeta: Q = Q(
    "mm_binary_meta",
    (spark, dir) => {
      val bin = encode(col("text"), "UTF-8")
      Tables(spark, dir, "documents").select(
        col("doc_id"),
        length(bin).cast("long").as("size_bytes"),
        lower(hex(substring(bin, 1, 4))).as("magic_hex"),
        sha2(bin, 256).as("sha256_hex"),
        md5(col("text")).as("md5_hex"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           | CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes,
           | lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
           | sha256(text) AS sha256_hex,
           | md5(text) AS md5_hex
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Typed binary decode pipeline (stubbed codec — see Multimodal): the
    * oracle recomputes the same deterministic fake features in SQL. */
  val mmFakeDecode: Q = Q(
    "mm_fake_decode",
    (spark, dir) => {
      val spark2 = spark; import spark2.implicits._
      val rows = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          MediaRow(id, bytes, MediaMeta("text/fake", bytes.length.toLong))
        }
      Multimodal.decodeAll(rows)
        .toDF()
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           | CAST(length(text) AS BIGINT) AS size_bytes,
           | CAST(COALESCE(ascii(substring(text, 1, 1)), 0) AS BIGINT) AS width,
           | CAST(COALESCE(ascii(substring(text, 2, 1)), 0) AS BIGINT) AS height,
           | CAST(length(text) % 7 AS BIGINT) AS n_frames,
           | CAST(COALESCE(list_sum(list_transform(range(1, least(length(text), 64) + 1),
           |    i -> ascii(substring(text, CAST(i AS INT), 1)))), 0) AS BIGINT) AS sum64,
           | CAST(COALESCE(list_sum(list_transform(range(1, least(length(text), 64) + 1),
           |    i -> ascii(substring(text, CAST(i AS INT), 1)))), 0) AS DOUBLE)
           |   / CAST(greatest(least(length(text), 64), 1) AS DOUBLE) AS mean64
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Frame-sampling stub: treat the payload as a fixed-frame "video"
    * (16-byte frames), sample every 4th frame (offsets 0/64/128/192), and
    * fingerprint the sampled frames. Pure column expressions — the exact
    * plumbing shape (stride sampling + per-sample digest) a real video
    * pipeline runs per row, with the codec swapped in for substring. */
  val mmFrameSample: Q = Q(
    "mm_frame_sample",
    (spark, dir) => {
      val t = col("text")
      Tables(spark, dir, "documents").select(
        col("doc_id"),
        expr("CAST(ceil(length(text) / 16.0) AS BIGINT)").as("n_frames"),
        md5(concat(substring(t, 1, 16), substring(t, 65, 16),
          substring(t, 129, 16), substring(t, 193, 16))).as("sample_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           | CAST(ceil(length(text) / 16.0) AS BIGINT) AS n_frames,
           | md5(concat(substr(text,1,16), substr(text,65,16),
           |            substr(text,129,16), substr(text,193,16))) AS sample_md5
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** WebDataset-style shard planning: assign each binary blob to a
    * fixed-byte-budget output shard per source split — shard_id =
    * floor(exclusive running byte cumsum / budget), the same
    * deterministic first-fit-in-order rule [[TrainPrepQ.tSeqPack]] uses
    * for token packs, here over blob BYTES (how tar shards for a
    * multimodal training set get planned before the copy job runs).
    * A blob spanning a boundary starts in the shard where its first
    * byte lands; shards overfill by at most one blob.
    *
    * Scale: only (source, doc_id, size) triples flow through the prefix
    * — never the blob bytes — and the per-source running sum goes
    * through [[graft.ops.DistributedPrefix]] doc_id-range blocks rather
    * than `Window.partitionBy(source)`: source cardinality is a corpus
    * property (20 here), not a data-size property, so a plain per-source
    * window would cap parallelism at n_sources while the per-source
    * grain grows with the data — the a_weighted_median class of
    * scale-killer. Blocked, the window grain is (source, doc_id-range)
    * and scales horizontally. */
  val mmShardPack: Q = Q(
    "mm_shard_pack",
    (spark, dir) => {
      val budget = 4096L
      val sized = Tables(spark, dir, "documents")
        .select(col("source"), col("doc_id"),
          length(encode(col("text"), "UTF-8")).cast("long").as("size_bytes"))
        .localCheckpoint() // feeds bounds + both prefix references
      val bounds = sized.agg(
        min(col("doc_id")).as("blo"), max(col("doc_id")).as("bhi"))
      graft.ops.DistributedPrefix.runningSum(
          sized.crossJoin(broadcast(bounds)),
          block = graft.ops.DistributedPrefix.rangeBucket(
            col("doc_id"), col("blo"), col("bhi"), 64),
          blockAsc = true,
          localOrder = Seq(col("doc_id")),
          value = col("size_bytes"),
          out = "cum",
          groupCols = Seq("source"))
        .withColumn("shard_id", expr(s"(cum - size_bytes) div $budget"))
        .groupBy(col("source"), col("shard_id"))
        .agg(count(lit(1)).as("n_blobs"), sum(col("size_bytes")).as("shard_bytes"))
        .orderBy("source", "shard_id")
    },
    Some("""WITH d AS (SELECT source, doc_id,
           |  CAST(octet_length(encode(text)) AS BIGINT) AS size_bytes FROM documents),
           |c AS (SELECT source, doc_id, size_bytes,
           |  SUM(size_bytes) OVER (PARTITION BY source ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
           |SELECT source, CAST((cum - size_bytes) // 4096 AS BIGINT) AS shard_id, COUNT(*) AS n_blobs,
           |  CAST(SUM(size_bytes) AS BIGINT) AS shard_bytes
           |FROM c GROUP BY 1, 2 ORDER BY source, shard_id""".stripMargin))

  val all: Seq[Q] = Seq(mmBinaryMeta, mmFakeDecode, mmFrameSample, mmShardPack)
}
