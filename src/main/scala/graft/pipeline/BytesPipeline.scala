package graft.pipeline

import graft.functions.packet_vector
import graft.ops.{LabelRule, RangeFilter, RuleLabeler}
import graft.pcap.{Packet, PcapSource}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The flagship workload: the reference's whole program
  * (/root/reference/BytesProcessor.py:48-194) as ONE declarative Spark
  * pipeline — pcap scan -> decode/anonymize -> multi-range time filter ->
  * rule labeling -> vectorize -> dual parquet sink.
  *
  * Execution shape (SURVEY.md §3.4): a single narrow stage per sink, zero
  * shuffles — the pipeline is embarrassingly parallel, so at 100 TB it
  * scales linearly with executors; there is no driver-side loop, no
  * collect, no chunk bookkeeping (Spark partitioning subsumes the
  * reference's chunk/pool/gather machinery, :62-94,:121-158).
  *
  * Ordering within the reference is preserved where it is load-bearing:
  * the range filter runs BEFORE vectorization ("avoid processing bytes
  * outside ranges given", :144-145) — declaratively Catalyst does this via
  * predicate pushdown, and vectorize being after filter in the plan
  * guarantees no wasted byte work either way.
  */
object BytesPipeline {

  final case class Config(
      rules: Seq[LabelRule],
      rangesToExtract: Seq[(Double, Double)],
      width: Int = 1525, // README.md:8 — initial 1525 B of the IP layer
      widen: Boolean = true, // byte(i) columns at the sink for schema parity (§7.4)
      splittable: Boolean = false,
      targetSplitBytes: Long = 128L * 1024 * 1024,
      // Engine extension: decode IPv6 datagrams too. Default false = the
      // reference-parity preset (BytesProcessor.py:222 checks dpkt.ip.IP
      // only, so v6 frames drop).
      ipv6: Boolean = false)

  def forwardMask(rules: Seq[LabelRule]): Column =
    RuleLabeler.forwardMask(col("timestamp"), col("src_ip"), rules)

  /** decode output -> labeled feature table (columns: metadata + label +
    * features float32[width]); `payload` never reaches the sink (:167).
    */
  def features(packets: Dataset[Packet], cfg: Config): DataFrame =
    featuresDf(packets.toDF(), cfg)

  /** [[features]] over an untyped packet frame (same columns as
    * [[graft.pcap.Packet]]) — lets callers interpose e.g. an `observe`
    * node between decode and the range filter. */
  def featuresDf(packets: DataFrame, cfg: Config): DataFrame =
    packets
      .filter(RangeFilter.inRanges(
        col("timestamp"),
        cfg.rangesToExtract.map { case (lo, hi) => (lit(lo), lit(hi)) }))
      .withColumn("label",
        RuleLabeler.labelCol(col("timestamp"), col("src_ip"), col("dst_ip"), cfg.rules))
      .withColumn("features", packet_vector(col("payload"), cfg.width))
      .drop("payload")

  /** Widen features to the reference's `byte(0)..byte(width-1)` columns
    * (:183-184). Kept optional: 1532 top-level columns split whole-stage
    * codegen, so internal stages stay ArrayType and only the sink widens.
    */
  def widen(df: DataFrame, width: Int): DataFrame = {
    val meta = Seq("timestamp", "src_ip", "dst_ip", "src_port", "dst_port", "protocol", "label")
      .map(col)
    val bytes = (0 until width).map(i => col("features").getItem(i).as(s"byte($i)"))
    df.select(meta ++ bytes: _*)
  }

  /** Continuous flagship: stream packets from a watched directory and
    * maintain BOTH sinks per micro-batch via foreachBatch (the streaming
    * engine allows one sink per query; foreachBatch gives the dual write
    * the batch path has, with the same persist-once shape). Append-only
    * parquet, exactly-once per input file via the checkpoint log.
    */
  /** @param availableNow true = `Trigger.AvailableNow`: process every
    *        file present, then stop — the scheduled-incremental mode
    *        (cron-driven catch-up over a landing zone) that replaces a
    *        full batch re-read with checkpointed incremental progress at
    *        100 TB. false = continuous micro-batches (default). */
  def runStreaming(spark: SparkSession, watchDir: String, outDir: String, cfg: Config,
                   checkpoint: Option[String] = None, availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val packets = PcapSource.packetsStream(spark, watchDir, ipv6 = cfg.ipv6)
    val fwd = forwardMask(cfg.rules)
    val writer = features(packets, cfg)
      .writeStream
      .option("checkpointLocation", checkpoint.getOrElse(s"$outDir/_checkpoint"))
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Idempotent on micro-batch REPLAY (crash between the two writes):
        // each batch lands in its own batch_id=N partition with dynamic
        // partition overwrite, so a replayed batch overwrites its own
        // partition instead of appending duplicates.
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val labeled = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          def sink(df: DataFrame, path: String): Unit =
            (if (cfg.widen) widen(df, cfg.width) else df)
              .withColumn("batch_id", lit(batchId))
              .write.mode("overwrite").partitionBy("batch_id").parquet(path)
          sink(labeled, s"$outDir/data")
          val adv = labeled.filter(fwd)
          if (!adv.isEmpty) sink(adv, s"$outDir/adversarial")
        } finally labeled.unpersist()
        ()
      }
      .start()
  }

  // --- crash-consistent dual-sink snapshot protocol ---------------------
  //
  // The naive batch shape (two independent mode("overwrite") commits) has
  // a torn-pair window: a crash between the `data` and `adversarial`
  // writes leaves a NEW data table beside a STALE adversarial table with
  // nothing tying versions together. `run` therefore stages both tables
  // under a fresh `$outDir/v=N/{data,adversarial}` and COMMITS by
  // atomically creating the zero-byte marker `$outDir/_published_v=N`
  // only after both writes finish. Readers resolve through [[latest]]
  // (highest published marker wins), so a crash anywhere before the
  // marker — including between the two table writes — leaves the
  // previous snapshot fully visible and the orphan staging dir invisible;
  // the next successful run prunes it. Marker creation is a single file
  // create (atomic on posix and HDFS; an object-store PUT is equally
  // all-or-nothing). This mirrors the streaming twin's versioned-snapshot
  // discipline (StreamingOps.applyUpsert). Adversarial elision
  // (BytesProcessor.py:115-117) is preserved PER SNAPSHOT: the published
  // version simply has no adversarial dir when no rule fired — the stale
  // adversarial of the overwrite scheme cannot survive a publish.

  private val MarkerPrefix = "_published_v="

  private def fsOf(spark: SparkSession, dir: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def listNames(spark: SparkSession, outDir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, outDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
  }

  /** Committed snapshot versions (marker files present). */
  private[pipeline] def publishedVersions(spark: SparkSession, outDir: String): Seq[Long] =
    listNames(spark, outDir).filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix).toLong)

  /** All staged version dirs, published or not (orphans from crashed runs
    * included — version numbering must never reuse them). */
  private[pipeline] def stagedVersions(spark: SparkSession, outDir: String): Seq[Long] =
    listNames(spark, outDir).filter(_.startsWith("v="))
      .flatMap(n => scala.util.Try(n.stripPrefix("v=").toLong).toOption)

  /** Resolve the committed snapshot a reader should use: (dataPath,
    * Some(advPath) iff that snapshot published an adversarial table).
    * Never returns a torn pair — both paths come from one committed
    * version. None until the first successful `run`. */
  def latest(spark: SparkSession, outDir: String): Option[(String, Option[String])] =
    publishedVersions(spark, outDir).sorted.lastOption.map { v =>
      val (fs, _) = fsOf(spark, outDir)
      val adv = new org.apache.hadoop.fs.Path(s"$outDir/v=$v/adversarial")
      (s"$outDir/v=$v/data", if (fs.exists(adv)) Some(adv.toString) else None)
    }

  /** Accounted-run result: the committed snapshot paths plus ingest
    * counters observed on the decode stream itself (an `observe` node —
    * zero extra jobs, zero extra passes): total decoded packets, and how
    * many carried NO capture timestamp. pcapng Simple Packet Blocks have
    * no timestamp field and surface as ts=0.0 ([[graft.pcap.PcapngFormat]]);
    * every time-range rule silently drops such records, so an SPB-heavy
    * capture would otherwise range-filter to zero rows with no trace.
    * A nonzero `noTimestampPackets` is therefore also logged LOUDLY to
    * stderr by [[runAccounted]]. */
  final case class RunResult(dataPath: String, advPath: Option[String],
      ingestedPackets: Long, noTimestampPackets: Long)

  /** Run end-to-end: returns (dataPath, Some(advPath) if any adversarial
    * rows), both inside the newly committed snapshot dir. Two sinks share
    * one persisted upstream so decode+vectorize run once (:110-119 writes
    * both tables from one in-memory chunk).
    */
  def run(spark: SparkSession, pcapPaths: Seq[String], outDir: String, cfg: Config)
      : (String, Option[String]) = {
    val r = runAccounted(spark, pcapPaths, outDir, cfg)
    (r.dataPath, r.advPath)
  }

  /** [[run]] plus ingest accounting (see [[RunResult]]). */
  def runAccounted(spark: SparkSession, pcapPaths: Seq[String], outDir: String, cfg: Config)
      : RunResult = {
    val packets =
      if (cfg.splittable)
        PcapSource.packetsSplittable(spark, pcapPaths, cfg.targetSplitBytes, ipv6 = cfg.ipv6)
      else PcapSource.packets(spark, pcapPaths, ipv6 = cfg.ipv6)
    // Ingest counters ride the decode stream BEFORE the range filter —
    // they count what was read, not what survived.
    val obs = org.apache.spark.sql.Observation()
    val observed = packets.toDF().observe(obs,
      count(lit(1)).as("packets"),
      count(when(col("timestamp") === 0.0, 1)).as("no_ts_packets"))
    val labeled = featuresDf(observed, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val prev = publishedVersions(spark, outDir)
      val v = (prev ++ stagedVersions(spark, outDir)).foldLeft(0L)(math.max) + 1
      val stage = s"$outDir/v=$v"
      val out = if (cfg.widen) widen(labeled, cfg.width) else labeled
      val dataPath = s"$stage/data"
      out.write.mode("overwrite").parquet(dataPath)
      val adv = labeled.filter(forwardMask(cfg.rules))
      val advPath =
        if (adv.isEmpty) None // adversarial table only when non-empty (:115-117)
        else {
          val p = s"$stage/adversarial"
          (if (cfg.widen) widen(adv, cfg.width) else adv).write.mode("overwrite").parquet(p)
          Some(p)
        }
      // COMMIT: the snapshot becomes visible in one atomic file create.
      val (fs, _) = fsOf(spark, outDir)
      fs.create(new org.apache.hadoop.fs.Path(outDir, s"$MarkerPrefix$v"), false).close()
      // Prune everything the commit superseded: old markers first (so a
      // crash mid-prune can only leave EXTRA consistent snapshots, never
      // a marker without its dir), then stale + orphan staging dirs.
      prev.foreach(o => fs.delete(new org.apache.hadoop.fs.Path(outDir, s"$MarkerPrefix$o"), false))
      stagedVersions(spark, outDir).filter(_ != v).foreach(o =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$outDir/v=$o"), true))
      // The data-sink action already materialized the observe node; get
      // is immediate. cache() means the adversarial pass never re-fires it.
      val m = obs.get
      val nPackets = m("packets").asInstanceOf[Long]
      val nNoTs = m("no_ts_packets").asInstanceOf[Long]
      if (nNoTs > 0L)
        System.err.println(
          s"[graft.BytesPipeline] WARNING: $nNoTs of $nPackets ingested packets " +
            "have no capture timestamp (pcapng Simple Packet Blocks surface as " +
            "ts=0.0) and fail every time-range rule; if the capture is SPB-heavy " +
            "the published snapshot may be empty.")
      RunResult(dataPath, advPath, nPackets, nNoTs)
    } finally labeled.unpersist()
  }
}
