package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed parquet ROW-GROUP audit — the physical-layout pre-flight
  * that SCALE.md's f_map2 lesson motivates: Spark parallelizes a parquet
  * scan at row-group granularity, so a file written as ONE giant row
  * group caps scan parallelism at 1 task regardless of
  * `spark.sql.files.maxPartitionBytes` (the split boundaries land inside
  * the group and every split but one reads zero rows). This audit reads
  * ONLY footers — never data pages — and reports per file: row-group
  * count, total rows, the largest group's rows and its (uncompressed)
  * bytes, so a table owner can find the files that will under-parallelize
  * a 100 TB scan before paying for it.
  *
  * Scale design: the file list is a Dataset repartitioned across the
  * cluster and each task opens just the footer (a few KB at the file
  * tail) via [[org.apache.parquet.hadoop.ParquetFileReader]] — cost is
  * O(files) metadata reads spread over executors, no driver loop, no
  * data I/O.
  */
object RowGroupAudit {

  /** Footer stats for every data file under `dir` (recursive, so a
    * partitioned directory tree is covered; `part-*.parquet`-style
    * files, `_SUCCESS`/hidden files skipped). Listing goes through the
    * Hadoop [[org.apache.hadoop.fs.FileSystem]] API — the SAME layer the
    * per-task footer reads use — so the audit works against any store
    * Spark can read (`hdfs://`, `s3a://`, local), not just
    * `java.io.File` paths (ADVICE r16: the old driver-local listFiles()
    * returned null on non-local stores and aborted the very pre-flight
    * whose point is a 100 TB remote table). */
  def audit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, /* recursive = */ true)
    val listed = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toSeq
    def hiddenAncestor(p: org.apache.hadoop.fs.Path): Boolean =
      Iterator.iterate(p)(_.getParent).takeWhile(q => q != null && q != root)
        .exists(q => q.getName.startsWith("_") || q.getName.startsWith("."))
    val files = listed
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !hiddenAncestor(s.getPath))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"no parquet data files under $dir")
    files.toDS()
      .repartition(math.min(files.size, spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            val rgs = rdr.getFooter.getBlocks.asScala.toSeq
            val rows = rgs.map(_.getRowCount).sum
            val maxRows = if (rgs.isEmpty) 0L else rgs.map(_.getRowCount).max
            val maxBytes = if (rgs.isEmpty) 0L else rgs.map(_.getTotalByteSize).max
            (new java.io.File(p).getName, rgs.size.toLong, rows, maxRows, maxBytes)
          } finally rdr.close()
        }
      }
      .toDF("file", "n_rowgroups", "n_rows", "max_rg_rows", "max_rg_bytes")
  }
}
