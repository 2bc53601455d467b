package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format coverage (SURVEY.md §2.2 scans row): CSV and JSON, as
  * write-then-read roundtrips through the engine's own sinks so both the
  * reader and the writer are exercised. The oracle reads the original
  * parquet — a lossless roundtrip must hash-match it.
  *
  * Scale note: at 100 TB these formats are ingest/egress edges, not
  * internal storage — the queries keep explicit schemas (no inference
  * scan) and integer-exact values, the two things that make text formats
  * safe at scale.
  */
object ScanQ {

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name"

  /** nation -> CSV (header) -> read back with explicit schema. */
  val scanCsv: Q = Q(
    "scan_csv",
    (spark, dir) => {
      val path = tmp("scan_csv")
      Tables(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
      val schema = StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType),
        StructField("n_regionkey", LongType)))
      spark.read.schema(schema).option("header", "true").csv(path)
        .orderBy("n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, n_regionkey
           |FROM nation ORDER BY n_nationkey""".stripMargin))

  /** customer -> JSON lines -> read back; money scaled to exact cents
    * AFTER the roundtrip, so the JSON double path itself is what's
    * checked. */
  val scanJson: Q = Q(
    "scan_json",
    (spark, dir) => {
      val path = tmp("scan_json")
      Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .coalesce(1)
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("c_acctbal", DoubleType)))
      spark.read.schema(schema).json(path)
        .select(col("c_custkey"), col("c_name"), cents(col("c_acctbal")).as("bal_cents"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Scalar Scala UDF surface (SURVEY.md §2.2 UDF row). Deliberately a
    * function the built-ins can also express, so the DuckDB oracle can
    * check the UDF dispatch path end-to-end. Production guidance stays
    * "functions, not UDFs" — this pins that the escape hatch works.
    */
  val fUdf: Q = Q(
    "f_udf",
    (spark, dir) => {
      val vowelRatio = udf { (s: String) =>
        if (s == null || s.isEmpty) 0L
        else {
          val v = s.count("aeiou".contains(_))
          v * 1000L / s.length
        }
      }
      Tables(spark, dir, "part")
        .select(col("p_partkey"), vowelRatio(col("p_name")).as("vowel_permille"))
        .orderBy("p_partkey")
    },
    Some("""SELECT p_partkey,
           | CASE WHEN length(p_name) = 0 THEN 0
           |      ELSE length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g'))
           |      END * 1000 // length(p_name) AS vowel_permille
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Per-document raw-file fixture for the file-shard ingestion formats:
    * the first 200 documents written as one `doc_<id>.txt` apiece (bounded
    * at every SF — the fixture is the ingest-edge sample; the format
    * itself lists and reads millions of files in parallel at 100 TB).
    * Written by the EXECUTORS via foreachPartition — the distributed
    * shape; in local mode the scratch dir is host-local, on a cluster
    * this step would target shared storage. [[Fixtures]] discipline:
    * content-fingerprinted path, unique-scratch build, atomic publish. */
  private def docFilesFixture(spark: org.apache.spark.sql.SparkSession,
                              dir: String): String = {
    val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path = Fixtures.fingerprintedPath(
      s"${sys.props("java.io.tmpdir")}/graft_doc_files_${sys.props("user.name")}$dirTag",
      Seq(s"$dir/documents.parquet"))
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val build = java.nio.file.Files.createTempDirectory("graft_doc_files_build")
      val buildPath = build.toString
      Tables(spark, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(buildPath, f"doc_${r.getLong(0)}%05d.txt"),
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      Fixtures.publishDir(build, path)
    }
    path
  }

  private def docIdFromPath(pathCol: org.apache.spark.sql.Column) =
    regexp_extract(pathCol, "doc_(\\d+)\\.txt", 1).cast("long").as("doc_id")

  /** `binaryFile` source — the raw-shard ingestion path for multimodal
    * data (images/audio arrive as opaque files; this format is how they
    * enter the engine as BinaryType rows with path metadata). Roundtrip
    * oracle: per-file byte length and md5 must equal the source table's
    * text (pure ASCII, so chars == bytes). pathGlobFilter prunes at the
    * LISTING, before any byte is read. */
  val scanBinaryfile: Q = Q(
    "scan_binaryfile",
    (spark, dir) => {
      val files = docFilesFixture(spark, dir)
      spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt").load(files)
        .select(docIdFromPath(col("path")),
          col("length").as("n_bytes"), md5(col("content")).as("body_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
           | md5(text) AS body_md5
           |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  /** `text` source in wholetext mode — one row per raw file, the
    * one-document-per-file corpus ingestion shape (WET-style dumps).
    * `_metadata.file_name` carries the identity; content is pinned by
    * length + md5 against the source table. */
  val scanText: Q = Q(
    "scan_text",
    (spark, dir) => {
      val files = docFilesFixture(spark, dir)
      spark.read.option("wholetext", "true").text(files)
        .select(docIdFromPath(col("_metadata.file_name")),
          length(col("value")).cast("bigint").as("n_chars"),
          md5(col("value")).as("body_md5"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
           | md5(text) AS body_md5
           |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin))

  val all: Seq[Q] = Seq(scanCsv, scanJson, fUdf, scanBinaryfile, scanText)
}
