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

  val all: Seq[Q] = Seq(scanCsv, scanJson, fUdf)
}
