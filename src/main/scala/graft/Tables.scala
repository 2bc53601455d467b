package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  * All queries take the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Session-scoped catalog cache: resolving a table = parquet footer read
  // + file listing + scan-relation build, identical every call. Real
  // engines cache catalog state; keyed per session so different
  // SparkSessions (tests) never share plans. DataFrames are immutable, so
  // memoizing is semantics-free.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((System.identityHashCode(spark), dir, name), { _ =>
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    })

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as a
    * nanos-since-epoch long (legacy conf, runtime-settable) and convert to
    * TimestampType at microsecond precision. Integer `div` is mandatory:
    * ns values (~1.7e18) exceed double's 53-bit mantissa, so a float
    * divide would corrupt low-order digits.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.NanosPushdown.register(spark) // ts predicates stay prunable
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
