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
  // memoizing is semantics-free. Keyed on sessionUUID (unique per
  // session — identityHashCode can be reused after GC and hand a new
  // session DataFrames bound to a dead one) and LRU-bounded so cached
  // plans don't pin stopped sessions for the life of the JVM.
  private val MaxEntries = 256
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String, String), DataFrame](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), DataFrame]): Boolean =
        size() > MaxEntries
    })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (org.apache.spark.sql.graftshim.Shims.sessionUUID(spark), dir, name)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val df =
        if (name == "events") events(spark, dir)
        else spark.read.parquet(s"$dir/$name.parquet")
      cache.put(key, df)
      df
    }
  }

  /** events.parquet's ts physical layout has drifted across driver drops:
    * parquet TIMESTAMP(NANOS) (which Spark 4 refuses to read as a
    * timestamp — PARQUET_TYPE_ILLEGAL, so it arrives as a nanos long under
    * the legacy conf) or plain timestamp[us] (which arrives as
    * TIMESTAMP_NTZ: isAdjustedToUTC=false). Normalize BOTH to TimestampType
    * so every downstream query sees one stable type — epoch functions
    * (`unix_micros`) reject NTZ, and a fleet of 200+ queries must not
    * care which drop generated the data. The session tz is forced to UTC
    * right here (not just in the gate mains), so the NTZ→timestamp cast
    * is the identity on the wall-clock values DuckDB sees no matter which
    * entry point built the session. Integer `div` is mandatory for the
    * nanos branch: ns values (~1.7e18) exceed double's 53-bit mantissa,
    * so a float divide would corrupt low-order digits.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→timestamp cast below interprets the NTZ wall clock in the
    // session tz; enforce UTC here (not just in gate mains) so every
    // entry point that touches events — tools included — reads identical
    // epoch values regardless of the host JVM's zone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.NanosPushdown.register(spark) // ts predicates stay prunable
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      raw.withColumn("ts", expr("cast(ts as timestamp)"))
    else raw
  }
}
