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
    // session tz, so events semantics REQUIRE a UTC session. Every graft
    // entry point (Verify/Bench/SparkEntry.entry/tools/test base) forces
    // UTC at session construction; this reader only verifies — it must
    // not silently flip the zone out from under a caller who built a
    // non-UTC session and already parsed local-time literals elsewhere.
    requireUtcSession(spark)
    graft.plans.NanosPushdown.register(spark) // ts predicates stay prunable
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (raw.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      raw.withColumn("ts", expr("cast(ts as timestamp)"))
    else raw
  }

  /** Fail loudly (rather than silently overwrite) when the session zone
    * is not UTC-equivalent. Any fixed zero-offset spelling ("UTC",
    * "Etc/UTC", "Z", "+00:00", "GMT") passes — they all interpret NTZ
    * wall clocks identically; anything else would silently shift every
    * events epoch vs the DuckDB oracle.
    */
  private[graft] def requireUtcSession(spark: SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    val utc =
      try java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
        .getTotalSeconds == 0 && java.time.ZoneId.of(tz).getRules.isFixedOffset
      catch { case _: java.time.DateTimeException => false }
    if (!utc) throw new IllegalStateException(
      s"graft events require a UTC session (spark.sql.session.timeZone=$tz); " +
        "build the SparkSession with .config(\"spark.sql.session.timeZone\", \"UTC\") " +
        "as every graft entry point does")
  }
}
