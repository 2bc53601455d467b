package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in graft.queries.* and register through [[Registry]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference-core semantics (range extraction + rule labeling,
    * SURVEY.md §2.1 R7+R8) over the events table.
    */
  def entry(spark: SparkSession): DataFrame = {
    // entry() is handed a driver-built session. Same contract as every
    // other events reader: a UTC session is REQUIRED, never silently
    // imposed — flipping the zone here would reinterpret the caller's own
    // NTZ casts behind its back (the exact failure Tables.requireUtcSession
    // exists to prevent). Non-UTC drivers fail loudly with the fix message.
    Tables.requireUtcSession(spark)
    _root_.graft.queries.RefCoreQ.r8RuleLabel.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.byName.map { case (n, q) => n -> q.run }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate sketches, binary golden paths) → rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
