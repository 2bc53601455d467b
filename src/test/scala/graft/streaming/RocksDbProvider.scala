package graft.streaming

import org.apache.spark.sql.SparkSession

/** transformWithState requires the RocksDB state store; these suites
  * share one JVM-wide session, so the provider switch must be scoped to
  * the TWS query and restored for whatever the other suites run with —
  * one helper instead of the set/try/finally/restore block per test.
  */
trait RocksDbProvider {
  def withRocksDbProvider[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
