package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic column helpers.
  *
  * Doubles summed in different orders differ across engines (and across
  * partitionings!), so every aggregated money/measure column is first
  * scaled to an exact integer. Integer sums are associative => identical
  * in Spark and DuckDB regardless of plan shape. This is also the right
  * call at 100 TB: integer agg states are smaller and exact.
  */
object ColumnOps {
  /** Money double (2 decimals) -> exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Rate double (2 decimals, e.g. 0.07 discount) -> exact integer percent. */
  def pct(c: Column): Column = round(c * 100).cast("long")

  /** Generic fixed-point quantization (e.g. embeddings at 1e-3). */
  def fixed(c: Column, scale: Int): Column =
    round(c.cast("double") * scale).cast("long")
}
