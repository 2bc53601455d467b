package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-range predicate: keep rows whose key falls in the union of
  * closed intervals — the reference's `_extract_ranges`
  * (/root/reference/BytesProcessor.py:339-354), generalized to any
  * orderable column.
  *
  * The reference raises on an empty range list (reduce over empty seq,
  * BytesProcessor.py:352); we define it as `false` (keep nothing), which
  * is the evident intent. Declared as a single Column so Catalyst pushes
  * it into the scan (PushedFilters) — at 100 TB this prunes row groups
  * via parquet min/max stats instead of reading everything.
  */
object RangeFilter {
  def inRanges(key: Column, ranges: Seq[(Column, Column)]): Column =
    ranges.map { case (lo, hi) => key.between(lo, hi) }
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  def inTsRanges(key: Column, ranges: Seq[(String, String)]): Column =
    inRanges(key, ranges.map { case (lo, hi) => (lit(lo), lit(hi)) })

  def apply(df: DataFrame, key: Column, ranges: Seq[(Column, Column)]): DataFrame =
    df.filter(inRanges(key, ranges))
}
