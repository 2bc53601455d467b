package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation — the two-pass cumulative sum that
  * replaces a single-partition `Window.orderBy(...)` when the ordered
  * grain grows with the data (the "No Partition Defined for Window"
  * scale-killer: at sf100 "all parts" is hundreds of millions of rows
  * through ONE task).
  *
  * Shape: rows are blocked by a caller-supplied bucket expression that is
  *  (a) a PURE FUNCTION of the row — deterministic by construction, no
  *      reliance on exchange reuse or `spark_partition_id()` stability
  *      across re-evaluations of the same subtree, and
  *  (b) MONOTONE w.r.t. the global sort order (a coarser blocking of it),
  *      so block-major + within-block order == the global order.
  * Pass 1 computes one partial sum per block and turns them into block
  * offsets with a triangular self-join over AT MOST #buckets rows (a
  * constant) — no partition-less window anywhere, so the plan never
  * funnels rows through one task and never emits the "No Partition
  * Defined for Window" warning. Pass 2 broadcast-joins the offsets back
  * and adds them to per-block local running sums, where the window is
  * partitioned by block and therefore scales horizontally.
  */
object DistributedPrefix {

  /** Value-range bucket of `v` in [lo, hi], 1-based, `n` buckets — the
    * standard monotone blocking key for [[runningSum]]. The `hi + 1`
    * upper bound keeps the top value inside bucket `n` (width_bucket
    * returns n+1 AT the upper bound) and makes the zero-width corner
    * (all values equal) well-defined. Skewed value ranges skew the
    * blocks, but bounded skew across n tasks still beats one global
    * task by construction. */
  def rangeBucket(v: Column, lo: Column, hi: Column, n: Int): Column =
    width_bucket(v.cast("double"), lo.cast("double"),
      (hi + 1).cast("double"), lit(n))

  /** Running sum of `value` over the global order (`localOrder` within
    * `block`-major order), independently per `groupCols` group when
    * groups are given (the per-group prefix — e.g. a cumulative weight
    * per return flag). `blockAsc` says whether ascending `block` values
    * correspond to the global sort direction. Emits the input columns
    * plus `out`; the internal `__blk`/`__offset` columns are dropped.
    *
    * PRECONDITION: `block` and every `groupCols` column must evaluate
    * non-null on every row — a null key would be silently dropped by the
    * internal equi-joins (no error, just missing rows). `rangeBucket`
    * over a non-null value with non-null bounds satisfies this. */
  def runningSum(
      df: DataFrame,
      block: Column,
      blockAsc: Boolean,
      localOrder: Seq[Column],
      value: Column,
      out: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val withB = df.withColumn("__blk", block)
    val keys = groupCols :+ "__blk"
    val blockSums = withB.groupBy(keys.map(col): _*).agg(sum(value).as("__bsum"))
    // Block offset = sum over same-group blocks strictly EARLIER in the
    // global order: a triangular left join over the tiny per-block frame
    // (≤ #groups × #buckets rows per side), not a partition-less window.
    val earlier =
      if (blockAsc) col("b.__blk") < col("a.__blk")
      else col("b.__blk") > col("a.__blk")
    val sameGroup = groupCols.map(g => col(s"a.$g") === col(s"b.$g"))
    val offsets = blockSums.as("a")
      .join(broadcast(blockSums.as("b")), (sameGroup :+ earlier).reduce(_ && _), "left")
      .groupBy(keys.map(k => col(s"a.$k").as(k)): _*)
      .agg(coalesce(sum(col("b.__bsum")), lit(0L)).as("__offset"))
    val wLocal = Window.partitionBy(keys.map(col): _*).orderBy(localOrder: _*)
    withB.join(broadcast(offsets), keys)
      .withColumn(out, sum(value).over(wLocal) + col("__offset"))
      .drop("__blk", "__offset")
  }

  /** EXCLUSIVE running max of `value` over the global order — the prefix
    * max over strictly earlier rows (null for the global first row),
    * which is the skyline/frontier primitive. Same two-pass shape as
    * [[runningSum]]: per-block maxima → triangular join for the
    * earlier-blocks max (null for the first block), then a block-local
    * exclusive-frame window; `greatest` combines the two (it ignores
    * nulls, so the identities fall out without sentinels).
    *
    * PRECONDITION: `block` must evaluate non-null on every row — a null
    * block key would be silently dropped by the internal equi-join. */
  def exclusiveRunningMax(
      df: DataFrame,
      block: Column,
      blockAsc: Boolean,
      localOrder: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    val withB = df.withColumn("__blk", block)
    val blockMax = withB.groupBy(col("__blk")).agg(max(value).as("__bmax"))
    val earlier =
      if (blockAsc) col("b.__blk") < col("a.__blk")
      else col("b.__blk") > col("a.__blk")
    val offsets = blockMax.as("a")
      .join(broadcast(blockMax.as("b")), earlier, "left")
      .groupBy(col("a.__blk").as("__blk"))
      .agg(max(col("b.__bmax")).as("__omax")) // null for the first block
    val wLocal = Window.partitionBy(col("__blk")).orderBy(localOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), "__blk")
      .withColumn(out, greatest(max(value).over(wLocal), col("__omax")))
      .drop("__blk", "__omax")
  }
}
