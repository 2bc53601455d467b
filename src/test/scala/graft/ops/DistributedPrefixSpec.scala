package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedPrefix vs the naive single-partition window it replaces:
  * the two must agree row-for-row on every input shape, including the
  * corners the range blocking could get wrong — ties on the order key
  * (must never split across blocks), all-equal values (one degenerate
  * block), descending order, negative values, and a single row.
  */
class DistributedPrefixSpec extends SparkSpec {

  import spark.implicits._

  /** (key, v) rows; key is the unique tiebreak, v the blocked sort value. */
  private def df(rows: Seq[(Long, Long)]): DataFrame =
    rows.toDF("key", "v").repartition(4)

  private def withBounds(d: DataFrame): DataFrame =
    d.crossJoin(broadcast(d.agg(min(col("v")).as("blo"), max(col("v")).as("bhi"))))

  private def checkSum(rows: Seq[(Long, Long)], asc: Boolean, buckets: Int): Unit = {
    val base = withBounds(df(rows))
    val order = if (asc) Seq(col("v"), col("key")) else Seq(col("v").desc, col("key"))
    val got = DistributedPrefix.runningSum(
        base, DistributedPrefix.rangeBucket(col("v"), col("blo"), col("bhi"), buckets),
        blockAsc = asc, localOrder = order, value = col("v"), out = "cum")
      .select(col("key"), col("cum")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.orderBy(order: _*)
    val want = df(rows).withColumn("cum", sum(col("v")).over(w))
      .select(col("key"), col("cum")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, s"runningSum(asc=$asc, buckets=$buckets) diverged on $rows")
  }

  private def checkMax(rows: Seq[(Long, Long)], buckets: Int): Unit = {
    val base = withBounds(df(rows))
    val order = Seq(col("v"), col("key"))
    val got = DistributedPrefix.exclusiveRunningMax(
        base, DistributedPrefix.rangeBucket(col("v"), col("blo"), col("bhi"), buckets),
        blockAsc = true, localOrder = order, value = col("v"), out = "pmax")
      .select(col("key"), col("pmax")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val w = Window.orderBy(order: _*).rowsBetween(Window.unboundedPreceding, -1)
    val want = df(rows).withColumn("pmax", max(col("v")).over(w))
      .select(col("key"), col("pmax")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want, s"exclusiveRunningMax(buckets=$buckets) diverged on $rows")
  }

  private val rnd = new scala.util.Random(42)

  test("running sum matches the global window on random data, asc and desc") {
    for (_ <- 1 to 5) {
      val rows = (1L to 200L).map(k => k -> (rnd.nextInt(1000).toLong - 500))
      checkSum(rows, asc = true, buckets = 16)
      checkSum(rows, asc = false, buckets = 16)
    }
  }

  test("ties on the sort value never split across blocks") {
    // many keys share each v: block assignment is a function of v alone,
    // so all ties land in one block and the key tiebreak orders them
    val rows = (1L to 300L).map(k => k -> (k % 7))
    checkSum(rows, asc = true, buckets = 64)
    checkMax(rows, buckets = 64)
  }

  test("degenerate shapes: all-equal values, single row, two rows") {
    checkSum((1L to 50L).map(_ -> 5L), asc = true, buckets = 8)
    checkSum(Seq(1L -> 42L), asc = true, buckets = 8)
    checkSum(Seq(1L -> 2L, 2L -> 1L), asc = false, buckets = 8)
    checkMax((1L to 50L).map(_ -> 5L), buckets = 8)
    checkMax(Seq(1L -> 42L), buckets = 8)
  }

  test("more buckets than distinct values still partitions correctly") {
    val rows = (1L to 40L).map(k => k -> (k % 3))
    checkSum(rows, asc = true, buckets = 256)
    checkMax(rows, buckets = 256)
  }

  test("grouped running sum matches the per-group window") {
    val rows = (1L to 300L).map(k => (k, rnd.nextInt(100).toLong - 50, s"g${k % 4}"))
    val d = rows.toDF("key", "v", "grp").repartition(4)
    val base = d.crossJoin(broadcast(
      d.agg(min(col("v")).as("blo"), max(col("v")).as("bhi"))))
    val got = DistributedPrefix.runningSum(
        base, DistributedPrefix.rangeBucket(col("v"), col("blo"), col("bhi"), 16),
        blockAsc = true, localOrder = Seq(col("v"), col("key")), value = col("v"),
        out = "cum", groupCols = Seq("grp"))
      .select(col("key"), col("cum")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = Window.partitionBy(col("grp")).orderBy(col("v"), col("key"))
    val want = d.withColumn("cum", sum(col("v")).over(w))
      .select(col("key"), col("cum")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, "grouped runningSum diverged from the per-group window")
  }

  test("no internal __blk/__offset column leaks into the output schema") {
    val base = withBounds(df(Seq(1L -> 3L, 2L -> 1L, 3L -> 2L)))
    val sumCols = DistributedPrefix.runningSum(
      base, DistributedPrefix.rangeBucket(col("v"), col("blo"), col("bhi"), 4),
      blockAsc = true, localOrder = Seq(col("v"), col("key")), value = col("v"),
      out = "cum").columns.toSet
    val maxCols = DistributedPrefix.exclusiveRunningMax(
      base, DistributedPrefix.rangeBucket(col("v"), col("blo"), col("bhi"), 4),
      blockAsc = true, localOrder = Seq(col("v"), col("key")), value = col("v"),
      out = "pmax").columns.toSet
    for (c <- Seq("__blk", "__offset", "__omax", "__bsum", "__bmax")) {
      assert(!sumCols.contains(c), s"runningSum leaks internal column $c")
      assert(!maxCols.contains(c), s"exclusiveRunningMax leaks internal column $c")
    }
  }
}
