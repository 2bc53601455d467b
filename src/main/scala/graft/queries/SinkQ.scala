package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Storage-layout operators: ORC interchange, sort-clustered parquet for
  * row-group skipping, and snapshot merge (upsert-by-rewrite) — the three
  * layout moves a parquet-lake engine needs at 100 TB.
  */
object SinkQ {

  private[graft] def tmp(name: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  // Amortized layout writes key their tmp path on a content fingerprint
  // of the source, so regenerating the testdata under the SAME path
  // invalidates the cached layout (and reaps the superseded one) instead
  // of silently reusing stale data.
  private[graft] def keyed(prefix: String, source: String): String =
    Fixtures.fingerprintedPath(prefix, Seq(source))

  /** ORC write + read-back (columnar interchange beyond parquet; same
    * vectorized reader + predicate pushdown machinery). */
  val scanOrc: Q = Q(
    "scan_orc",
    (spark, dir) => {
      val path = tmp("scan_orc", dir)
      Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), cents(col("o_totalprice")).as("price_cents"))
        .write.mode("overwrite").orc(path)
      spark.read.orc(path)
        .filter(col("o_orderstatus") =!= "P")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("total_cents"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders WHERE o_orderstatus <> 'P'
           |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin))

  /** Sort-clustered parquet: range-repartition + sortWithinPartitions on
    * l_shipdate before writing, so every row group covers a narrow
    * shipdate band and the read-back range filter prunes most row groups
    * via parquet min/max stats (PushedFilters does the skipping). The
    * lakehouse clustering move — without it a 100 TB scan reads every
    * row group no matter how selective the predicate. */
  val sinkClustered: Q = Q(
    "sink_clustered",
    (spark, dir) => {
      val path = keyed(tmp("sink_clustered", dir), s"$dir/lineitem.parquet")
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"), cents(col("l_extendedprice")).as("price_cents"))
          .repartitionByRange(8, col("l_shipdate"))
          .sortWithinPartitions(col("l_shipdate"))
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
        .filter(col("l_shipdate").between("1996-03-01", "1996-03-31"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("day_cents"))
        .orderBy("ship_day")
    },
    Some("""SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_day, COUNT(*) AS n,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS day_cents
           |FROM lineitem
           |WHERE l_shipdate BETWEEN TIMESTAMP '1996-03-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'
           |GROUP BY 1 ORDER BY ship_day""".stripMargin))

  /** Snapshot merge / upsert-by-rewrite: updates win over the base
    * snapshot via full outer join + coalesce — the parquet-lake MERGE
    * pattern (rewrite the joined result as the new snapshot). Shuffles
    * only on the key; at 100 TB with a partitioned snapshot this joins
    * per-partition and rewrites only partitions that received updates.
    * Synthesized insert keys sit at +1e10 — above any realistic orderkey
    * (sf1 reaches 6M, sf1000 ~6B) so inserts can't collide with snapshot
    * keys; the ORDER BY includes status+price so row order stays total
    * even if a tie ever appeared. */
  val sinkUpsert: Q = Q(
    "sink_upsert",
    (spark, dir) => {
      val snap = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), cents(col("o_totalprice")).as("price_cents"),
          col("o_orderstatus").as("status"))
      val updates = Tables(spark, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), (cents(col("o_totalprice")) * 2).as("price_cents"),
          lit("U").as("status"))
        .unionAll(
          Tables(spark, dir, "orders")
            .filter(col("o_orderkey") % 97 === 0)
            .select((col("o_orderkey") + 10000000000L).as("k"),
              cents(col("o_totalprice")).as("price_cents"), lit("I").as("status")))
      val merged = snap.as("s")
        .join(updates.as("u"), col("s.k") === col("u.k"), "full")
        .select(
          coalesce(col("u.k"), col("s.k")).as("k"),
          coalesce(col("u.price_cents"), col("s.price_cents")).as("price_cents"),
          coalesce(col("u.status"), col("s.status")).as("status"))
      val path = tmp("sink_upsert", dir)
      merged.write.mode("overwrite").parquet(path) // the rewritten snapshot
      spark.read.parquet(path).orderBy("k", "status", "price_cents")
    },
    Some("""WITH snap AS (SELECT o_orderkey AS k, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, o_orderstatus AS status FROM orders),
           |upd AS (
           |  SELECT o_orderkey AS k, CAST(round(o_totalprice*100) AS BIGINT)*2 AS price_cents, 'U' AS status
           |  FROM orders WHERE o_orderkey % 7 = 0
           |  UNION ALL
           |  SELECT o_orderkey + 10000000000 AS k, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents, 'I' AS status
           |  FROM orders WHERE o_orderkey % 97 = 0)
           |SELECT COALESCE(u.k, s.k) AS k,
           |  COALESCE(u.price_cents, s.price_cents) AS price_cents,
           |  COALESCE(u.status, s.status) AS status
           |FROM snap s FULL JOIN upd u ON s.k = u.k
           |ORDER BY k, status, price_cents""".stripMargin))

  /** Z-order clustered parquet: interleave the bits of the two predicate
    * columns (shipdate day-number, partkey low bits) into one sort key so
    * row groups are localized in BOTH dimensions — the multi-dim
    * clustering move (Delta/Iceberg OPTIMIZE ZORDER) where 1-D sort
    * clustering ([[sinkClustered]]) only helps its leading column. The
    * z-value is a pure bit-interleave column expression (codegen'd, no
    * UDF); read-back filters on both dimensions and aggregates. At 100 TB
    * the write is one range-repartition by z-value; every two-dim
    * selective scan after it prunes row groups on either predicate. */
  val sinkZorder: Q = Q(
    "sink_zorder",
    (spark, dir) => {
      val day = datediff(col("l_shipdate"),
        lit("1992-01-01").cast("date")).cast("long") // fits 12 bits
      val pk = pmod(col("l_partkey"), lit(4096L))    // low 12 bits
      val z = (0 until 12).map { i =>
        val dBit = shiftleft(shiftright(day, i).bitwiseAND(1L), 2 * i + 1)
        val pBit = shiftleft(shiftright(pk, i).bitwiseAND(1L), 2 * i)
        dBit.bitwiseOR(pBit)
      }.reduce(_.bitwiseOR(_))
      val path = keyed(tmp("sink_zorder", dir), s"$dir/lineitem.parquet")
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_shipdate"),
            cents(col("l_extendedprice")).as("price_cents"), z.as("zval"))
          .repartitionByRange(8, col("zval"))
          .sortWithinPartitions(col("zval"))
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
        .filter(col("l_shipdate").between("1995-01-01", "1995-06-30")
          && col("l_partkey") < 500)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("month_cents"))
        .orderBy("ship_month")
    },
    Some("""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, COUNT(*) AS n,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS month_cents
           |FROM lineitem
           |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1995-06-30 00:00:00'
           |  AND l_partkey < 500
           |GROUP BY 1 ORDER BY ship_month""".stripMargin))

  /** Snapshot diff — the CDC classifier between two table versions:
    * full outer join on the key, every row labeled added / removed /
    * changed / unchanged by null-side and payload comparison. This is
    * the read side of [[sinkUpsert]]'s MERGE (what changed between
    * yesterday's and today's snapshot?) and the audit every incremental
    * pipeline needs. One key-partitioned join is the whole cost; payload
    * comparison is a null-safe equality on the projected columns (here
    * the cents-exact price), so at 100 TB the diff shuffles keys +
    * compared columns only. Versions are synthesized deterministically
    * from orders: v1 lacks key%3==0 rows (absent from v1, present in v2
    * → "added"), v2 lacks key%5==0 ("removed") and reprices key%7==0
    * ("changed"); everything else is "unchanged". */
  val xSnapshotDiff: Q = Q(
    "x_snapshot_diff",
    (spark, dir) => {
      val base = Tables(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), cents(col("o_totalprice")).as("p"))
      val v1 = base.filter(col("k") % 3 =!= 0)
      val v2 = base.filter(col("k") % 5 =!= 0)
        .select(col("k"),
          when(col("k") % 7 === 0, col("p") + 1).otherwise(col("p")).as("p"))
      v1.as("a").join(v2.as("b"), col("a.k") === col("b.k"), "full")
        .select(
          when(col("a.k").isNull, "added")
            .when(col("b.k").isNull, "removed")
            .when(col("a.p") =!= col("b.p"), "changed")
            .otherwise("unchanged").as("change_type"),
          coalesce(col("b.p"), col("a.p")).as("p"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("p")).as("sum_price_cents"))
        .orderBy(col("change_type"))
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey AS k, CAST(round(o_totalprice*100) AS BIGINT) AS p
           |  FROM orders),
           |v1 AS (SELECT * FROM base WHERE k % 3 <> 0),
           |v2 AS (SELECT k, CASE WHEN k % 7 = 0 THEN p + 1 ELSE p END AS p
           |       FROM base WHERE k % 5 <> 0),
           |d AS (
           |  SELECT CASE WHEN a.k IS NULL THEN 'added'
           |              WHEN b.k IS NULL THEN 'removed'
           |              WHEN a.p <> b.p THEN 'changed'
           |              ELSE 'unchanged' END AS change_type,
           |         COALESCE(b.p, a.p) AS p
           |  FROM v1 a FULL JOIN v2 b ON a.k = b.k)
           |SELECT change_type, COUNT(*) AS n,
           |       CAST(SUM(p) AS BIGINT) AS sum_price_cents
           |FROM d GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(scanOrc, sinkClustered, sinkUpsert, sinkZorder, xSnapshotDiff)
}
