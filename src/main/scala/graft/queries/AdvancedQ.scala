package graft.queries

import graft._
import graft.ops.ColumnOps._
import org.apache.spark.sql.functions._

/** Second relational wave: the §2.2 rows beyond the first cut, each with
  * an explicit 100 TB note.
  */
object AdvancedQ {

  /** Right outer join (dim on the left so the RIGHT side is the fact —
    * planner should still broadcast the small side). */
  val jRightOuter: Q = Q(
    "j_right_outer",
    (spark, dir) => {
      val nation = Tables(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      nation.join(cust, col("n_nationkey") === col("c_nationkey"), "right")
        .select(col("c_custkey"), coalesce(col("n_name"), lit("?")).as("nation_name"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, COALESCE(n_name, '?') AS nation_name
           |FROM nation RIGHT JOIN customer ON n_nationkey = c_nationkey
           |ORDER BY c_custkey""".stripMargin))

  /** Exact percentiles over integer cents — linear interpolation on
    * exact integers is a fixed double chain, identical across engines.
    * At scale: single shuffle, sort-based percentile per group. */
  val aPercentile: Q = Q(
    "a_percentile",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(cents(col("l_extendedprice")), lit(0.5)).as("p50_cents"),
          percentile(cents(col("l_extendedprice")), lit(0.9)).as("p90_cents"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           | quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.5) AS p50_cents,
           | quantile_cont(CAST(round(l_extendedprice*100) AS BIGINT), 0.9) AS p90_cents,
           | COUNT(*) AS n
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Pivot (explicit value list => static schema, map-side combinable). */
  val gPivot: Q = Q(
    "g_pivot",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(cents(col("l_extendedprice"))))
        .na.fill(0L, Seq("F", "O"))
        .select(col("l_returnflag"), col("F").as("f_cents"), col("O").as("o_cents"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
           | CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_extendedprice*100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
           | CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_extendedprice*100) AS BIGINT) END), 0) AS BIGINT) AS o_cents
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Skew-mitigated join: 3 artificially hot keys, dim replicated x8 and
    * probe side salted, so no single task owns a hot key. Result is
    * provably identical to the unsalted join — which is what the oracle
    * runs. The 100 TB pattern when AQE skew-split isn't enough. */
  val jSkewSalted: Q = Q(
    "j_skew_salted",
    (spark, dir) => {
      val salts = 8
      val fact = Tables(spark, dir, "lineitem")
        .select(
          (col("l_orderkey") % 3).as("hot_key"),
          cents(col("l_extendedprice")).as("price_cents"),
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)).as("salt"))
      val dim = Tables(spark, dir, "region")
        .select((col("r_regionkey") % 3).as("hot_key"), col("r_name"))
        .crossJoin(spark.range(salts).select(col("id").cast("int").as("salt")))
      fact.join(dim, Seq("hot_key", "salt"))
        .groupBy(col("hot_key"), col("r_name"))
        .agg(count(lit(1)).as("n"), sum(col("price_cents")).as("sum_cents"))
        .orderBy("hot_key", "r_name")
    },
    Some("""SELECT l_orderkey % 3 AS hot_key, r_name,
           | COUNT(*) AS n,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
           |FROM lineitem JOIN region ON l_orderkey % 3 = r_regionkey % 3
           |GROUP BY 1, 2 ORDER BY hot_key, r_name""".stripMargin))

  /** Hive-style partitioned parquet sink + partition-pruned read-back:
    * the write path that makes 100 TB scans cheap (prune before IO). */
  val sinkPartitioned: Q = Q(
    "sink_partitioned",
    (spark, dir) => {
      val path = s"${sys.props("java.io.tmpdir")}/graft_sink_partitioned"
      Tables(spark, dir, "orders")
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      spark.read.parquet(path)
        .filter(col("o_orderstatus") === "F") // prunes to one directory
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders WHERE o_orderstatus = 'F'
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Column profiling (engine utility every pipeline needs before
    * touching 100 TB): ALL profiled columns in ONE aggregation pass —
    * rows/nulls/distincts/min/max per column as one wide row, exploded to
    * long format. N columns cost one scan, not N (the multi-distinct is
    * planned via Expand: rows×columns into partial aggs, still a single
    * pass over storage). Values are explicitly formatted (no raw casts)
    * so both engines print identically. */
  val qProfile: Q = Q(
    "q_profile",
    (spark, dir) => {
      val li = Tables(spark, dir, "lineitem")
      def nulls(c: org.apache.spark.sql.Column) = sum(when(c.isNull, 1L).otherwise(0L))
      val wide = li.agg(
        count(lit(1)).as("n_rows"),
        nulls(col("l_orderkey")).as("k_null"),
        countDistinct(col("l_orderkey")).as("k_nd"),
        min(col("l_orderkey")).cast("string").as("k_min"),
        max(col("l_orderkey")).cast("string").as("k_max"),
        nulls(col("l_returnflag")).as("f_null"),
        countDistinct(col("l_returnflag")).as("f_nd"),
        min(col("l_returnflag")).as("f_min"),
        max(col("l_returnflag")).as("f_max"),
        nulls(col("l_shipdate")).as("d_null"),
        countDistinct(col("l_shipdate")).as("d_nd"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("d_min"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("d_max"))
      def row(name: String, p: String) = struct(
        lit(name).as("col_name"), col("n_rows"),
        col(s"${p}_null").as("n_null"), col(s"${p}_nd").as("n_distinct"),
        col(s"${p}_min").as("min_s"), col(s"${p}_max").as("max_s"))
      wide.select(explode(array(
          row("l_orderkey", "k"), row("l_returnflag", "f"), row("l_shipdate", "d"))).as("r"))
        .select("r.*")
        .orderBy("col_name")
    },
    Some("""SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
           |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  COUNT(DISTINCT l_orderkey) AS n_distinct,
           |  CAST(MIN(l_orderkey) AS VARCHAR) AS min_s, CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_returnflag', COUNT(*),
           |  CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  COUNT(DISTINCT l_returnflag), MIN(l_returnflag), MAX(l_returnflag)
           |FROM lineitem
           |UNION ALL
           |SELECT 'l_shipdate', COUNT(*),
           |  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           |  COUNT(DISTINCT l_shipdate),
           |  strftime(MIN(l_shipdate), '%Y-%m-%d'), strftime(MAX(l_shipdate), '%Y-%m-%d')
           |FROM lineitem
           |ORDER BY col_name""".stripMargin))

  /** first/last/nth_value analytic window functions (full frame for
    * last/nth so the answer is frame-independent and engine-agnostic). */
  val wFirstLast: Q = Q(
    "w_first_last",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables(spark, dir, "orders")
        .select(
          col("o_orderkey"), col("o_orderstatus"),
          first(col("o_orderkey")).over(wFull).as("first_key"),
          last(col("o_orderkey")).over(wFull).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
           | first_value(o_orderkey) OVER w AS first_key,
           | last_value(o_orderkey) OVER w AS last_key,
           | nth_value(o_orderkey, 2) OVER w AS second_key
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           |ORDER BY o_orderkey""".stripMargin))

  /** Bucketed co-located join: both sides written bucketed+sorted on the
    * join key (external tables, data in tmp), so the join runs with NO
    * exchange on either side — the bucketing strategy that amortizes one
    * shuffle across every future join at 100 TB. Result must equal the
    * plain parquet join (the oracle). */
  /** j_bucketed's cross-session layout root, keyed on dir tag + content
    * fingerprints of BOTH source tables (reaps superseded layouts).
    * private[graft]: PlanAuditSpec derives the path from here instead of
    * hand-copying the key format. */
  private[graft] def bucketedBase(dir: String): String =
    Fixtures.fingerprintedPath(
      s"${sys.props("java.io.tmpdir")}/graft_bucketed${dir.replaceAll("[^A-Za-z0-9]", "_")}",
      Seq(s"$dir/lineitem.parquet", s"$dir/orders.parquet"))

  val jBucketed: Q = Q(
    "j_bucketed",
    (spark, dir) => {
      // Bucket layouts are written ONCE per source dir and reused across
      // SESSIONS — the whole point of bucketing is paying the layout
      // shuffle once per dataset and joining exchange-free forever after.
      // A fresh session finds the files already on disk (bucket ids ride
      // in the file names) and just registers an external table over them;
      // the in-memory catalog alone can't carry the layout across JVMs.
      // Path AND catalog table name carry a content fingerprint of the
      // source tables: regenerating the testdata dir in place changes the
      // fingerprint, so the stale bucketed layout is abandoned and reaped
      // (its catalog entry, if any, points nowhere and is never used —
      // re-registration keys on the new name).
      val base = bucketedBase(dir)
      val dirTag = base.substring(base.lastIndexOf("graft_bucketed") + "graft_bucketed".length)
      def bucketize(name: String, df: => org.apache.spark.sql.DataFrame,
          key: String, ddl: String): String = {
        val table = s"graft_b_${name}$dirTag"
        if (!spark.catalog.tableExists(table)) {
          val path = new org.apache.hadoop.fs.Path(s"$base/$name")
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
            spark.sql(
              s"""CREATE TABLE $table ($ddl) USING parquet
                 |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                 |LOCATION '${fs.makeQualified(path)}'""".stripMargin)
          } else {
            df.write.mode("overwrite")
              .bucketBy(8, key).sortBy(key)
              .option("path", s"$base/$name")
              .saveAsTable(table)
          }
        }
        table
      }
      val li = bucketize("lineitem", Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), cents(col("l_extendedprice")).as("price_cents")),
        "l_orderkey", "l_orderkey BIGINT, price_cents BIGINT")
      val o = bucketize("orders", Tables(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        "o_orderkey", "o_orderkey BIGINT, o_orderpriority STRING")
      spark.table(li)
        .join(spark.table(o).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("price_cents")).as("revenue_cents"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_items,
           | CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Unpivot/melt (inverse of g_pivot): wide per-flag measures back to
    * long (measure, value) rows via Dataset.unpivot — a Generate, purely
    * narrow after the aggregation. */
  val gUnpivot: Q = Q(
    "g_unpivot",
    (spark, dir) =>
      Tables(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          sum(col("l_quantity").cast("long")).as("qty"),
          count(lit(1)).as("n"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("price_cents"), col("qty"), col("n")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"),
    Some("""WITH a AS (SELECT l_returnflag,
           |   CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
           |   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           |   COUNT(*) AS n
           | FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, measure, value FROM (
           | SELECT l_returnflag, 'price_cents' AS measure, price_cents AS value FROM a
           | UNION ALL SELECT l_returnflag, 'qty', qty FROM a
           | UNION ALL SELECT l_returnflag, 'n', n FROM a)
           |ORDER BY l_returnflag, measure""".stripMargin))

  /** Dynamic partition pruning: fact partitioned on o_year, dim filtered
    * at runtime — the scan's PartitionFilters gains a
    * dynamicpruningexpression, so only the matching year directories are
    * read. THE mechanism that turns a 100 TB partitioned-fact join into a
    * 1-partition read (PlanAuditSpec pins the plan shape). */
  val jDpp: Q = Q(
    "j_dpp",
    (spark, dir) => {
      val dirTag = dir.replaceAll("[^A-Za-z0-9]", "_")
      // tmp path keyed on a content fingerprint of the source table, so a
      // regenerated testdata dir invalidates (and reaps) the cached layout
      val path = Fixtures.fingerprintedPath(
        s"${sys.props("java.io.tmpdir")}/graft_dpp$dirTag",
        Seq(s"$dir/orders.parquet"))
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        Tables(spark, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("int"))
          .write.mode("overwrite").partitionBy("o_year").parquet(path)
      }
      // Dim must be a REAL scan with a selective Filter node (a literal
      // local relation gets constant-folded and DPP sees no predicate):
      // region(0..4) → years 1994..1998, filtered to two names.
      val dim = Tables(spark, dir, "region")
        .filter(col("r_name").isin("ASIA", "AMERICA"))
        .select((lit(1994) + col("r_regionkey")).cast("int").as("d_year"))
      spark.read.parquet(path)
        .join(broadcast(dim), col("o_year") === col("d_year"))
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS o_year, COUNT(*) AS n,
           | CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
           |FROM orders JOIN region
           |  ON year(o_orderdate) = 1994 + r_regionkey
           | AND r_name IN ('ASIA', 'AMERICA')
           |GROUP BY 1 ORDER BY o_year""".stripMargin))

  val all: Seq[Q] = Seq(jRightOuter, aPercentile, gPivot, jSkewSalted, sinkPartitioned,
    qProfile, wFirstLast, jBucketed, gUnpivot, jDpp)
}
