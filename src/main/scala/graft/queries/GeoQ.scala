package graft.queries

import graft._
import org.apache.spark.sql.functions._

/** Spatial-style proximity join (round 6): grid-cell blocking — the
  * standard distributed pattern for "nearest point" / "points within
  * radius" workloads (geohash/S2/H3 all reduce to it). Coordinates here
  * are synthesized deterministically from keys with LCG-style integer
  * arithmetic (the testdata has no native lat/lon), so both engines
  * derive identical point sets and the math stays exact-integer end to
  * end — the pattern under test is the JOIN SHAPE, not the trig.
  */
object GeoQ {

  /** Nearest supplier per customer, grid-blocked: hash every point into a
    * 1000×1000-unit cell, explode each customer to its 3×3 neighbor
    * cells, equi-join on cell id, then take the min squared distance via
    * one argmin agg (max of inverted struct — map-side partial, no
    * window). The equi-join on cell replaces the all-pairs cross product:
    * candidate count per customer is bounded by cell density, so the plan
    * is linear in points at fixed density — the property that survives
    * 100 TB. Radius contract: nearest within the adjacent-cell
    * neighborhood (≥1 full cell width in every direction); customers
    * with no supplier in range are dropped (inner join), exactly like a
    * bounded-radius kNN. Cohort bounded to 300 customers so the oracle
    * stays cheap; the shape is cohort-size-independent. */
  val jGeoGrid: Q = Q(
    "j_geo_grid",
    (spark, dir) => {
      val cell = 1000L
      // LCG-ish deterministic coordinates in [0, 10000)
      val cust = Tables(spark, dir, "customer")
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey"),
          (col("c_custkey") * 48271L % 10000L).as("cx"),
          (col("c_custkey") * 16807L % 10000L).as("cy"))
      val supp = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"),
          (col("s_suppkey") * 69621L % 10000L).as("sx"),
          (col("s_suppkey") * 40692L % 10000L).as("sy"))
        .withColumn("cell_x", col("sx").divide(cell).cast("long"))
        .withColumn("cell_y", col("sy").divide(cell).cast("long"))
      val custCells = cust
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("cell_x", (col("cx").divide(cell).cast("long")) + col("dx"))
        .withColumn("cell_y", (col("cy").divide(cell).cast("long")) + col("dy"))
      custCells.join(supp, Seq("cell_x", "cell_y"))
        .withColumn("d2",
          (col("cx") - col("sx")) * (col("cx") - col("sx")) +
            (col("cy") - col("sy")) * (col("cy") - col("sy")))
        .groupBy(col("c_custkey"))
        // argmin via max of inverted struct: partial-aggregatable, unlike
        // a row_number window which would shuffle every candidate pair
        .agg(max(struct((-col("d2")).as("neg_d2"), (-col("s_suppkey")).as("neg_sk")))
          .as("best"))
        .select(col("c_custkey"),
          (-col("best.neg_sk")).as("s_suppkey"),
          (-col("best.neg_d2")).as("dist_sq"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, (c_custkey * 48271) % 10000 AS cx,
           |         (c_custkey * 16807) % 10000 AS cy
           |  FROM customer WHERE c_custkey <= 300),
           |supp AS (
           |  SELECT s_suppkey, (s_suppkey * 69621) % 10000 AS sx,
           |         (s_suppkey * 40692) % 10000 AS sy
           |  FROM supplier),
           |cand AS (
           |  SELECT c.c_custkey, s.s_suppkey,
           |         (c.cx - s.sx)*(c.cx - s.sx) + (c.cy - s.sy)*(c.cy - s.sy) AS d2
           |  FROM cust c JOIN supp s
           |    ON (s.sx // 1000) BETWEEN (c.cx // 1000) - 1 AND (c.cx // 1000) + 1
           |   AND (s.sy // 1000) BETWEEN (c.cy // 1000) - 1 AND (c.cy // 1000) + 1),
           |sel AS (
           |  SELECT c_custkey, s_suppkey, d2,
           |         row_number() OVER (PARTITION BY c_custkey
           |           ORDER BY d2, s_suppkey) AS rn
           |  FROM cand)
           |SELECT c_custkey, CAST(s_suppkey AS BIGINT) AS s_suppkey,
           |       CAST(d2 AS BIGINT) AS dist_sq
           |FROM sel WHERE rn = 1 ORDER BY c_custkey""".stripMargin))

  /** Radius count ("points near me"): suppliers within a fixed squared
    * radius of each customer point, counted per customer — the density
    * query form of the same grid block. Because the radius (700) is
    * under the cell width (1000), the 3×3 neighborhood provably contains
    * every in-radius point: the blocking is EXACT, not approximate —
    * the same guarantee a production geo-join derives from its cell
    * size. Customers with zero in-range suppliers are kept at n=0 via
    * the left join, mirroring how a coverage report must not drop empty
    * localities. */
  val jGeoRadius: Q = Q(
    "j_geo_radius",
    (spark, dir) => {
      val r2 = 700L * 700L
      val cust = Tables(spark, dir, "customer")
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey"),
          (col("c_custkey") * 48271L % 10000L).as("cx"),
          (col("c_custkey") * 16807L % 10000L).as("cy"))
      val supp = Tables(spark, dir, "supplier")
        .select(col("s_suppkey"),
          (col("s_suppkey") * 69621L % 10000L).as("sx"),
          (col("s_suppkey") * 40692L % 10000L).as("sy"))
        .withColumn("cell_x", col("sx").divide(1000).cast("long"))
        .withColumn("cell_y", col("sy").divide(1000).cast("long"))
      val hits = cust
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("cell_x", (col("cx").divide(1000).cast("long")) + col("dx"))
        .withColumn("cell_y", (col("cy").divide(1000).cast("long")) + col("dy"))
        .join(supp, Seq("cell_x", "cell_y"))
        .filter((col("cx") - col("sx")) * (col("cx") - col("sx")) +
          (col("cy") - col("sy")) * (col("cy") - col("sy")) <= r2)
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_near"))
      cust.select(col("c_custkey"))
        .join(hits, Seq("c_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("n_near"), lit(0L)).as("n_near"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH cust AS (
           |  SELECT c_custkey, (c_custkey * 48271) % 10000 AS cx,
           |         (c_custkey * 16807) % 10000 AS cy
           |  FROM customer WHERE c_custkey <= 300),
           |supp AS (
           |  SELECT s_suppkey, (s_suppkey * 69621) % 10000 AS sx,
           |         (s_suppkey * 40692) % 10000 AS sy
           |  FROM supplier),
           |hits AS (
           |  SELECT c.c_custkey, COUNT(*) AS n_near
           |  FROM cust c JOIN supp s
           |    ON (c.cx - s.sx)*(c.cx - s.sx) + (c.cy - s.sy)*(c.cy - s.sy) <= 490000
           |  GROUP BY 1)
           |SELECT c.c_custkey, CAST(COALESCE(h.n_near, 0) AS BIGINT) AS n_near
           |FROM cust c LEFT JOIN hits h ON c.c_custkey = h.c_custkey
           |ORDER BY c.c_custkey""".stripMargin))

  val all: Seq[Q] = Seq(jGeoGrid, jGeoRadius)
}
