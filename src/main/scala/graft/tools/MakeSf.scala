package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a consistent f× scale-up of the sf0.1 testdata into
  * /tmp/graft_sf<f> for the one-decade scaling probe (BASELINE.md): every
  * table is replicated f-fold with its keys remapped as `key*f + copy`,
  * USING THE SAME copy index on both sides of every foreign key — so
  * customer/orders, orders/lineitem, part/lineitem, supplier/lineitem
  * join distributions (fan-outs, match rates, skew) are preserved
  * exactly while row counts and key cardinalities grow f-fold. Dims
  * (region, nation) stay fixed, as they do across real TPC-H scale
  * factors. Document texts are uniquified per copy (dedup collapse stays
  * realistic); embedding copies land at vec_id ≥ 2000 so the fixed query
  * cohort (vec_id < 2000) stays the original 80 vectors while the
  * searched base grows f-fold — same convention as ScaleProbe.
  *
  * Run: `sbt "runMain graft.tools.MakeSf [f]"` (default 10 ≈ sf1).
  */
object MakeSf {
  def main(args: Array[String]): Unit = {
    val f = args.headOption.map(_.toInt).getOrElse(10)
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"/tmp/graft_sf$f"
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC") // NTZ events normalize tz-free
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // key columns to remap as key*f + copy, per table
    val keyCols: Map[String, Seq[String]] = Map(
      "region" -> Nil, "nation" -> Nil,
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Nil) // special-cased below

    graft.Tables.names.foreach { name =>
      val dest = s"$out/$name.parquet"
      if (!new java.io.File(s"$dest/_SUCCESS").exists()) {
        val base = graft.Tables(spark, src, name)
        val scaled: DataFrame =
          if (keyCols(name).isEmpty && name != "embeddings") base // fixed dims
          else {
            val rep = base.crossJoin(spark.range(f).select(col("id").as("copy")))
            val remapped = name match {
              case "embeddings" =>
                rep.withColumn("vec_id", col("vec_id") + col("copy") * 2000L)
              case "documents" =>
                keyCols(name).foldLeft(
                  rep.withColumn("text", concat(col("text"), lit(" uniq"), col("copy")))
                )((d, k) => d.withColumn(k, col(k) * f + col("copy")))
              case _ =>
                keyCols(name).foldLeft(rep)(
                  (d, k) => d.withColumn(k, col(k) * f + col("copy")))
            }
            remapped.drop("copy").repartition(32)
          }
        scaled.write.mode("overwrite").parquet(dest)
        println(s"[makesf] $name -> $dest")
      }
    }
    spark.stop()
  }
}
