package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall/cost curves: for each approximate similarity path
  * (sim_lsh_bucket, sim_ivf_topk, sim_sq8_topk, sim_pq_topk), measure
  * recall@k against the exact quantized-cosine ranking
  * (sim_topk_cosine's discipline) and the candidates-scanned-per-query
  * cost that bought it. This is the planning readout for sizing an ANN
  * index at scale: LSH/IVF prune candidates (recall bounded by bucket
  * collisions / probe coverage), SQ8/PQ scan everything but compress the
  * per-candidate arithmetic (recall bounded by quantization error).
  *
  * Usage: sbt "runMain graft.tools.AnnProbe [sfDir ...]"
  * (default /root/testdata/sf0.1). Results recorded in SCALE.md.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) probe(spark, dir)
    spark.stop()
  }

  private def collectTopk(df: DataFrame): Map[Long, Seq[Long]] =
    df.select(col("q_id"), col("rn"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
      }

  private def probe(spark: SparkSession, dir: String): Unit = {
    val n = graft.Tables(spark, dir, "embeddings").count()
    // exact ranking, k=5 (superset of every variant's k), same micro
    // rounding + neighbor_id tiebreak as the oracle-checked queries
    val exact = collectTopk(graft.SparkEntry.queries("sim_topk_cosine")(spark, dir))
    val nq = exact.size

    // candidate counts per variant (average per query)
    val base = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x.cast("double") * 1000).cast("long")).as("qv"))
    val bucketed = base.withColumn("bucket",
      aggregate(
        zip_with(slice(col("qv"), 1, 6),
          array((0 until 6).map(i => lit(1L << i)): _*),
          (x, w) => when(x > 0, w).otherwise(0L)),
        lit(0L), (acc, x) => acc + x))
    val hist = bucketed.groupBy("bucket").agg(count(lit(1)).as("bn"))
    val lshCand = bucketed.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
      .join(hist, "bucket")
      .agg(sum(col("bn") - 1)).head.getLong(0).toDouble / nq
    // IVF: nprobe=2 of 16 cells; true candidate count = the probed
    // cells' inverted-list sizes (re-derived with the query's own
    // assignment discipline)
    val ivfCand = {
      val bn = base.withColumn("n2", graft.functions.vec_dot_long(col("qv"), col("qv")))
      val cent = bn.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("qv").as("cv"), col("n2").as("cn2"))
      val aff = bn.crossJoin(broadcast(cent))
        .withColumn("a",
          round(graft.functions.vec_dot_long(col("qv"), col("cv")).cast("double") /
            sqrt(col("n2").cast("double") * col("cn2").cast("double")) * 1000000).cast("long"))
      val assign = aff.groupBy(col("vec_id"))
        .agg(max(struct(col("a"), (-col("c_id")).as("neg_cid"))).as("m"))
        .select(col("vec_id"), (-col("m.neg_cid")).cast("long").as("cell"))
      val cellHist = assign.groupBy("cell").agg(count(lit(1)).as("cn"))
      val wAff = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("a").desc, col("c_id"))
      val probes = aff.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
        .withColumn("rnk", row_number().over(wAff)).filter(col("rnk") <= 2)
        .select(col("vec_id").as("q_id"), col("c_id").cast("long").as("cell"))
      probes.join(cellHist, "cell").agg(sum(col("cn"))).head.getLong(0).toDouble / nq
    }
    val full = (n - 1).toDouble

    val variants = Seq(
      ("sim_lsh_bucket", 3, lshCand),
      ("sim_ivf_topk", 3, ivfCand),
      ("sim_sq8_topk", 5, full),
      ("sim_pq_topk", 5, full))
    println(f"== AnnProbe $dir (n=$n, queries=$nq) — recall vs candidates/query ==")
    println(f"${"variant"}%-16s ${"k"}%3s ${"recall@k"}%9s ${"cand/query"}%12s ${"vs brute"}%9s")
    for ((name, k, cand) <- variants) {
      val approx = collectTopk(graft.SparkEntry.queries(name)(spark, dir))
      val recalls = exact.toSeq.map { case (q, ex) =>
        val want = ex.take(k).toSet
        val got = approx.getOrElse(q, Nil).take(k).toSet
        (want & got).size.toDouble / k
      }
      val recall = recalls.sum / recalls.size
      println(f"$name%-16s $k%3d $recall%9.3f ${cand}%12.0f ${cand / full * 100}%8.1f%%")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
  }
}
