package graft

/** sim_pq_topk against a straight-line reference model: the DataFrame
  * formulation (explode → broadcast codebook join → min(struct) encode →
  * LUT join → sum → window top-5) must equal a direct sequential
  * computation of the same PQ/ADC chain. The DuckDB oracle already pins
  * Spark↔DuckDB agreement; this pins both against an implementation
  * with no relational machinery at all, so a shared misreading of the
  * spec (e.g. a tie-break or slice off-by-one mirrored into the SQL)
  * can't survive.
  */
class PqModelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("relational PQ/ADC equals the sequential model") {
    val vecs: Map[Long, Array[Long]] = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> cast(round(cast(x as double) * 1000) as long)) AS qv")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    def sub(v: Array[Long], s: Int): Array[Long] = v.slice(s * 8, s * 8 + 8)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum

    val cbIds = vecs.keys.filter(id => id % 13 == 0 && id < 2000).toSeq.sorted
    // cw(s)(j): codeword j of subspace s, j = vec_id / 13
    val cw: Map[(Int, Long), Array[Long]] = (for {
      id <- cbIds; s <- 0 until 8
    } yield (s, id / 13) -> sub(vecs(id), s)).toMap

    def encode(v: Array[Long], s: Int): Long = {
      val sv = sub(v, s)
      cbIds.map(_ / 13).map { j =>
        val c = cw((s, j))
        (dot(c, c) - 2 * dot(sv, c), j)
      }.min._2 // lexicographic: smallest distance, then smallest j
    }

    val qIds = vecs.keys.filter(id => id % 25 == 0 && id < 2000).toSeq.sorted
    val expected = qIds.flatMap { q =>
      val scored = vecs.keys.filter(_ != q).toSeq.map { x =>
        val adc = (0 until 8).map(s => dot(sub(vecs(q), s), cw((s, encode(vecs(x), s))))).sum
        (x, adc)
      }
      scored.sortBy { case (x, adc) => (-adc, x) }.take(5).zipWithIndex.map {
        case ((x, adc), i) => (q, (i + 1).toLong, x, adc)
      }
    }.toSet

    val actual = SparkEntry.queries("sim_pq_topk")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(actual == expected,
      s"onlyRelational=${actual -- expected} onlyModel=${expected -- actual}")
    assert(expected.nonEmpty)
  }
}
