package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two properties VERDICT r2 demanded of the CC operator:
  * (1) pointer jumping makes long-diameter graphs converge in O(log d)
  *     supersteps — a 999-hop chain (diameter ≫ 2× the cap) must finish
  *     well inside the default cap;
  * (2) if the cap IS hit unconverged the op throws instead of returning
  *     plausible-but-wrong labels.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def chain(from: Long, n: Long) = {
    import spark.implicits._
    spark.range(from, from + n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
  }

  test("an empty edge set returns an empty result, not a driver NPE") {
    assert(ConnectedComponents.run(chain(0, 2).limit(0)).count() == 0)
  }

  test("999-hop chain converges to a single component inside the default cap") {
    val labels = ConnectedComponents.run(chain(0L, 1000L)).collect()
    assert(labels.length == 1000)
    assert(labels.forall(_.getLong(1) == 0L), "chain not fully merged to min label")
  }

  test("two disjoint chains keep distinct component labels") {
    val edges = chain(0L, 100L).unionAll(chain(5000L, 100L))
    val comps = ConnectedComponents.run(edges)
      .groupBy(col("comp")).agg(count(lit(1)).as("n"))
      .orderBy("comp").collect()
    assert(comps.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 100L), (5000L, 100L)))
  }

  test("hitting the iteration cap unconverged throws instead of returning wrong labels") {
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(chain(0L, 1000L), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
