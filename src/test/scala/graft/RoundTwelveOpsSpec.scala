package graft

import org.apache.spark.sql.Row

/** Value-level invariants for the round-12 additions — cross-row
  * properties the DuckDB oracle's single hash compare can't express,
  * checked at sf0.001.
  */
class RoundTwelveOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("e_kmeans_step partitions the corpus: all 8 clusters, counts sum to N") {
    val r = rows("e_kmeans_step")
    // seeds are corpus members, so every seed self-assigns at d2=0 and no
    // cluster can come back empty
    assert(r.map(_.getLong(0)).toSeq == (0L to 7L), s"cluster ids: ${r.toSeq}")
    val n = Tables(spark, dir, "embeddings").count()
    assert(r.map(_.getLong(1)).sum == n, "assignment is not a partition of the corpus")
    r.foreach(row => assert(row.getLong(2) >= 0, s"negative inertia: $row"))
  }

  test("e_kmeans_step inertia bounds the self-assigned seeds at zero contribution") {
    // each seed contributes d2=0, so every cluster's inertia is achievable
    // by (n_members - 1) non-seed members only: inertia == 0 iff singleton
    rows("e_kmeans_step").foreach { row =>
      if (row.getLong(1) == 1L) assert(row.getLong(2) == 0L, s"singleton with inertia: $row")
    }
  }

  test("e_knn_graph edges are canonical, unique, and degree-bounded by k=3") {
    val r = rows("e_knn_graph")
    assert(r.nonEmpty, "no mutual edges at sf0.001")
    val edges = r.map(row => (row.getLong(0), row.getLong(1)))
    assert(edges.forall { case (a, b) => a < b }, "non-canonical edge order")
    assert(edges.distinct.length == edges.length, "duplicate edges")
    // a vertex's mutual edges are a subset of its own directed top-3
    val deg = edges.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity)
    deg.foreach { case (v, occ) => assert(occ.length <= 3, s"degree > 3 at vertex $v") }
  }

  test("q_auc is a valid probability and num2 respects the pair budget") {
    val r = rows("q_auc")
    assert(r.length == 1)
    val (nPos, nNeg, num2, aucBp) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nPos > 0 && nNeg > 0, "degenerate eval cohort")
    assert(num2 >= 0 && num2 <= 2 * nPos * nNeg, s"num2 outside [0, den2]: ${r(0)}")
    assert(aucBp >= 0 && aucBp <= 10000, s"AUC outside [0, 1]: ${r(0)}")
  }

  // sf0.01: at sf0.001 the pair evidence is too thin for the (2n+2)
  // dominance guard and the digraph is correctly empty — the invariants
  // need the populated graph the oracle gate actually checks. The path
  // is derived from the suite's base dir (sibling scale factor), and the
  // tests assume() it exists so a machine without the sf0.01 fixture
  // skips them visibly instead of failing or silently passing.
  private val sf01Dir = dir.replace("sf0.001", "sf0.01")
  private def assumeSf01(): Unit =
    assume(new java.io.File(sf01Dir, "lineitem.parquet").exists(),
      s"sf0.01 fixture missing at $sf01Dir")
  private lazy val sccRows: Array[Row] =
    SparkEntry.queries("g_scc")(spark, sf01Dir).collect()

  test("g_scc is a partition into mutually-reachable classes with consistent sizes") {
    assumeSf01()
    val r = sccRows
    assert(r.length >= 40, s"output must cover the whole observed cohort, got ${r.length}")
    assert(r.exists(_.getLong(2) > 1), "no multi-member SCC at sf0.01")
    val byScc = r.groupBy(_.getLong(1))
    // scc_id is the minimum member (canonical representative)
    byScc.foreach { case (id, members) =>
      assert(members.map(_.getLong(0)).min == id, s"scc_id $id is not its min member")
      members.foreach(m => assert(m.getLong(2) == members.length,
        s"scc_size mismatch for scc $id: $m"))
    }
    // every node appears exactly once (it IS a partition)
    val ids = r.map(_.getLong(0))
    assert(ids.distinct.length == ids.length, "node in two SCCs")
  }

  test("g_scc singleton-vs-cycle structure: a multi-member SCC implies a directed cycle") {
    assumeSf01()
    // mutual reachability inside a multi-member SCC means the dominance
    // digraph has a cycle through every member; with the (2n+2) dominance
    // guard both arcs of a pair can't coexist, so any cycle is length >= 3
    val multi = sccRows.groupBy(_.getLong(1)).filter(_._2.length > 1)
    multi.foreach { case (id, members) =>
      assert(members.length >= 3,
        s"2-member SCC $id impossible under asymmetric dominance arcs")
    }
  }

  test("q_benford digits cover 1..9, proportions sum to ~1, expected literals fixed") {
    val r = rows("q_benford")
    assert(r.map(_.getLong(0)).toSeq == (1L to 9L))
    val obsSum = r.map(_.getLong(2)).sum
    // integer-div truncation loses < 9 bp total
    assert(obsSum > 9991 && obsSum <= 10000, s"obs_bp sums to $obsSum")
    assert(r.map(_.getLong(3)).sum == 9995L, "floor'd Benford literals changed")
    r.foreach(row => assert(row.getLong(4) == row.getLong(2) - row.getLong(3),
      s"dev_bp inconsistent: $row"))
  }

  test("s_undersample balances every class to the minority count") {
    val r = rows("s_undersample")
    val perLang = r.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val langs = Tables(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    val minN = langs.values.min
    assert(perLang.keySet == langs.keySet, "a class vanished")
    perLang.foreach { case (l, n) =>
      assert(n.toLong == minN, s"class $l kept $n, expected minority count $minN")
    }
    val ids = r.map(_.getLong(2))
    assert(ids.distinct.length == ids.length, "doc sampled twice")
  }

  test("e_feature_hash lands in [0,64) and conserves the cohort token mass") {
    val r = rows("e_feature_hash")
    assert(r.forall(row => row.getLong(1) >= 0 && row.getLong(1) < 64),
      "feature outside the 64-bin space")
    assert(r.forall(_.getLong(2) > 0), "zero-count feature row")
    // the sparse triples must conserve total token count (hashing loses
    // identity, never mass)
    import org.apache.spark.sql.functions._
    val nToks = Tables(spark, dir, "documents").filter(col("doc_id") < 50)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(length(col("tok")) >= 2).count()
    assert(r.map(_.getLong(2)).sum == nToks, "token mass not conserved")
  }

  test("x_cohort_ltv curves are prefix-exact and monotone within each cohort") {
    val r = rows("x_cohort_ltv")
    assert(r.nonEmpty)
    r.groupBy(_.getString(0)).foreach { case (cohort, rws) =>
      val sorted = rws.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).head == 0L, s"$cohort misses age 0")
      var cum = 0L
      sorted.foreach { row =>
        cum += row.getLong(2)
        assert(row.getLong(3) == cum, s"cum_rev not the prefix sum: $row")
        assert(row.getLong(5) == cum / row.getLong(4), s"ltv not cum div users: $row")
      }
    }
  }

  test("x_hhi is bounded by [1e8/n, 1e8] and dominated by the top share") {
    val r = rows("x_hhi")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, top, hhi) = (row.getLong(1), row.getLong(3), row.getLong(4))
      assert(top <= 10000L, s"share above 100%: $row")
      assert(hhi >= top * top, s"hhi below its top-share term: $row")
      // sum of squares is minimized at equal shares (within truncation slack)
      assert(hhi >= 100000000L / n - n * 20000, s"hhi below the equal-share floor: $row")
      assert(hhi <= 100000000L, s"hhi above the monopoly ceiling: $row")
    }
  }

  test("a_chi2 shares are a ppm distribution with consistent terms") {
    val r = rows("a_chi2")
    assert(r.length >= 6, "contingency table suspiciously small")
    val obsSum = r.map(_.getLong(3)).sum
    assert(obsSum > 999900 && obsSum <= 1000000, s"obs_ppm sums to $obsSum")
    r.foreach { row =>
      val (obs, exp, term) = (row.getLong(3), row.getLong(4), row.getLong(5))
      val d = obs - exp
      assert(term == d * d / math.max(exp, 1L), s"chi2 term inconsistent: $row")
    }
  }

  test("x_fulfillment_lag percentiles are ordered and bounded by the max") {
    val r = rows("x_fulfillment_lag")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (p50, p90, p99, mx) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx, s"percentiles out of order: $row")
      assert(p50 >= 0, s"negative latency: $row")
    }
  }

  test("ts_seasonality covers all 7 ISO days per type and shares sum to ~1") {
    val r = rows("ts_seasonality")
    r.groupBy(_.getString(0)).foreach { case (t, rws) =>
      assert(rws.map(_.getLong(1)).sorted.toSeq == (1L to 7L), s"$t misses a weekday")
      val s = rws.map(_.getLong(3)).sum
      assert(s > 9990 && s <= 10000, s"$t shares sum to $s")
    }
  }

  test("mm_audio_window frames tile each doc with hop 8 and nonnegative energy") {
    val r = rows("mm_audio_window")
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getLong(2) >= 0, s"negative energy: $row"))
    // per doc: win_idx is the contiguous 0..((len-16)/8) range
    val lens = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 50)
      .selectExpr("doc_id", "length(text) AS len").collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    r.groupBy(_.getLong(0)).foreach { case (doc, rws) =>
      val expect = (lens(doc) - 16) / 8
      assert(rws.map(_.getLong(1)).sorted.toSeq == (0L to expect),
        s"doc $doc frame indices not the contiguous hop-8 tiling")
    }
  }

  test("s_bootstrap replicates draw ~N with Poisson(1) mass and differ from each other") {
    val r = rows("s_bootstrap")
    assert(r.length == 3)
    val n = Tables(spark, dir, "documents").count()
    r.foreach { row =>
      val (drawn, used) = (row.getLong(1), row.getLong(2))
      // E[w]=1 per doc under the per-mille pmf; allow generous slack at N=50
      assert(drawn > n / 2 && drawn < n * 2, s"replicate mass off: $row (n=$n)")
      assert(used <= n && used > n / 3, s"nonzero-weight coverage off: $row")
    }
    assert(r.map(_.getLong(1)).distinct.length > 1 ||
      r.map(_.getLong(3)).distinct.length > 1,
      "replicates identical — hash not varying by replicate")
  }

  test("d_prefix_dup families all have >= 2 members and a valid representative") {
    val r = rows("d_prefix_dup")
    assert(r.nonEmpty, "no boilerplate families at sf0.001")
    r.foreach { row =>
      assert(row.getLong(1) >= 2, s"singleton family leaked: $row")
      assert(row.getString(0).length == 32, s"not an md5 hex: $row")
    }
    val hashes = r.map(_.getString(0))
    assert(hashes.distinct.length == hashes.length, "duplicate family key")
  }

  test("a_ks_test statistic is within [0, n_r*n_n] and ppm within [0, 1e6]") {
    val r = rows("a_ks_test")
    assert(r.length == 1)
    val (nR, nN, dNum, dPpm) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nR > 0 && nN > 0)
    assert(dNum >= 0 && dNum <= nR * nN, s"D numerator out of range: ${r(0)}")
    assert(dPpm >= 0 && dPpm <= 1000000, s"D ppm out of range: ${r(0)}")
  }

  test("d_incremental pairs cross the delta/base boundary with band strength in [3,6]") {
    val r = rows("d_incremental")
    r.foreach { row =>
      assert(row.getLong(0) >= 300 && row.getLong(0) < 500, s"delta side out of range: $row")
      assert(row.getLong(1) < 300, s"base side out of range: $row")
      assert(row.getLong(2) >= 3 && row.getLong(2) <= 6, s"band strength out of range: $row")
    }
    val pairs = r.map(row => (row.getLong(0), row.getLong(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate candidate pair")
  }

  test("f_json_tolerant loses exactly the truncated records, nothing else") {
    val r = rows("f_json_tolerant")
    assert(r.length == 1)
    val (nCorrupt, nValid) = (r(0).getLong(0), r(0).getLong(1))
    val orders = Tables(spark, dir, "orders")
    assert(nCorrupt + nValid == orders.count(), "audit does not cover every record")
    import org.apache.spark.sql.functions.col
    assert(nCorrupt == orders.filter(col("o_orderkey") % 97 === 0).count(),
      "corrupt count is not exactly the truncated subset")
    assert(r(0).getLong(2) > 0, "no valid cents aggregated")
  }

  test("t_novelty: the first doc owns everything, ownership partitions the shingle space") {
    val r = rows("t_novelty").sortBy(_.getLong(0))
    assert(r.nonEmpty)
    val first = r.head
    assert(first.getLong(1) == first.getLong(2) && first.getLong(3) == 10000L,
      s"min doc must own all its shingles: $first")
    r.foreach { row =>
      assert(row.getLong(2) <= row.getLong(1), s"owned more than carried: $row")
      assert(row.getLong(3) >= 0 && row.getLong(3) <= 10000, s"bp out of range: $row")
    }
    // Σ n_first = global distinct shingle count (ownership is a partition)
    import org.apache.spark.sql.functions._
    val distinctShingles = Tables(spark, dir, "documents")
      .select(explode(graft.functions.shingle_hashes(col("text"),
        graft.ops.TextHash.ShingleLen)).as("h"))
      .distinct().count()
    assert(r.map(_.getLong(2)).sum == distinctShingles,
      "first-ownership does not partition the shingle space")
  }

  test("s_leakage_split: no near-dup pair ever crosses the split boundary") {
    import org.apache.spark.sql.functions._
    val comp = SparkEntry.queries("d_cluster_cc")(spark, dir)
      .select(col("id").as("vec_id"), col("comp"))
    val assign = Tables(spark, dir, "embeddings").filter(col("vec_id") < 200)
      .select(col("vec_id"))
      .join(comp, Seq("vec_id"), "left")
      .withColumn("grp", coalesce(col("comp"), col("vec_id")))
      .withColumn("split",
        when((col("grp") % 1000003L) * 2654435761L % 1000L < 800, "train")
          .otherwise("test"))
      .select(col("vec_id"), col("split"))
    val pairs = SparkEntry.queries("d_embed_neardup")(spark, dir)
      .select(col("vec_a"), col("vec_b"))
    val crossers = pairs
      .join(assign.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("split", "sa"), Seq("vec_a"))
      .join(assign.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("split", "sb"), Seq("vec_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(crossers == 0, s"$crossers near-dup pairs leak across the split")
    // and the audit totals cover the whole cohort
    val r = rows("s_leakage_split")
    val cohort = Tables(spark, dir, "embeddings").filter(col("vec_id") < 200).count()
    assert(r.map(_.getLong(1)).sum == cohort, "split does not cover the cohort")
  }

  test("s_reservoir draws exactly k=100 distinct docs in priority order") {
    val r = rows("s_reservoir")
    assert(r.length == 100)
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == 100, "duplicate docs in the sample")
    val prios = r.map(_.getLong(0))
    assert(prios.zip(prios.tail).forall { case (a, b) => a <= b }, "not in priority order")
  }
}
