package graft

import org.apache.spark.sql.Row

/** Value-level invariants for the round-10 additions — properties the
  * DuckDB oracle can't express as a single hash compare (cross-row
  * relationships, algebraic identities), checked at sf0.001.
  */
class RoundTenOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def rows(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  test("ts_ohlc bars are internally consistent (low <= open,close <= high)") {
    val r = rows("ts_ohlc")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (open, high, low, close) = (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(low <= open && open <= high, s"open outside [low, high]: $row")
      assert(low <= close && close <= high, s"close outside [low, high]: $row")
    }
  }

  test("a_mad_outliers flags satisfy the Hampel inequality and dev2 identity") {
    rows("a_mad_outliers").foreach { row =>
      val (mcents, med2, dev2, mad4) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(dev2 == math.abs(2 * mcents - med2), s"dev2 identity broken: $row")
      assert(2 * dev2 > 3 * mad4, s"non-outlier emitted: $row")
    }
  }

  test("a_winsorized totals sit between the all-lo and all-hi clamps") {
    val r = rows("a_winsorized")
    assert(r.length == 3) // one row per return flag
    r.foreach { row =>
      val (n, winsor, lo, hi) =
        (row.getLong(1), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(lo <= hi, s"bounds inverted: $row")
      assert(winsor >= n * lo && winsor <= n * hi, s"winsorized sum outside clamp range: $row")
    }
  }

  test("t_bpe_apply merges produce multi-char symbols and no residual spaces") {
    val r = rows("t_bpe_apply")
    assert(r.nonEmpty)
    val syms = r.map(_.getString(0))
    assert(syms.forall(s => !s.contains(" ")), "symbol containing a space escaped the split")
    assert(syms.exists(_.length > 1), "no merged symbol present — merge chain inert")
    val freqs = r.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, "freq ordering broken")
  }

  test("g_link_predict scores obey cn <= jacc_den and cn <= each degree") {
    val r = rows("g_link_predict")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (cn, pa, num, den) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(num == cn && cn <= den, s"Jaccard pair inconsistent: $row")
      assert(pa >= cn * cn, s"pref_attach < cn^2 impossible when cn <= d1,d2: $row")
    }
  }

  test("g_modularity community sums close: sum(d_sum) = 2m, sum(e_in) <= m") {
    val r = rows("g_modularity")
    assert(r.nonEmpty)
    val m = r.head.getLong(4)
    assert(r.forall(_.getLong(4) == m), "m must be constant across rows")
    assert(r.map(_.getLong(2)).sum == 2 * m, "handshake identity sum(d_sum) = 2m broken")
    assert(r.map(_.getLong(3)).sum <= m, "intra-community edges exceed edge count")
    r.foreach { row =>
      assert(row.getLong(5) == 4 * m * row.getLong(3) - row.getLong(2) * row.getLong(2),
        s"contrib identity broken: $row")
    }
  }

  test("mm_patch_grid emits a full raster grid per item") {
    val byDoc = rows("mm_patch_grid").groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (docId, patches) =>
      val (nx, ny) = (patches.head.getLong(3), patches.head.getLong(4))
      assert(patches.length == nx * ny, s"doc $docId: ${patches.length} patches != $nx*$ny")
      val ids = patches.map(_.getLong(7)).sorted
      assert(ids.head == 0 && ids.last == nx * ny - 1 && ids.distinct.length == ids.length,
        s"doc $docId: patch_id not a dense raster 0..${nx * ny - 1}")
    }
  }

  test("s_kfold folds partition the corpus: 5 folds covering every document") {
    val r = rows("s_kfold")
    val folds = r.map(_.getLong(0)).distinct.sorted
    assert(folds.forall(f => f >= 0 && f <= 4), s"fold outside [0,4]: ${folds.mkString(",")}")
    val total = r.map(_.getLong(2)).sum
    val nDocs = Tables(spark, dir, "documents").count()
    assert(total == nDocs, s"fold counts sum $total != corpus size $nDocs")
  }

  test("x_merge_apply applies CDC deletes and labels provenance") {
    val r = rows("x_merge_apply")
    assert(r.nonEmpty)
    assert(r.forall(_.getString(1) != "error"), "a deleted (error) state survived the merge")
    val srcs = r.map(_.getString(4)).toSet
    assert(srcs.subsetOf(Set("insert", "carry", "update")), s"unknown provenance: $srcs")
  }

  test("x_conversion_lag medians sit inside [min, max] per cohort") {
    val r = rows("x_conversion_lag")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (min, max, med2) = (row.getLong(2), row.getLong(3), row.getLong(4))
      assert(2 * min <= med2 && med2 <= 2 * max, s"median outside [min, max]: $row")
    }
  }

  test("q_confusion row shares sum to ~10000 bp per true label") {
    val byLang = rows("q_confusion").groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, cells) =>
      val rowTotal = cells.head.getLong(3)
      assert(cells.map(_.getLong(2)).sum == rowTotal, s"$lang: cell counts != row_total")
      val bpSum = cells.map(_.getLong(4)).sum
      // integer division floors each cell, so the sum is within n_cells of 10000
      assert(bpSum <= 10000 && bpSum > 10000 - cells.length * 2,
        s"$lang: share_bp sum $bpSum implausible")
    }
  }

  test("x_rank_movers ranks are unique within each period and bounded by 51") {
    val r = rows("x_rank_movers")
    assert(r.nonEmpty)
    val early = r.map(_.getLong(1)).filter(_ <= 50)
    val late = r.map(_.getLong(2)).filter(_ <= 50)
    assert(early.distinct.length == early.length, "duplicate early rank")
    assert(late.distinct.length == late.length, "duplicate late rank")
    r.foreach { row =>
      assert(row.getLong(5) == row.getLong(1) - row.getLong(2), s"rank_delta identity: $row")
      assert(row.getLong(1) <= 51 && row.getLong(2) <= 51)
    }
  }

  test("x_yoy_growth emits NULL (not zero) growth where no prior period exists") {
    val df = SparkEntry.queries("x_yoy_growth")(spark, dir)
    val r = df.collect()
    assert(r.nonEmpty)
    val byFlag = r.groupBy(_.getString(0))
    byFlag.foreach { case (flag, months) =>
      assert(months.head.isNullAt(3), s"$flag: first month must have NULL mom_bp")
      assert(months.take(12).forall(_.isNullAt(4)), s"$flag: yoy_bp before month 13 must be NULL")
      months.sliding(2).foreach {
        case Array(prev, cur) if !cur.isNullAt(3) =>
          val expect = (cur.getLong(2) - prev.getLong(2)) * 10000 / prev.getLong(2)
          assert(cur.getLong(3) == expect, s"$flag ${cur.getString(1)}: mom_bp identity broken")
        case _ =>
      }
    }
  }

  test("q_skew scalars are consistent with the key-grain frame") {
    val r = rows("q_skew")
    assert(r.length == 10)
    val (nKeys, nRows, maxFreq) = (r.head.getLong(2), r.head.getLong(3), r.head.getLong(4))
    assert(r.forall(x => x.getLong(2) == nKeys && x.getLong(3) == nRows && x.getLong(4) == maxFreq),
      "global context must be constant across rows")
    assert(r.head.getLong(1) == maxFreq, "top-1 frequency must equal max_freq")
    assert(r.forall(_.getLong(1) <= maxFreq))
    assert(r.head.getLong(5) == maxFreq * nKeys * 10000 / nRows, "skew_bp identity broken")
    assert(r.head.getLong(5) >= 10000, "max-based skew ratio cannot be below uniform")
  }

  test("ts_cusum closed form matches the literal sequential recursion") {
    // recompute S_t = max(0, S_{t-1} + y_t) per flag with a plain fold and
    // check every alarmed day the query emits is exactly the set where the
    // recursion exceeds the threshold
    val daily = SparkEntry.queries("ts_ohlc")(spark, dir) // just to warm tables
    val _ = daily
    import org.apache.spark.sql.functions._
    val frame = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), date_trunc("DAY", col("l_shipdate")).as("day"))
      .agg(sum(graft.ops.ColumnOps.cents(col("l_extendedprice"))).as("day_cents"))
      .withColumn("xk", expr("day_cents DIV 100000"))
      .orderBy("l_returnflag", "day")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val expected = frame.groupBy(_._1).toSeq.flatMap { case (flag, days) =>
      val sorted = days.sortBy(_._2.getTime)
      val n = sorted.length.toLong
      val tot = sorted.map(_._4).sum
      var s = 0L
      sorted.flatMap { case (_, day, cents, xk) =>
        val y = 20L * n * xk - 21L * tot
        s = math.max(0L, s + y)
        if (s > 100L * tot) {
          val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
          fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC")) // match the UTC session
          Some((flag, fmt.format(day), cents, s))
        } else None
      }
    }.sortBy(t => (t._1, t._2))
    val got = rows("ts_cusum")
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"closed-form CUSUM diverged from the recursion: got ${got.take(3)} expected ${expected.take(3)}")
    assert(expected.nonEmpty, "fixture produced no alarms — test is vacuous")
  }
}
