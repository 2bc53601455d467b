package graft

/** Cross-row invariants for the SQL-UDF and TIME-type keys that the
  * DuckDB oracle's single hash compare can't express, plus the plan
  * property that makes SQL UDFs free at scale: the analyzer INLINES them,
  * so the optimized plan contains no opaque lambda.
  */
class SqlUdfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sql_udf_scalar is inlined: no ScalaUDF / no function call survives optimization") {
    val df = SparkEntry.queries("sql_udf_scalar")(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString()
    // An opaque UDF would appear as a ScalaUDF / PythonUDF node; the SQL
    // UDF must resolve to plain arithmetic before optimization.
    assert(!optimized.contains("ScalaUDF"), s"opaque UDF in plan:\n$optimized")
    assert(!optimized.toLowerCase.contains("graft_cents"),
      s"unresolved SQL function survived analysis:\n$optimized")
  }

  test("sql_udf_scalar filter on the UDF result sits below the aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val df = SparkEntry.queries("sql_udf_scalar")(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    // The BETWEEN on graft_cents(l_discount) inlines to arithmetic on
    // l_discount; after optimization it must survive as a Filter whose
    // condition references l_discount, INSIDE the aggregate's subtree
    // (i.e. evaluated before the shuffle, not on aggregated output).
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, s"no Aggregate in optimized plan:\n$plan")
    val pushedFilters = aggs.head.collect {
      case f: Filter if f.condition.references.exists(_.name == "l_discount") => f
    }
    assert(pushedFilters.nonEmpty,
      s"no l_discount Filter below the Aggregate:\n$plan")
  }

  test("sql_udf_table installments sum back to each order's exact total") {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders")
    // The SAME function body the oracle-gated query registers — a drift
    // between spec and query would silently un-test the shipped UDF.
    spark.sql(graft.queries.SqlSurfaceQ.installmentsDdl)
    val bad = spark.sql(
      """SELECT o.o_orderkey
        |FROM (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
        |      FROM orders) o,
        |  LATERAL graft_installments(o.total_cents, 3) f
        |GROUP BY o.o_orderkey, o.total_cents
        |HAVING COUNT(*) <> 3 OR SUM(f.amount) <> o.total_cents
        |   OR MAX(f.amount) - MIN(f.amount) > 1""".stripMargin).count()
    assert(bad == 0L, s"$bad orders with a broken installment split")
  }

  test("f_time_type scopes the TIME flag to a cloned session") {
    // Run the query (flips the flag in ITS session) ...
    val r = SparkEntry.queries("f_time_type")(spark, dir).collect()
    assert(r.nonEmpty, "no business-hours events at sf0.001")
    // ... then prove the shared test session still rejects the TIME type:
    // the experimental flag must not leak into sibling queries.
    val leaked =
      try { spark.sql("SELECT CAST('13:00:00' AS TIME)"); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    assert(!leaked, "timeType flag leaked into the shared session")
  }

  test("f_time_type window bounds are honored: all times in [09:00, 17:00)") {
    SparkEntry.queries("f_time_type")(spark, dir).collect().foreach { row =>
      val (first, last) = (row.getString(2), row.getString(3))
      assert(first >= "09:00:00" && last < "17:00:00",
        s"time outside business hours: $row")
      assert(first <= last, s"min > max: $row")
    }
  }
}
