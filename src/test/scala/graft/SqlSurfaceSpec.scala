package graft

/** Raw-SQL surface: registerAll + spark.sql must agree with the
  * DataFrame path, including the events nanos normalization. */
class SqlSurfaceSpec extends SparkSpec {
  test("registerAll exposes every table to spark.sql with typed schemas") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    // events view carries the micros-normalized timestamp type
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val viaSql = spark.sql(
      "SELECT COUNT(DISTINCT event_type) FROM events").head().getLong(0)
    val viaDf = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(viaSql === viaDf)
  }

  test("pipe-syntax chain folds to the standard plan (pushdown intact)") {
    val df = operators.CoreOps.sqlPipeSuite(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    // the |> WHERE stage's shipdate predicate must reach the parquet
    // scan as a pushed filter — EliminatePipeOperators folded the
    // chain into an ordinary plan that Catalyst optimizes end-to-end
    assert(phys.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed to scan:\n$phys")
    // and the pipe program computes exactly what its nested-SQL twin
    // computes (the oracle states the same program for DuckDB; this
    // pins the equivalence inside the engine too)
    val nested = spark.sql(
      """SELECT o.o_orderpriority AS prio, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        |FROM graft_li_pipe JOIN graft_ord_pipe o ON l_orderkey = o.o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY 1""".stripMargin)
    assert(df.collect().toSeq === nested.collect().toSeq)
  }

  test("SQL-language UDFs inline: no function boundary in the plan") {
    val df = operators.CoreOps.sqlUdfSuite(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan.toString
    // ResolveSQLFunctions must have substituted both bodies — a
    // surviving SQLFunctionNode/expression would be a black-box call
    // site (the thing the engine's no-UDF rule exists to prevent)
    assert(!optimized.contains("SQLFunction"),
      s"SQL function survived inlining:\n$optimized")
    // inlined plan computes what the hand-inlined expressions compute
    val inline = spark.sql(
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid'
        |            ELSE 'high' END AS band,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))
        |    AS DECIMAL(38,4))) AS DOUBLE) AS sum_net,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty
        |FROM graft_li_udf GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(df.collect().toSeq === inline.collect().toSeq)
  }

  test("GROUP BY ALL / ORDER BY ALL expand to the explicit plan") {
    val df = operators.CoreOps.sqlGroupAllSuite(spark, sfDir)
    // ALL resolves during analysis — the optimized plan must equal the
    // hand-expanded form's, aggregate keys and sort order included
    val expanded = spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       year(o_orderdate) AS yr, COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS rev,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         / COUNT(*) AS avg_rev
        |FROM graft_ord_all
        |WHERE o_orderdate >= TIMESTAMP '1994-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin)
    assert(df.queryExecution.optimizedPlan.canonicalized ===
      expanded.queryExecution.optimizedPlan.canonicalized)
    assert(df.collect().toSeq === expanded.collect().toSeq)
  }

  test("session variables fold to literals the scan can push") {
    val df = operators.CoreOps.sqlVarSuite(spark, sfDir)
    val phys = df.queryExecution.executedPlan.toString
    // the USING-bound cutoff must reach the parquet scan as a pushed
    // constant predicate — proof the variable resolved to a literal
    // before optimization rather than surviving as an opaque reference
    assert(phys.contains("GreaterThan(l_quantity,25.0)"),
      s"variable cutoff not pushed as a literal:\n$phys")
    // lateral alias arithmetic inside the statement text resolved to
    // plain projection layering: per_item == gross / n exactly
    df.collect().foreach { r =>
      assert(r.getDouble(4) === r.getDouble(3) / r.getLong(1))
    }
  }
}
