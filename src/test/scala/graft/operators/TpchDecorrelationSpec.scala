package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Plan pins for the correlated-aggregate TPC-H shapes (Q17 / Q20 /
  * Q21 / Q2): what these queries exist to exercise is Catalyst's
  * DECORRELATION — the rewrite of a correlated scalar aggregate or
  * (NOT) EXISTS into a standalone aggregate plus an equi hash join.
  * If decorrelation failed, the fallback is a per-outer-row re-scan
  * (nested loop) that is O(n²) at 100 TB, so the pin is: no
  * CartesianProduct, no BroadcastNestedLoopJoin, and for the scalar
  * shapes the per-key Aggregate visibly survives in the physical plan.
  * Row values are oracle-checked by the driver; this spec pins the
  * SHAPE that makes them reachable at scale. */
class TpchDecorrelationSpec extends SparkSpec {
  private val names = Seq("q17_small_qty", "q20_potential_promo",
    "q21_waiting_supp", "q2_min_cost_supp",
    // round-5 additions: scalar-threshold HAVING, max-over-view,
    // NOT IN feeding an aggregate, anti join + substring dimension
    "q11_important_stock", "q15_top_supplier", "q16_parts_supplier",
    "q22_global_sales")
  // q22 cross-joins a literal ONE-ROW (sum, count) stats frame — that
  // correctly plans as a BroadcastNestedLoopJoin and is not a
  // decorrelation failure, so it is exempt from the BNLJ pin only
  private val tinyCrossJoin = Set("q22_global_sales")

  test("correlated TPC-H shapes decorrelate nested-loop-free") {
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$n degenerated to a CartesianProduct")
      if (!tinyCrossJoin.contains(n))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$n planned a nested loop — decorrelation failed")
    }
  }

  test("q11's global threshold executes as a one-shot scalar subquery") {
    val plan = CoreOps.q11ImportantStock(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the HAVING comparison must reference a Subquery result computed
    // once — not re-aggregate the fact side per group
    assert(plan.contains("Subquery"),
      s"global-sum threshold did not plan as a scalar subquery:\n$plan")
  }

  test("q16's NOT IN keeps the null-aware anti join under the distinct count") {
    val plan = CoreOps.q16PartsSupplier(spark, sfDir)
      .queryExecution.executedPlan.toString
    // BroadcastHashJoinExec renders isNullAwareAntiJoin as the trailing
    // boolean (same pin as j10, here feeding COUNT(DISTINCT))
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"NOT IN under the aggregate lost its null-aware anti join:\n$plan")
  }

  test("q22's NOT EXISTS decorrelates to a plain left-anti hash join") {
    val plan = CoreOps.q22GlobalSales(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT EXISTS did not become an anti hash join:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"q22 degenerated to a CartesianProduct:\n$plan")
  }

  test("q17's correlated AVG becomes a standalone per-partkey aggregate") {
    val plan = CoreOps.q17SmallQty(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the rewritten plan computes avg(l_quantity) once per partkey in a
    // hash aggregate, then equi-joins it back — not per outer row
    assert(plan.contains("avg(l_quantity"),
      "per-partkey avg aggregate missing from the physical plan")
    assert(plan.count(_ == '\n') > 0 && !plan.contains("scalar-subquery"),
      "correlated scalar subquery survived into the physical plan")
  }

  test("q2's correlated MIN becomes a standalone per-partkey aggregate") {
    val plan = CoreOps.q2MinCostSupp(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("min("),
      "per-partkey min aggregate missing from the physical plan")
    assert(!plan.contains("scalar-subquery"),
      "correlated scalar subquery survived into the physical plan")
  }

  test("q17 returns the single summary row") {
    assert(CoreOps.q17SmallQty(spark, sfDir).count() == 1L)
  }
}
