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
    "q21_waiting_supp", "q2_min_cost_supp")

  test("correlated TPC-H shapes decorrelate nested-loop-free") {
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$n degenerated to a CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$n planned a nested loop — decorrelation failed")
    }
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
