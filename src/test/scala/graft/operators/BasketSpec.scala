package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BasketSpec extends SparkSpec {
  /** capBaskets counts engagements via an observed metric delivered on
    * the async listener bus — poll for arrival instead of assuming the
    * counter landed when collect() returned. */
  private def awaitCounter(name: String, timeoutMs: Long = 10000): Option[Long] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var got = graft.Counters.snapshot().get(name)
    while (got.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(50)
      got = graft.Counters.snapshot().get(name)
    }
    got
  }

  test("frequent pairs: apriori pruning never changes the answer") {
    // brute-force reference on the real data: pair support via a plain
    // self-join with NO item prefilter
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val want = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey"))
      .agg(count(lit(1)).as("s")).filter(col("s") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Basket.frequentPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("capBaskets: identity when every basket is at or under the cap") {
    import spark.implicits._
    graft.Counters.clear()
    val items = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 99L))
      .toDF("bk", "item")
    val got = Basket.capBaskets(items, "bk", "item", 3, "spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 99L)))
    assert(awaitCounter("spec_capped_baskets").contains(0L))
    graft.Counters.clear()
  }

  test("capBaskets: oversized baskets cut to the cap, deterministically, counted") {
    import spark.implicits._
    graft.Counters.clear()
    val items = ((0 until 20).map(i => (1L, i.toLong)) ++
      Seq((2L, 5L), (2L, 6L))).toDF("bk", "item")
    def run(parts: Int) = Basket.capBaskets(items.repartition(parts),
        "bk", "item", 4, "spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(1)
    assert(a.count(_._1 == 1L) === 4, s"basket 1 not capped: $a")
    assert(a.count(_._1 == 2L) === 2, "under-cap basket disturbed")
    // hash-ranked keep-set is partition-invariant
    assert(run(7) === a)
    val ctr = awaitCounter("spec_capped_baskets").getOrElse(0L)
    assert(ctr >= 1L, s"cap engagement not counted: $ctr") // ≥: two runs
    graft.Counters.clear()
  }

  test("pairIterator: sorted-by-basket input emits exactly the a<b pairs") {
    val rows = Iterator((1L, 3L), (1L, 1L), (1L, 2L), (2L, 9L), (3L, 4L), (3L, 4L))
    val got = Basket.pairIterator(rows).toSeq
    // value comparison: duplicates never self-pair, multiplicities multiply
    assert(got.sorted === Seq((1L, 2L), (1L, 3L), (2L, 3L)).sorted)
  }

  test("pairIterator: adversarial ordering trips the contiguity guard") {
    // a basket key reappearing after its group closed = broken
    // clustering; the kernel must fail loudly, never undercount
    val bad = Iterator((1L, 10L), (2L, 20L), (1L, 11L))
    val ex = intercept[IllegalStateException] {
      Basket.pairIterator(bad).toList
    }
    assert(ex.getMessage.contains("contiguity"))
    // equal-key interleave (descending) is equally broken
    val desc = Iterator((5L, 1L), (4L, 1L))
    intercept[IllegalStateException] { Basket.pairIterator(desc).toList }
    // empty input is fine
    assert(Basket.pairIterator(Iterator.empty).isEmpty)
  }

  test("observeInto: re-executing the same frame records its counter once") {
    import spark.implicits._
    graft.Counters.clear()
    val items = ((0 until 9).map(i => (1L, i.toLong))).toDF("bk", "item")
    val capped = Basket.capBaskets(items, "bk", "item", 4, "dup")
    capped.collect() // execution 1, action 1
    capped.collect() // SAME QueryExecution, action 2 — must not re-add
    // both actions fire onSuccess; poll until at least one delivery
    // landed, then give the second event time to (wrongly) double
    assert(awaitCounter("dup_capped_baskets").contains(1L))
    Thread.sleep(300)
    assert(graft.Counters.snapshot().get("dup_capped_baskets").contains(1L),
      "second action over the same execution double-counted")
    // a NEW frame over the same input is a new execution: accumulates
    Basket.capBaskets(items, "bk", "item", 4, "dup").collect()
    val deadline = System.nanoTime() + 10000L * 1000000L
    while (!graft.Counters.snapshot().get("dup_capped_baskets").contains(2L)
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert(graft.Counters.snapshot().get("dup_capped_baskets").contains(2L))
    graft.Counters.clear()
  }

  test("frequentPairs: a cap below basket size bounds the pair fan-out") {
    // TPC-H baskets are <=7; cap at 2 so the cap REALLY engages, and
    // every surviving basket emits at most 1 pair
    val capped = Basket.frequentPairs(spark, sfDir, minsup = 2,
      maxBasketSize = 2)
    val counted = capped.agg(sum(col("support"))).head()
    val full = Basket.frequentPairs(spark, sfDir)
      .agg(sum(col("support"))).head()
    assert(counted.isNullAt(0) ||
      counted.getLong(0) <= full.getLong(0))
  }

  test("unpivot melts the wide aggregate losslessly") {
    val wide = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val long = CoreOps.a25Unpivot(spark, sfDir)
      .filter(col("metric") === "sum_qty")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(long === wide) // one long row per (flag, metric), same values
    val nMetrics = CoreOps.a25Unpivot(spark, sfDir)
      .select("metric").distinct().count()
    assert(nMetrics === 3)
  }
}
