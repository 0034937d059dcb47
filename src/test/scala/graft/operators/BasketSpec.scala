package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BasketSpec extends SparkSpec {
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
