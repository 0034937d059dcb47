package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class HistogramWindowSpec extends SparkSpec {
  test("a17 histogram buckets partition the table and respect bin ranges") {
    val h = CoreOps.a17Histogram(spark, sfDir)
    assert(h.agg(sum("n_orders")).head.getLong(0) ===
      Tables.orders(spark, sfDir).count())
    val bad = h.filter(col("bucket") < 0 || col("bucket") > 19 ||
      col("lo") > col("hi") ||
      // an interior bucket's observed range stays inside its bin;
      // bucket 19 is the open-ended clamp so only its floor holds
      (col("bucket") < 19 && (col("lo") < col("bucket") * 30000.0 ||
        col("hi") >= (col("bucket") + 1) * 30000.0)) ||
      (col("bucket") === 19 && col("lo") < 19 * 30000.0))
    assert(bad.count() === 0)
  }

  test("w4 ntile quartiles are balanced; lead gaps match the desc order") {
    val w = CoreOps.w4NtileLead(spark, sfDir)
    // tile sizes within a segment differ by at most 1 and all 4 exist
    val spread = w.groupBy("c_mktsegment", "quartile").count()
      .groupBy("c_mktsegment")
      .agg((max("count") - min("count")).as("spread"),
        countDistinct("quartile").as("nq"))
    assert(spread.filter(col("spread") > 1 || col("nq") =!= 4).count() === 0)
    // descending order means every gap to the next row is >= 0, and
    // exactly the last row of each segment has no successor
    assert(w.filter(col("gap_next") < 0).count() === 0)
    assert(w.filter(col("gap_next").isNull).count() ===
      w.select("c_mktsegment").distinct().count())
  }
}
