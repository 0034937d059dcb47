package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Binned range join [RANGEJOIN]: join points to the intervals
  * containing them (ip→location, price→band, ts→validity window)
  * WITHOUT the theta-join trap. A naive `p BETWEEN lo AND hi` join
  * has no equi key, so Spark plans BroadcastNestedLoopJoin — O(points
  * × ranges) comparisons, the classic range-join scale-killer once
  * the ranges side outgrows a broadcast.
  *
  * The binned formulation quantizes the axis into fixed-width bins:
  * each range replicates to every bin it overlaps, each point maps to
  * exactly one bin, and the join becomes a hash EQUI-join on the bin
  * id followed by the exact interval filter. Replication cost is
  * ceil(span/width)+1 rows per range — width tunes the tradeoff
  * between replication and per-bin candidate count. Both sides
  * partition by bin, so the join parallelizes across the cluster like
  * any equi-join (and AQE can still pick broadcast when the binned
  * ranges side is small). Same blocking idea as the similarity
  * operators: turn a quadratic predicate into an equi-key plus a
  * cheap exact residual filter.
  */
object RangeJoin {
  /** Points ⋈ ranges with p in [lo, hi] (inclusive both ends), as an
    * equi-join on floor(value/binWidth). All points and ranges columns
    * pass through. */
  def binned(points: DataFrame, pcol: String,
      ranges: DataFrame, lo: String, hi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rb = ranges.withColumn("_bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    points.withColumn("_bin", floor(col(pcol) / binWidth).cast("long"))
      .join(rb, Seq("_bin"))
      .filter(col(pcol) >= col(lo) && col(pcol) <= col(hi))
      .drop("_bin")
  }

  /** Demo query [range_join_binned]: per-brand retail-price bands
    * (min..max per brand — overlapping, irregular widths) joined to
    * every part's price; aggregated to per-band membership stats so
    * the output stays bounded. Oracle = the naive BETWEEN join. */
  def priceBandDemo(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val bands = part.groupBy(col("p_brand"))
      .agg(min(col("p_retailprice")).as("lo"),
        max(col("p_retailprice")).as("hi"))
    binned(part.select(col("p_retailprice").as("price")), "price",
      bands, "lo", "hi", binWidth = 64.0)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_in_band"),
        sum(col("price").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
  }
}
