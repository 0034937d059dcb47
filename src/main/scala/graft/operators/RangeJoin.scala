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

  /** Interval × interval overlap join [J12]: pairs (a, b) whose closed
    * intervals [alo, ahi] and [blo, bhi] intersect — validity-window
    * reconciliation, concurrency analysis, tolerance/band matching.
    * The naive `alo <= bhi AND blo <= ahi` predicate has no equi key
    * (BroadcastNestedLoopJoin, O(|A|·|B|)), so BOTH sides replicate to
    * every bin their interval touches and the join runs as a hash
    * equi-join on the bin id. Unlike the point case, an overlapping
    * pair can now co-occur in SEVERAL bins; the responsibility filter
    * `bin == bin(max(alo, blo))` — the bin holding the overlap's start
    * — keeps exactly one copy without any post-join distinct (a
    * distinct would re-shuffle the whole pair set). Replication is
    * ceil(span/width)+1 per row per side; width tunes replication vs
    * per-bin candidate count, and the equi-key keeps the join
    * partitionable across a cluster (AQE still free to broadcast a
    * small side). */
  def overlapBinned(a: DataFrame, alo: String, ahi: String,
      b: DataFrame, blo: String, bhi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String) =
      df.withColumn("_bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(a, alo, ahi).join(binned(b, blo, bhi), Seq("_bin"))
      .filter(col(alo) <= col(bhi) && col(blo) <= col(ahi))
      .filter(col("_bin") ===
        floor(greatest(col(alo), col(blo)) / binWidth).cast("long"))
      .drop("_bin")
  }

  /** Demo query [j12_interval_overlap]: comparable-balance pairing —
    * each customer and supplier carries a ±100 tolerance interval
    * around its account balance; a pair "matches" when the intervals
    * intersect (equivalently |c − s| ≤ 200, but computed as the
    * interval test so engine and oracle share the exact arithmetic).
    * Bounds are DECIMAL(12,2) on both sides — money endpoints compared
    * exactly, no float boundary flicker — while bin ASSIGNMENT uses
    * double floor(lo/width), which only needs self-consistency, not
    * oracle parity. Aggregated per market segment so output stays
    * bounded at any SF. */
  def balanceBandDemo(s: SparkSession, d: String): DataFrame = {
    val tol = 100
    val c = Tables.customer(s, d).select(col("c_mktsegment"),
      (col("c_acctbal").cast("decimal(12,2)") - tol).as("c_lo"),
      (col("c_acctbal").cast("decimal(12,2)") + tol).as("c_hi"))
    val sup = Tables.supplier(s, d).select(col("s_suppkey"),
      col("s_acctbal").cast("decimal(12,2)").as("s_bal"),
      (col("s_acctbal").cast("decimal(12,2)") - tol).as("s_lo"),
      (col("s_acctbal").cast("decimal(12,2)") + tol).as("s_hi"))
    overlapBinned(c, "c_lo", "c_hi", sup, "s_lo", "s_hi",
        binWidth = 256.0)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        sum(col("s_bal")).cast("decimal(18,2)").cast("double")
          .as("sum_supp_bal"))
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
