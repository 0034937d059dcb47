package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Z-order layout [ZORDER]: interleave the bits of two columns into a
  * Morton code and lay the table out in that order. Sorting by a
  * single column clusters that column's values perfectly and leaves
  * the other's min/max spread across every file; sorting by the
  * Morton code clusters BOTH — points close in (x, y) land close in
  * the 1-D order — so parquet min/max row-group statistics prune
  * selective predicates on either column (or both) instead of only
  * the leading sort key. At 100 TB this is the layout lever for
  * multi-dimensional scans: same bytes, same query, a fraction of the
  * row groups read. The code is pure bit arithmetic, term-for-term
  * reproducible in SQL, so the oracle checks the exact interleave.
  */
object ZOrder {
  /** `bits`-wide Morton interleave: bit i of x → bit 2i, bit i of y →
    * bit 2i+1. Inputs are masked to `bits` first, so callers can feed
    * raw keys. */
  def morton2(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    val mx = x.bitwiseAND(lit(mask))
    val my = y.bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(mx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(my, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite a frame into Z-order: range-partition then sort by the
    * Morton code, the write-side layout step. Range partitioning keeps
    * partitions contiguous in z-space so file-level min/max stats stay
    * tight, not just row-group stats. */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      bits: Int = 16): DataFrame = {
    val z = morton2(col(c1), col(c2), bits)
    df.withColumn("_z", z).repartitionByRange(col("_z"))
      .sortWithinPartitions(col("_z")).drop("_z")
  }

  /** Demo query [zorder_codes]: Morton codes over the lineitem
    * (partkey, suppkey) plane on a bounded slice, checked bit-exactly
    * by the SQL oracle's unrolled interleave. */
  def mortonDemo(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 400)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        morton2(col("l_partkey"), col("l_suppkey")).as("zval"))
}
