package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table profiling [PROFILE]: per-column null count, distinct count
  * and min/max in ONE pass over the table — the data-quality sweep a
  * pipeline runs on every new 100 TB drop before anything joins
  * against it. The naive formulation (one query per column) rescans
  * the table N_cols times; this one computes every column's aggregates
  * in a single wide aggregate (Catalyst plans the multi-countDistinct
  * via one Expand: still one scan), then unpivots the 1-row result
  * with stack() into the (column, stats...) long form a catalog
  * stores.
  *
  * Bench note: at local SF the whole table is one parquet split, so
  * the Expand (N_cols+1 projections of every row) runs in a single
  * task and dominates this query's wall-clock (~2.7 s at sf0.1). That
  * is an artifact of the tiny input, not the plan: at real scale the
  * scan has thousands of splits and the Expand parallelizes with them.
  * Repartitioning first would "fix" the local number by adding a
  * full-table shuffle — exactly the wrong trade at 100 TB.
  *
  * min/max surface as strings so one schema fits every column type;
  * doubles route through DECIMAL(18,2) first because JVM and C++
  * float-to-string formats disagree ("1.0E7" vs "10000000.0") while
  * decimal rendering is exact on both engines.
  */
object Profile {
  /** Profile of the orders table's key/status/price columns. */
  def ordersProfile(s: SparkSession, d: String): DataFrame =
    profileOf(Tables.orders(s, d)
        .withColumn("o_totalprice",
          col("o_totalprice").cast("decimal(18,2)")),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority"))

  /** One-pass column profile of any frame: (col_name, n_null,
    * n_distinct, min_val, max_val) per requested column. */
  def profileOf(t: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val stackArgs = cols
      .map(c => s"'$c', n_rows - cnt_$c, nd_$c, min_$c, max_$c")
      .mkString(", ")
    t.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_null, n_distinct, min_val, max_val)"))
  }
}
