package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Market-basket co-occurrence mining — the frequent-itemset shape
  * (recommendations, "bought-together", cross-sell) whose naive form
  * is an unbounded self-join. Scale discipline, in order:
  *
  *  1. Apriori prefilter: a PAIR can only reach `minsup` if BOTH its
  *     items individually do (downward closure), so items below
  *     support are dropped BEFORE pair generation — on a long-tailed
  *     catalog that removes most of the item stream map-side (here a
  *     left-semi join against the frequent-item set).
  *  2. Pair fan-out is per-basket quadratic: each basket of k items
  *     emits k(k-1)/2 pairs via the orderkey self-join. TPC-H baskets
  *     are ≤7 lines so the fan-out is bounded by construction;
  *     production baskets (a crawler session, a power user's cart)
  *     need a basket-size cap or per-basket sampling first — the same
  *     bounded-fan-out contract the LSH band join documents.
  *  3. Support counting is ONE partial-agg'd hash aggregate on the
  *     (a, b) pair key; no row ever carries basket contents.
  */
object Basket {
  /** Part pairs co-ordered in ≥ `minsup` distinct orders. The apriori
    * step is a pure optimization (pairs it removes cannot pass the
    * HAVING), so the oracle states the plain self-join + HAVING and
    * the engine must produce exactly that result through pruning. */
  def frequentPairs(s: SparkSession, d: String, minsup: Int = 2): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val freq = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_ord"))
      .filter(col("n_ord") >= minsup)
      .select(col("l_partkey"))
    val fli = li.join(freq, Seq("l_partkey"), "left_semi")
    fli.as("a").join(fli.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minsup)
  }
}
