package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *     emits k(k-1)/2 pairs via the orderkey self-join, so ONE
  *     pathological basket (a crawler session, a power user's cart)
  *     can emit more pairs than the rest of the corpus combined.
  *     [[capBaskets]] enforces the bound: baskets over the cap are
  *     deterministically down-sampled to it (hash-ranked, so the kept
  *     subset is an unbiased pseudo-random sample, stable across
  *     partitionings and reruns), and every engagement is
  *     counter-recorded. TPC-H baskets are ≤7 lines so the cap never
  *     engages on the oracle-gated rows — capped ≡ uncapped below the
  *     cap is the property BasketSpec pins.
  *  3. Support counting is ONE partial-agg'd hash aggregate on the
  *     (a, b) pair key; no row ever carries basket contents.
  */
object Basket {
  /** Per-basket fan-out guard: keep at most `cap` items per basket,
    * chosen by xxhash64 rank (deterministic sample — item-id order
    * would bias toward low ids). Baskets at or under the cap pass
    * through untouched, so the guard is semantics-free exactly until
    * the moment it is needed; engagements land in bench metrics as
    * `<counterPrefix>_capped_baskets`. The window's partition key is
    * the pair join's own shuffle key, so the added cost is one
    * in-partition sort, not a new shuffle shape.
    *
    * PURE: the returned frame is a lazy description — no persist, no
    * job at construction time. Self-join consumers (frequentPairs,
    * g4's edge build) still pay ONE shuffle: both branches' exchanges
    * are identical, so Spark's exchange/stage reuse computes the
    * shuffle once (the deterministic xxhash64 rank makes per-branch
    * recomputation of the window above it safe). Cap engagements are
    * counted IN the caller's own job — exactly one row per
    * over-cap basket carries rank cap+1 — via an observed metric
    * routed to [[graft.Counters]]; delivery is async (see
    * [[graft.Counters.observeInto]]), so the counter lands shortly
    * after the consuming action, not during DataFrame construction. */
  def capBaskets(items: DataFrame, keyCol: String, itemCol: String,
      cap: Int, counterPrefix: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(keyCol), col(itemCol)), col(itemCol))
    val ranked = items.withColumn("_rnk", row_number().over(w))
    graft.Counters.observeInto(ranked, s"${counterPrefix}_capped_baskets",
        coalesce(sum(when(col("_rnk") === cap + 1, 1L)), lit(0L)))
      .filter(col("_rnk") <= cap).drop("_rnk")
  }

  /** Default basket cap: 64 items ⇒ ≤ 2,016 pairs per basket. TPC-H
    * orders hold ≤7 lines, so the oracle rows run uncapped semantics
    * through the capped code path. */
  val DefaultBasketCap = 64

  /** Part pairs co-ordered in ≥ `minsup` distinct orders. The apriori
    * step is a pure optimization (pairs it removes cannot pass the
    * HAVING), so the oracle states the plain self-join + HAVING and
    * the engine must produce exactly that result through pruning. */
  def frequentPairs(s: SparkSession, d: String, minsup: Int = 2,
      maxBasketSize: Int = DefaultBasketCap): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val freq = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_ord"))
      .filter(col("n_ord") >= minsup)
      .select(col("l_partkey"))
    val fli = capBaskets(li.join(freq, Seq("l_partkey"), "left_semi"),
      "l_orderkey", "l_partkey", maxBasketSize, "mb")
    fli.as("a").join(fli.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minsup)
  }
}
