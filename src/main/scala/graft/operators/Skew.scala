package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot-key mitigation utilities (SURVEY §4.2: address-keyed joins on
  * exchange hot-wallets are skew-prone). AQE's skew-join splitting
  * handles the join side at runtime; these cover the aggregation and
  * replicated-join patterns AQE doesn't:
  *
  *  - [[saltedAgg]]: two-phase aggregation for algebraic aggregates
  *    whose per-key state is large or whose final-stage key is hot —
  *    phase 1 aggregates (key, salt) so a hot key's rows spread over
  *    `saltN` reducers; phase 2 merges the `saltN` partials per key.
  *    (Plain sum/count already get map-side partial aggregation; the
  *    salt matters for collect_list-like or high-cardinality-state
  *    aggregates where one reducer would hold the whole hot key.)
  *
  *  - [[saltedJoin]]: fact⋈dim equi-join where the dim is small enough
  *    to replicate `saltN`× but broadcast is off the table; each fact
  *    row picks a random-but-deterministic salt, the dim is exploded
  *    across all salts, and the join key becomes (key, salt) — a hot
  *    key's rows land on `saltN` different reducers.
  */
object Skew {
  /** Row-unique salt in [0, saltN): derived from the row's position,
    * never its values — a hot key whose payload is constant (the
    * classic count-skew case) still fans out over all salt buckets. */
  private[operators] def rowSalt(saltN: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(saltN))

  /** Two-phase salted sum/count per key; equals the direct
    * groupBy(key).agg(sum, count) for any saltN ≥ 1. */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
      saltN: Int = 16): DataFrame =
    df.groupBy(key.as("k"), rowSalt(saltN).as("salt"))
      .agg(sum(value).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col("k"))
      .agg(sum(col("psum")).as("total"), sum(col("pcnt")).as("n"))

  /** Oracle-gated demonstration: a DELIBERATELY skewed join (75% of
    * lineitem rows collapse onto one hot key) routed through
    * [[saltedJoin]], then aggregated. The DuckDB oracle runs the plain
    * unsalted join — passing proves the salt spread changes the
    * physical distribution, never the result. This is the pattern for
    * hot-wallet/hot-document keys where the dim replicates but the
    * fact side must not hit a single reducer. */
  def skewDemo(s: SparkSession, d: String): DataFrame = {
    val fact = graft.Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 4 =!= 0, lit(0L))
        .otherwise(col("l_orderkey")).as("skew_key"),
      col("l_quantity"))
    val dim = fact.select(col("skew_key").as("dim_key")).distinct()
      .withColumn("grp", pmod(col("dim_key"), lit(7L)))
    saltedJoin(fact, dim, "skew_key", "dim_key")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
  }

  /** Salted equi-join: fact rows get a row-position salt (see
    * [[rowSalt]] — a value-derived hash would collapse a hot key with
    * constant payload onto ONE salt bucket, exactly the case salting
    * exists for), dim rows replicate across every salt; result equals
    * the plain inner join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltN: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", rowSalt(saltN))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltN - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }
}
