package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.StringExpressions

/** Edit-distance fuzzy join — the entity-resolution primitive (typo'd
  * names, OCR'd labels, near-identical URLs) that naively is an N²
  * cross join with a string-distance predicate, which no cluster
  * survives at corpus scale.
  *
  * Scale shape is FastSS deletion-neighborhood blocking (Bocek et al.,
  * 2007): two strings within edit distance 1 MUST share a key in the
  * set {s} ∪ {s minus one character} — a substitution shares the
  * same-position deletion, an insert/delete shares the shorter string
  * itself. So each string fans out map-side to length+1 keys, the
  * self-join runs on those keys (shuffle by key, never all-pairs), and
  * an exact levenshtein filter on the candidates removes the blocking
  * false positives (transpositions like ab/ba share keys at distance
  * 2). Work is O(N·L) keys + candidate verification, vs O(N²)
  * distances; per-key fan-in is bounded by how many strings share a
  * deletion variant, the blocking's documented skew limit.
  */
object FuzzyJoin {
  /** All supplier-name pairs within edit distance 1 — TPC-H names
    * ("Supplier#000000042") differ in single digits, a realistic
    * stand-in for id/typo collisions. Oracle is the brute-force
    * levenshtein cross join; the engine must produce the identical
    * pair set through blocking. */
  def edit1Join(s: SparkSession, d: String): DataFrame =
    edit1JoinOf(
      Tables.supplier(s, d).select(col("s_name").as("name")).distinct())

  /** Jaro-Winkler top-k pairs [fuzzy_jw_topk]: the similarity-scored
    * half of entity resolution — rank candidate pairs by name
    * similarity instead of a hard edit-distance cutoff. The kernel is
    * the codegen'd native [[StringExpressions.JaroWinkler]] expression
    * (pinned to DuckDB's `jaro_winkler_similarity` bit-for-bit at the
    * 6-decimal rounding both sides apply), and the pair space is
    * BLOCKED on the name's first token before any scoring — JW weights
    * the shared prefix hardest, so first-token blocking is the
    * canonical JW blocking key. Σ|block|² candidate pairs instead of
    * N², each block co-shuffled by its key; the `key_a < key_b`
    * canonical ordering halves the space and makes ties total-ordered.
    * TakeOrderedAndProject keeps the global top-k at k·partitions
    * driver cost. */
  def jwTopK(s: SparkSession, d: String, k: Int = 25): DataFrame = {
    val p = Tables.part(s, d)
      .filter(col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
    p.as("l").join(p.as("r"),
        col("l.blk") === col("r.blk") &&
          col("l.p_partkey") < col("r.p_partkey"))
      .select(col("l.p_partkey").as("key_a"),
        col("r.p_partkey").as("key_b"),
        round(StringExpressions.jaroWinkler(
          col("l.p_name"), col("r.p_name")), 6).as("sim"))
      .orderBy(col("sim").desc, col("key_a").asc, col("key_b").asc)
      .limit(k)
  }

  /** Same over any single-column `name` frame of distinct strings. */
  def edit1JoinOf(names: DataFrame): DataFrame = {
    val n = col("name")
    // {s} ∪ single-deletion neighborhood; array_union drops duplicate
    // variants ("aa" deletes to "a" twice) before the fan-out
    val vars = names.select(n, explode(array_union(
      array(n),
      transform(sequence(lit(1), length(n)),
        i => concat(n.substr(lit(1), i - lit(1)),
          n.substr(i + lit(1), length(n) - i))))).as("variant"))
    vars.as("l").join(vars.as("r"),
        col("l.variant") === col("r.variant") &&
          col("l.name") < col("r.name"))
      .select(col("l.name").as("name_a"), col("r.name").as("name_b"))
      .distinct() // a pair can share several variant keys
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
      .orderBy(col("name_a").asc, col("name_b").asc)
  }
}
