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

  /** TF-IDF-weighted cosine set-similarity join [fuzzy_cosine_join] —
    * the third industrial fuzzy-join member after edit distance and
    * Jaro-Winkler: all document pairs whose TF-IDF token vectors have
    * cosine ≥ t. The naive form is the full token self-join (every
    * shared stopword multiplies); the scale shape here is the
    * PREFIX-FILTER set-similarity join (Chaudhuri et al. 2006 /
    * Bayardo et al. 2007 all-pairs): sort each doc's tokens by a
    * global rarest-first order (df asc), keep the PREFIX whose
    * residual L2 norm is < t, and generate candidates only where a
    * PREFIX token of one side meets a token of the other. Lossless by
    * the Cauchy-Schwarz bound: if no shared token touches either
    * prefix, every shared token lies in one side's suffix, so
    * dot ≤ ‖suffix‖·1 < t. Candidates then verify EXACTLY via a
    * shared-token join restricted to the candidate pairs. Work is
    * Σ_token |prefix postings|·|postings| + Σ_cand |doc| instead of
    * Σ_token |postings|², and common tokens (high df, low idf weight)
    * fall out of prefixes first — precisely the postings that explode
    * the naive join. Weights reuse the tf·ln(N/df) convention of
    * [[graft.functions.TextOps.tfidf]]. */
  def cosineJoin(s: SparkSession, d: String, t: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wn = weightedVectors(s, d)
    // Prefix mark: commonest-first running Σwn² is exactly the
    // rarest-first residual norm² including the current token, so
    // in_prefix ⟺ residual² ≥ t². The 1e-9 margin keeps float jitter
    // in the running sum from shaving a boundary token off the prefix
    // (blocking must stay lossless; verification is exact anyway).
    val revCum = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("token").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pref = wn
      .withColumn("rev_cum", sum(col("wn") * col("wn")).over(revCum))
      .filter(col("rev_cum") >= (t - 1e-9) * (t - 1e-9))
      .select(col("doc_id"), col("token"))
    val full = wn.select(col("doc_id"), col("token"))
    def half(p: DataFrame, f: DataFrame): DataFrame =
      p.as("p").join(f.as("f"), col("p.token") === col("f.token"))
        .filter(col("p.doc_id") =!= col("f.doc_id"))
        .select(least(col("p.doc_id"), col("f.doc_id")).as("doc_a"),
          greatest(col("p.doc_id"), col("f.doc_id")).as("doc_b"))
    val cand = half(pref, full).distinct()
    // exact verify: shared-token join restricted to candidate pairs
    val va = wn.select(col("doc_id").as("doc_a"), col("token"), col("wn").as("wa"))
    val vb = wn.select(col("doc_id").as("b_id"), col("token").as("b_token"),
      col("wn").as("wb"))
    cand.join(va, Seq("doc_a"))
      .join(vb, col("doc_b") === col("b_id") && col("token") === col("b_token"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(round(sum(col("wa") * col("wb")), 6).as("sim"))
      .filter(col("sim") >= t)
  }

  /** L2-normalized TF-IDF token vectors (doc_id, token, df, wn) —
    * shared by the prefix-filtered join and its brute-force referee.
    * (doc, token, tf) is one partial-agg'd shuffle; df folds out of
    * the SAME frame (one row per doc-token pair, so count(*) per
    * token IS df — no second corpus pass). Persisted: multiple
    * downstream branches (caller-owned lifetime, clearCache between
    * queries — same convention as TextOps.tfidf). */
  private[graft] def weightedVectors(s: SparkSession, d: String): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(lvl)
    val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).cast("double").as("n_docs"))
    val w = tf.join(dfr, Seq("token")).crossJoin(nDocs)
      .select(col("doc_id"), col("token"), col("df"),
        (col("tf") * log(col("n_docs") / col("df"))).as("w"))
    val nrm = w.groupBy(col("doc_id")).agg(sqrt(sum(col("w") * col("w"))).as("nm"))
    w.join(nrm, Seq("doc_id")).filter(col("nm") > 0)
      .select(col("doc_id"), col("token"), col("df"),
        (col("w") / col("nm")).as("wn"))
      .persist(lvl)
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
