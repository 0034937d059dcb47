package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{StringExpressions, VectorExpressions}

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
    * shared stopword multiplies). Two lossless physical strategies,
    * chosen by a COST ESTIMATE from vocabulary-level stats (an AQE-
    * style decision — blocking selectivity is a data property, not a
    * constant):
    *
    *  - [[cosinePrefixJoin]] — the PREFIX-FILTER set-similarity join
    *    (Chaudhuri et al. 2006 / Bayardo et al. 2007 all-pairs).
    *    Candidate volume Σ_token |prefix postings|·|postings| — near-
    *    linear on Zipfian corpora where rare tokens are discriminating.
    *  - [[cosineAllPairsJoin]] — blocked all-pairs over compact
    *    hash-sorted vectors (the [[graft.functions.Similarity]]
    *    embeddingNearDupBlocked shape adapted to sparse token
    *    vectors). O(n²/2) merge-dot kernels, zero pair shuffle.
    *
    * On THIS synthetic corpus the documents are template-heavy (median
    * pairwise cosine ≈ 0.6): measured at sf0.1, the prefix filter
    * admits 12.38M of 12.5M possible pairs, so the "optimized" path
    * pays a 90M-row candidate dedup shuffle (measured 37 s) to avoid
    * ~nothing — the estimator sees that from two vocabulary aggregates
    * and takes the all-pairs kernel (~1 s) instead. A Zipfian corpus
    * flips the decision; FuzzyJoinSpec pins BOTH paths to the same
    * pair set. Weights reuse the tf·ln(N/df) convention of
    * [[graft.functions.TextOps.tfidf]]. */
  def cosineJoin(s: SparkSession, d: String, t: Double = 0.9): DataFrame =
    cosineJoinOf(s,
      Tables.documents(s, d).select(col("doc_id"), col("text")), t)

  /** Adaptive cosine join over any (doc_id, text) frame — the entry
    * [[cosineJoin]] binds to the documents table; [[cosineZipf]] binds
    * to the Zipfian-reshaped frame so BOTH physical paths carry a
    * driver correctness row (the synthetic corpus is template-heavy and
    * only ever exercises the all-pairs branch). */
  def cosineJoinOf(s: SparkSession, docs: DataFrame, t: Double,
      attachBudgetBytes: Long = -1L): DataFrame = {
    import s.implicits._
    val wn = weightedVectorsOf(docs)
    // Selectivity estimate: candidate volume = Σ_τ prefix(τ)·postings(τ)
    // from two vocabulary-sized aggregates (rows = distinct tokens,
    // never data-sized); one bounded 1-row collect, same contract as
    // the merge cutoff / stratum offsets elsewhere in the suite.
    val est = prefixPostings(wn, t)
      .groupBy(col("token")).agg(count(lit(1)).as("np"))
      .join(wn.groupBy(col("token")).agg(count(lit(1)).as("nf")), Seq("token"))
      .agg(sum(col("np") * col("nf")).as("volume"))
      .crossJoin(wn.select(col("doc_id")).distinct()
        .agg(count(lit(1)).as("n_docs")))
      .head()
    // empty corpus (or all-zero-norm docs): the SUM over zero rows is
    // NULL — short-circuit to an empty pair frame instead of NPE
    if (est.isNullAt(0) || est.getLong(1) == 0L)
      return Seq.empty[(Long, Long, Double)].toDF("doc_a", "doc_b", "sim")
    val (volume, nDocs) = (est.getLong(0), est.getLong(1))
    val takeAllPairs = volume.toDouble > nDocs.toDouble * nDocs / 4
    // bench-visible record of the chosen physical path
    graft.Counters.add(
      if (takeAllPairs) "fuzzy_path_allpairs" else "fuzzy_path_prefix", 1L)
    if (takeAllPairs) cosineAllPairsJoin(wn, t)
    else cosinePrefixJoin(wn, t, attachBudgetBytes)
  }

  /** [fuzzy_cosine_zipf]: the adaptive join over a Zipfian-reshaped
    * corpus derived deterministically from the documents table (the
    * corpus_diff planting pattern — the oracle reconstructs the
    * identical frame in SQL). Each doc gets 3 corpus-wide stopwords
    * (df = N ⇒ idf 0: the term the prefix filter must discard), six
    * 4-doc-group tokens (the discriminating near-dup signal), and one
    * unique token — a df spectrum {N, ~4, 1} whose prefix postings are
    * tiny, so the cost estimate takes [[cosinePrefixJoin]] and the
    * driver's correctness row exercises the path the template-heavy
    * real corpus never reaches. */
  def cosineZipf(s: SparkSession, d: String, t: Double = 0.75): DataFrame =
    cosineJoinOf(s, zipfCorpus(s, d), t)

  /** [fuzzy_cosine_shuffle]: the same Zipfian prefix-path join with
    * the attach budget pinned to ZERO, so the exact-verify vector
    * attach takes its doc_id SORT-MERGE branch — the branch a
    * corpus-scale run takes when the vector frame outgrows an executor
    * broadcast. Result-identical to [fuzzy_cosine_zipf] (the gate is
    * the same oracle SQL); what this row adds is a driver-green
    * CORRECTNESS entry + `fuzzy_attach_shuffle` counter for the one
    * physical branch that previously lived only in FuzzyJoinSpec. */
  def cosineZipfShuffle(s: SparkSession, d: String, t: Double = 0.75): DataFrame =
    cosineJoinOf(s, zipfCorpus(s, d), t, attachBudgetBytes = 0L)

  /** Zipfian token frame: deterministic (doc_id, text) reshape of the
    * documents table (ids only; content is id-derived so DuckDB can
    * rebuild it exactly). */
  private[graft] def zipfCorpus(s: SparkSession, d: String): DataFrame = {
    val g = expr("doc_id div 4").cast("string")
    val toks = Seq(lit("c0"), lit("c1"), lit("c2")) ++
      (0 to 5).map(k => concat(lit("g"), g, lit("_" + k))) :+
      concat(lit("u"), col("doc_id").cast("string"))
    Tables.documents(s, d)
      .select(col("doc_id"), concat_ws(" ", toks: _*).as("text"))
  }

  /** Prefix postings of every doc under threshold t: sort each doc's
    * tokens by the global rarest-first order (df asc), keep the head
    * whose residual L2 norm is ≥ t — equivalently, the commonest-first
    * running Σwn² (which IS the rarest-first residual including the
    * current token) stays ≥ t². The 1e-9 margin keeps float jitter in
    * the running sum from shaving a boundary token off the prefix
    * (blocking must stay lossless; verification is exact anyway). */
  private def prefixPostings(wn: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val revCum = Window.partitionBy(col("doc_id"))
      .orderBy(col("df").desc, col("token").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn.withColumn("rev_cum", sum(col("wn") * col("wn")).over(revCum))
      .filter(col("rev_cum") >= (t - 1e-9) * (t - 1e-9))
      .select(col("doc_id"), col("token"))
  }

  /** Compact vector form: one row per doc, token-hash-sorted parallel
    * primitive arrays (the merge-dot kernel's input). 64-bit token
    * hashes: collision odds ~vocab²/2^65, immaterial. */
  private def packedVectors(wn: DataFrame): DataFrame =
    wn.select(col("doc_id"), xxhash64(col("token")).as("h"), col("wn"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("h"), col("wn")))).as("v"))
      .select(col("doc_id"),
        expr("transform(v, x -> x.h)").as("hs"),
        expr("transform(v, x -> x.wn)").as("ws"))

  /** Merge-intersection dot over hash-sorted sparse vectors with
    * Spark/DuckDB round-HALF_UP parity on the emitted value. The dot
    * runs in the codegen'd [[VectorExpressions.MergeDot]] expression,
    * pipelined inside the join stage over UnsafeArrayData in place —
    * the previous Dataset kernel decoded four primitive arrays per
    * pair (n²/2 allocations on the all-pairs path: 5.5 s GC for 6.15 s
    * wall in the r06 driver metrics). Spark's `round` on DoubleType is
    * the same Double.toString-backed BigDecimal HALF_UP the old kernel
    * applied, so emitted values are bit-identical. */
  private def dotVerify(pairs: DataFrame, t: Double): DataFrame =
    pairs
      .select(col("doc_a"), col("doc_b"),
        VectorExpressions.mergeDot(
          col("ha"), col("wa"), col("hb"), col("wb")).as("dot"))
      .filter(col("dot") >= t - 1e-6)
      .select(col("doc_a"), col("doc_b"), round(col("dot"), 6).as("sim"))
      .filter(col("sim") >= t)

  /** Prefix-filtered path: candidates only where a PREFIX token of one
    * side meets a token of the other. Lossless by the Cauchy-Schwarz
    * bound: if no shared token touches either prefix, every shared
    * token lies in one side's suffix, so dot ≤ ‖suffix‖·1 < t. The
    * exact verify attaches compact vectors to the deduped candidates
    * and runs the merge-dot kernel — never a relational token join,
    * which would shuffle |cand|·|doc| rows.
    *
    * The attach is SIZE-GATED (r06 verdict): the vector frame is one
    * compact row per document, so broadcasting it is only legal while
    * it fits an executor — at corpus scale the broadcast side IS the
    * corpus and would OOM every executor. Under `attachBudgetBytes`
    * (default: the session's autoBroadcastJoinThreshold) the attach is
    * a broadcast hash join; above it, a shuffle join on doc_id —
    * candidates and vectors are both doc-keyed, so the sort-merge
    * co-partitions and nothing is replicated. */
  private[graft] def cosinePrefixJoin(wn: DataFrame, t: Double,
      attachBudgetBytes: Long = -1L): DataFrame = {
    val pref = prefixPostings(wn, t)
    val full = wn.select(col("doc_id"), col("token"))
    val cand = pref.as("p").join(full.as("f"),
        col("p.token") === col("f.token"))
      .filter(col("p.doc_id") =!= col("f.doc_id"))
      .select(least(col("p.doc_id"), col("f.doc_id")).as("doc_a"),
        greatest(col("p.doc_id"), col("f.doc_id")).as("doc_b"))
      .distinct()
    val packed = packedVectors(wn)
    // attach-side size from vocabulary-level stats over the cached wn
    // frame: ~20 B per (hash, weight) entry + per-doc row overhead
    val st = wn.agg(count(lit(1)).as("entries"),
      count_distinct(col("doc_id")).as("docs")).head()
    val estBytes = st.getLong(0) * 20L + st.getLong(1) * 64L
    val budget = if (attachBudgetBytes >= 0L) attachBudgetBytes
      else wn.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val bcast = budget > 0L && estBytes <= budget
    graft.Counters.add(
      if (bcast) "fuzzy_attach_broadcast" else "fuzzy_attach_shuffle", 1L)
    val a = packed.select(col("doc_id").as("doc_a"),
      col("hs").as("ha"), col("ws").as("wa"))
    val b = packed.select(col("doc_id").as("doc_b"),
      col("hs").as("hb"), col("ws").as("wb"))
    val attached =
      if (bcast) cand.join(broadcast(a), Seq("doc_a"))
        .join(broadcast(b), Seq("doc_b"))
      else cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
    dotVerify(attached.select(col("doc_a"), col("doc_b"),
      col("ha"), col("wa"), col("hb"), col("wb")), t)
  }

  /** Blocked all-pairs path for degenerate blocking: replicate each
    * compact vector to its nBlocks block-pairs (Similarity's
    * responsibility scheme — every unordered pair met exactly once),
    * equi-join on the block-pair id, and stream every pair through the
    * merge-dot kernel INSIDE the join stage — the wide rows are
    * pipelined into the filter, never shuffled or materialized. */
  private[graft] def cosineAllPairsJoin(wn: DataFrame, t: Double,
      nBlocks: Int = 8): DataFrame = {
    val rep = packedVectors(wn)
      .withColumn("blk", pmod(col("doc_id"), lit(nBlocks)).cast("int"))
      .select(col("doc_id"), col("hs"), col("ws"), col("blk"),
        explode(transform(sequence(lit(0), lit(nBlocks - 1)),
          o => least(col("blk"), o) * nBlocks + greatest(col("blk"), o)))
          .as("bp"))
    // EXPLICIT partition count on the join inputs: the pair volume is
    // n²/2 merge-dot evaluations but the shuffled BYTES are tiny (one
    // compact vector row per doc per block-pair), so AQE's byte-based
    // partition coalescing would fold the kernel stage onto 1-2 cores
    // (measured: 17.5 s coalesced vs 4.5 s at full width at sf0.1 —
    // CPU-bound stages must size by work, not bytes). A user-specified
    // repartition-by-number is exempt from AQE coalescing, and both
    // sides hash the same key at the same width, so the join adds no
    // further exchange.
    val nParts = wn.sparkSession.sparkContext.defaultParallelism
    val a = rep.select(col("bp"), col("doc_id").as("doc_a"),
      col("hs").as("ha"), col("ws").as("wa"), col("blk").as("ba"))
      .repartition(nParts, col("bp"))
    val b = rep.select(col("bp"), col("doc_id").as("doc_b"),
      col("hs").as("hb"), col("ws").as("wb"), col("blk").as("bb"))
      .repartition(nParts, col("bp"))
    dotVerify(a.join(b, Seq("bp"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("ba"), col("bb")) * nBlocks +
          greatest(col("ba"), col("bb")) === col("bp"))
      .select(col("doc_a"), col("doc_b"), col("ha"), col("wa"),
        col("hb"), col("wb")), t)
  }

  /** L2-normalized TF-IDF token vectors (doc_id, token, df, wn) —
    * shared by the prefix-filtered join and its brute-force referee.
    * (doc, token, tf) is one partial-agg'd shuffle; df folds out of
    * the SAME frame (one row per doc-token pair, so count(*) per
    * token IS df — no second corpus pass).
    *
    * Cache lifecycle (r06 advice — the old double-persist had no
    * unpersist path, so repeated adaptive-join calls accumulated
    * cached partitions): the tf frame is persisted only long enough to
    * feed the df aggregate and the weight join, then the result is
    * EAGERLY localCheckpoint'ed — materialized into GC-reclaimable
    * block-manager blocks with the window/join lineage truncated — and
    * tf is unpersisted before returning. Dropping the returned frame
    * releases the blocks via the ContextCleaner; nothing outlives the
    * caller. */
  private[graft] def weightedVectors(s: SparkSession, d: String): DataFrame =
    weightedVectorsOf(
      Tables.documents(s, d).select(col("doc_id"), col("text")))

  private[graft] def weightedVectorsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .persist(lvl)
    tf.count() // populate before the df branch and the join race it
    // df comes from a partial-agg'd groupBy + join — NOT a token-
    // partitioned window, which would funnel a hot stopword's whole
    // posting list through one task. The L2 norm, by contrast, IS a
    // doc-partitioned window (bounded by document length at any
    // corpus size): it saves re-shuffling the full weighted frame
    // through a groupBy + join-back.
    val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val wn = tf.join(dfr, Seq("token")).crossJoin(nDocs)
      .withColumn("w", col("tf") * log(col("n_docs") / col("df")))
      .withColumn("nm", sqrt(sum(col("w") * col("w"))
        .over(Window.partitionBy(col("doc_id")))))
      .filter(col("nm") > 0)
      .select(col("doc_id"), col("token"), col("df"),
        (col("w") / col("nm")).as("wn"))
      .localCheckpoint() // eager: materializes, truncates lineage
    tf.unpersist()
    wn
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
