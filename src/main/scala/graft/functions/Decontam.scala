package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark decontamination [DECON]: find training documents that
  * share word n-grams with the held-out evaluation split — the overlap
  * check every serious training-data pipeline runs before a corpus
  * ships (an eval document leaking into train invalidates the
  * benchmark). Splits come from [[Sampling.splitAssign]] (content-hash
  * buckets), so the check composes with the pipeline's own split
  * operator rather than inventing a second notion of "test set".
  *
  * Shape and scale: per-doc DISTINCT n-grams computed ONCE and
  * persisted (both join branches read the frame; Catalyst does not
  * share subtrees across joins — same convention as TextOps.tfidf),
  * then train-grams ⋈ eval-grams on the gram string. No broadcast
  * hint: this demo's eval split is a corpus-proportional 5%, so
  * forcing a broadcast would be a scale bug — AQE picks broadcast
  * whenever the eval side measures small (the fixed-benchmark-suite
  * case) and falls back to a shuffle join when it doesn't. At
  * production scale the gram key would be xxhash64(gram) (8-byte
  * keys, strings never leave the scan); the raw string key here keeps
  * the DuckDB oracle exact, and the n-gram construction is shared
  * with [[TextOps.wordNgrams]] so both engines emit identical grams.
  */
object Decontam {
  /** Per train-doc contamination report: how many distinct `n`-grams
    * it shares with any eval doc, and how many eval docs it hits.
    * Docs with no overlap (or too few tokens for an n-gram) are
    * absent — the report is the contaminated set, not the corpus. */
  def ngramOverlap(s: SparkSession, d: String, n: Int = 3): DataFrame =
    ngramOverlapOf(
      Tables.documents(s, d).select(col("doc_id"),
        Sampling.splitName(Sampling.splitBucket(col("text"))).as("split"),
        col("text")), n)

  /** Driver entry for the hashed scale path: identical report to
    * [[ngramOverlap]] (DecontamSpec proves hashed == string on corpora
    * where both run), so the SAME DuckDB string-gram oracle gates it —
    * the driver row certifies the 8-byte-key pipeline a 100 TB run
    * would actually execute, not just the small-data referee. */
  def ngramOverlapHashed(s: SparkSession, d: String, n: Int = 3): DataFrame =
    ngramOverlapHashedOf(
      Tables.documents(s, d).select(col("doc_id"),
        Sampling.splitName(Sampling.splitBucket(col("text"))).as("split"),
        col("text")), n)

  /** Same over any (doc_id, split, text) frame — specs drive this with
    * hand-built corpora where the overlap set is known exactly.
    * The grams persist is CALLER-owned (same convention as
    * TextOps.tfidf): Bench/Verify clearCache between queries; specs
    * and interactive sessions must clearCache after consuming, or
    * repeated calls accumulate one cached gram set each. */
  def ngramOverlapOf(docs: DataFrame, n: Int): DataFrame =
    overlapOf(docs, n, identity)

  /** Semantic decontamination [DECON-SEM]: train documents whose
    * EMBEDDING is near-identical to an eval-suite embedding — the
    * complement of the n-gram check: a paraphrase or template rewrite
    * that shares no word n-gram still collides in embedding space.
    * Contamination is PLANTED deterministically (the corpus_diff
    * pattern, rebuilt identically by the SQL oracle): the eval suite
    * is the vec_id % 20 == 0 slice of the embeddings table, except
    * that every vec_id % 40 == 0 member carries the EXACT embedding of
    * train vector vec_id+1 — planted hits surface at cosine 1.0 while
    * this corpus's background cosine tops out at ~0.51, so the 0.8
    * threshold is unambiguous at every SF.
    *
    * Scale shape: the EVAL side is collected + broadcast — bounded by
    * the eval-suite size by construction (benchmark suites are
    * thousands of documents, never corpus-sized) — and the train side
    * streams ONE map-only pass against it through the same primitive
    * kernel as [[Similarity.cosineTopK]]; candidates below the
    * threshold die in the kernel, so the only shuffle is the per-doc
    * hit aggregation over contaminated rows. At 100 TB of train data
    * this is scan-speed work with a KB-sized broadcast. */
  def semanticOverlap(s: SparkSession, d: String, t: Double = 0.8): DataFrame = {
    import s.implicits._
    val v = Similarity.vectors(s, d)
    val evalVecs = v.filter(pmod(col("vec_id"), lit(20)) === 0)
      .select(col("vec_id").as("eid"),
        when(pmod(col("vec_id"), lit(40)) === 0, col("vec_id") + 1)
          .otherwise(col("vec_id")).as("src"))
      .join(v.select(col("vec_id").as("src"), col("v")), Seq("src"))
      .select(col("eid").as("vec_id"), col("v"))
    val bc = Similarity.broadcastVecs(s, evalVecs)
    Similarity.vectors(s, d)
      .filter(pmod(col("vec_id"), lit(20)) =!= 0)
      .select(col("vec_id").as("_1"), col("v").as("_2"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        it.flatMap { case (id, vec) =>
          val n = Similarity.normArr(vec)
          qs.iterator.map { case (eid, qv, qn) =>
            (id, eid, Similarity.dotArr(qv, vec) / (qn * n))
          }.filter(_._3 >= t - 1e-6)
        }
      }
      .toDF("train_vec", "eid", "cos")
      .select(col("train_vec"), col("eid"), round(col("cos"), 6).as("cos6"))
      .filter(col("cos6") >= t)
      .groupBy(col("train_vec"))
      .agg(count(lit(1)).as("n_eval_hits"), max(col("cos6")).as("max_cos"))
  }

  /** The production-scale variant the Scaladoc above promises: gram
    * keys become xxhash64 LONGs inside the pre-explode transform, so
    * the dedup, the shuffle and the join carry 8-byte keys and the
    * gram STRINGS never leave the scan — at 100 TB that is the
    * difference between shuffling the corpus's n-gram text and
    * shuffling one long per gram. A 64-bit collision would need ~2^32
    * distinct grams per join key-space to matter (birthday bound);
    * DecontamSpec proves hashed == string reports on corpora where
    * both are computed. Same caller-owned persist contract as
    * [[ngramOverlapOf]]. */
  def ngramOverlapHashedOf(docs: DataFrame, n: Int): DataFrame =
    overlapOf(docs, n, arr => transform(arr, g => xxhash64(g)))

  /** Bloom-prefiltered decontamination [DECON-BLOOM]: the semi-join
    * reduction a 100 TB decon run actually executes. The eval side is
    * suite-size-bounded by construction, so its gram set compresses
    * into an m-bit Bloom bitmap (k Kirsch-Mitzenmacher probe
    * positions from xxhash64 + murmur3); the bitmap ships to every
    * executor as a words-array LITERAL, and the corpus-sized train
    * side is prefiltered MAP-SIDE — only grams whose k bits are all
    * set ever reach the shuffle. Bloom filters have no false
    * negatives, so the exact verify join on the survivors returns the
    * IDENTICAL report to [[ngramOverlap]] (the same DuckDB oracle
    * gates both); false positives cost one extra joined row each,
    * never correctness. Contrast with the `p3_bloom_join` gate, which
    * exercises Spark's AUTOMATIC runtime bloom injection — this is
    * the explicit, sketch-as-data form you reach for when the build
    * side is known-bounded and the filter must survive across stages.
    *
    * The bitmap build is distributed (probe positions → distinct →
    * per-word bit_or); the driver collects only m/64 longs (32 KB at
    * the default logM=18), never a gram. In production m scales with
    * the eval suite (bits ≈ 10× expected grams keeps FP under ~1%);
    * it is NOT corpus-dependent, which is the whole point. */
  def ngramOverlapBloom(s: SparkSession, d: String, n: Int = 3,
      logM: Int = 18, k: Int = 3): DataFrame =
    bloomOverlapOf(
      Tables.documents(s, d).select(col("doc_id"),
        Sampling.splitName(Sampling.splitBucket(col("text"))).as("split"),
        col("text")), n, logM, k)

  private[graft] def bloomOverlapOf(docs: DataFrame, n: Int,
      logM: Int, k: Int): DataFrame = {
    val m = 1L << logM
    val nWords = (1 << logM) / 64
    val grams = docs
      .select(col("doc_id"), col("split"),
        TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("split"),
        explode(TextOps.wordNgrams("tk", n)).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // populate before the build/probe branches race it
    // Kirsch-Mitzenmacher double hashing: pos_i = (h1 + i*h2) mod m
    def probe(i: Int): Column =
      pmod(xxhash64(col("g")) + lit(i.toLong) * hash(col("g")).cast("long"),
        lit(m))
    val evalG = grams.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("g"))
    val wordRows = evalG
      .select(explode(array((0 until k).map(probe): _*)).as("pos"))
      .distinct()
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        col("pos").bitwiseAND(lit(63L)).cast("int").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("word"))
      .collect()
    val bitmap = new Array[Long](nWords)
    wordRows.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    val bm = lit(bitmap)
    // per-probe (word, bit) columns, then one codegen'd bit test —
    // the Scala functions API only shifts by Int literals, so the
    // column-shift goes through expr()
    val probed = grams.filter(col("split") === "train")
      .select(Seq(col("doc_id").as("train_doc"), col("g")) ++
        (0 until k).flatMap(i => Seq(
          element_at(bm, shiftright(probe(i), 6).cast("int") + 1)
            .as(s"w$i"),
          probe(i).bitwiseAND(lit(63L)).cast("int").as(s"b$i"))): _*)
    val hit = (0 until k)
      .map(i => expr(s"(shiftright(w$i, b$i) & 1) = 1"))
      .reduce(_ && _)
    val survivors = probed.filter(hit).select(col("train_doc"), col("g"))
    // pruning on the record (cheap: both counts scan the cached gram
    // frame map-side): survivors/train_grams is the sketch's measured
    // selectivity — FP-rate drift after an eval-suite change shows up
    // in the metrics line instead of as silent join growth
    graft.Counters.add("bloom_train_grams",
      grams.filter(col("split") === "train").count())
    graft.Counters.add("bloom_survivors", survivors.count())
    survivors.join(evalG, Seq("g"))
      .groupBy(col("train_doc"))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("test_doc")).as("n_test_docs"))
  }

  /** Shared overlap pipeline; `gramKey` maps the gram array before the
    * explode (identity = string keys, xxhash64 = the scale path). */
  private def overlapOf(docs: DataFrame, n: Int,
      gramKey: Column => Column): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("split"),
        TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("split"),
        explode(gramKey(TextOps.wordNgrams("tk", n))).as("g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the join reads it twice: the train branch and
    // the AQE-broadcast eval branch otherwise start concurrently
    // against a cold cache and EACH recomputes the full gram pipeline
    // (measured: two extra ~10 s subtree executions at sf0.1)
    grams.count()
    val train = grams.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("g"))
    val eval_ = grams.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc"), col("g"))
    train.join(eval_, Seq("g"))
      .groupBy(col("train_doc"))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("test_doc")).as("n_test_docs"))
  }
}
