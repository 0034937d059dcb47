package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deduplication operators for a training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection over
  * the `documents` table.
  *
  * Scale design (100 TB):
  *  - Exact dedup is a single hash-aggregate shuffle on the text.
  *  - Shingles are 64-bit FNV-1a hashes computed once per doc in a
  *    primitive-array kernel (mapPartitions) — docs leave the scan as
  *    one narrow (doc_id, n, sorted long[]) row, so every downstream
  *    join/shuffle moves longs, never shingle strings. Collisions
  *    (~n²/2⁶⁵) are the only deviation from string-set semantics.
  *  - All-pairs Jaccard joins docs on shared shingle hash — quadratic
  *    in per-shingle doc frequency; it is the small-data oracle path.
  *  - The scale path is MinHash+LSH: 64 min-hashes from integer mixing
  *    (map-only), band join shuffles only (band, bandHash) keys, and
  *    every candidate is verified with the exact sorted-merge Jaccard,
  *    so false positives cost compute, never correctness. Band width
  *    r=2 × 32 bands ⇒ P(miss) at j≥0.6 is (1−0.6²)³²≈6e−7.
  */
object Dedup {
  /** Exact duplicate groups by full text equality (hash-groupBy).
    * Surfaces md5(text) instead of the text itself so output stays
    * narrow at scale. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(md5(col("text")).as("text_md5"), col("keeper_id"), col("n_copies"))

  /** Paragraph-level dedup [PARA] (the CCNet/RefinedWeb shape): drop
    * repeated paragraphs ACROSS the corpus, keeping each distinct
    * paragraph only at its first occurrence (smallest (doc_id, idx)),
    * and rebuild every document from its surviving paragraphs — the
    * boilerplate-removal pass that document-level dedup can't do.
    * The synthetic corpus has no paragraph breaks, so documents are
    * chunked into fixed 10-token pseudo-paragraphs deterministically;
    * exact-duplicate documents exercise the all-paragraphs-elsewhere
    * path (n_kept = 0, empty rebuilt text).
    *
    * Scale: keeper election is groupBy(paragraph) + min(struct) — a
    * partial-agg'd hash aggregate, so a boilerplate paragraph repeated
    * a billion times combines map-side instead of sorting through one
    * window task; the join back is co-partitioned on the paragraph;
    * the per-doc rebuild holds only that doc's own paragraphs. */
  /** Fixed-width pseudo-paragraph rows (doc_id, pidx, para): the
    * whitespace tokenization chunked `paraTokens` tokens at a time,
    * 1-based pidx, last chunk short. A primitive mapPartitions kernel,
    * NOT the transform/sequence/slice/array_join HOF stack it replaces
    * — higher-order functions evaluate per element through boxed
    * lambdas outside codegen, and the triple-nested form was the top
    * executor-CPU line of the whole suite (43 s CPU inside
    * dedup_cc_clusters at sf0.1; the kernel is string split + slice).
    * Output strings are identical to the HOF formulation (empty text →
    * one empty paragraph, same boundaries), so both oracles are
    * unaffected. */
  private[graft] def paragraphsOf(docs: DataFrame,
      paraTokens: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val n = (toks.length + paraTokens - 1) / paraTokens
        (0 until n).iterator.map { i =>
          val from = i * paraTokens
          val until = math.min(from + paraTokens, toks.length)
          val sb = new java.lang.StringBuilder()
          var k = from
          while (k < until) {
            if (k > from) sb.append(' ')
            sb.append(toks(k)); k += 1
          }
          (id, i + 1, sb.toString)
        }
      })
      .toDF("doc_id", "pidx", "para")
  }

  def paragraphDedup(s: SparkSession, d: String, paraTokens: Int = 10): DataFrame = {
    // both the keeper election and the join-back read this — persist,
    // or the corpus scan+chunk runs once per branch (same caller-owned
    // clearCache lifetime convention as TextOps.tfidf)
    val paras = paragraphsOf(
        Tables.documents(s, d).select(col("doc_id"), col("text")), paraTokens)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepers = paras.groupBy(col("para"))
      .agg(min(struct(col("doc_id"), col("pidx"))).as("k"))
      .select(col("para"), col("k.doc_id").as("kdoc"), col("k.pidx").as("kidx"))
    paras.join(keepers, Seq("para"))
      .withColumn("kept",
        col("doc_id") === col("kdoc") && col("pidx") === col("kidx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("kept"), 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pidx"), col("para"))))),
          x => x.getField("para")), " ").as("kept_text"))
  }

  /** Corpus snapshot diff [DIFF]: classify every doc_id across two
    * corpus versions as added / removed / changed / unchanged — the
    * incremental-ingest audit that decides what downstream stages
    * (dedup, embedding, packing) actually need to recompute. Content
    * comparison is by md5, so the full-outer join moves one narrow
    * hash row per doc, never text; at 100 TB it's a sort-merge on
    * doc_id with map-side hashing.
    *
    * There is only one corpus version in the testdata, so the "old"
    * snapshot is derived deterministically (the planting pattern):
    * docs with id % 11 = 0 are absent from old (⇒ added), id % 7 = 0
    * carried a " legacy" suffix (⇒ changed), and old had extra
    * id+1000000 rows for id % 13 = 0 (⇒ removed) — the oracle
    * reconstructs the identical old snapshot in SQL. */
  def corpusDiff(s: SparkSession, d: String): DataFrame = {
    val cur = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val old = cur.filter(col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")).as("text"))
      .unionByName(cur.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    old.select(col("doc_id"), md5(col("text")).as("h_old"))
      .join(cur.select(col("doc_id"), md5(col("text")).as("h_new")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  case class DocShingles(doc_id: Long, n: Int, sh: Array[Long])

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  /** Distinct word-3-gram shingles per doc as sorted 64-bit FNV-1a
    * hashes; docs with <3 tokens are dropped (mirrors the reference
    * corpus predicates and the DuckDB oracle's len(t)>=3). */
  def shingleHashes(s: SparkSession, d: String): Dataset[DocShingles] =
    shingleHashesOf(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** Shingle kernel over an arbitrary (doc_id, text) frame — lets the
    * streaming near-dup gate run the SAME hashing over each
    * micro-batch that the batch referee runs over the corpus. */
  def shingleHashesOf(docs: DataFrame): Dataset[DocShingles] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < 3) Iterator.empty
        else {
          val m = toks.length - 2
          val hs = new Array[Long](m)
          var i = 0
          while (i < m) {
            var h = FnvOffset
            var j = i
            while (j < i + 3) {
              val t = toks(j)
              var k = 0
              while (k < t.length) { h ^= t.charAt(k); h *= FnvPrime; k += 1 }
              h ^= ' '; h *= FnvPrime // token separator
              j += 1
            }
            hs(i) = h
            i += 1
          }
          java.util.Arrays.sort(hs)
          var w = 0; var r = 0
          while (r < m) { if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }; r += 1 }
          Iterator.single(DocShingles(id, w, java.util.Arrays.copyOf(hs, w)))
        }
      })
  }

  /** Intersection size of two sorted long arrays (linear merge). */
  private[graft] def intersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1 else j += 1
    }
    c
  }

  /** Exact n-gram Jaccard near-dup pairs: docs sharing ≥1 shingle,
    * J = |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Integer-ratio math ⇒
    * bit-exact vs the SQL oracle. The shared-shingle join is the
    * blocking step — disjoint docs never meet — and carries only
    * (long, long, int) rows through the shuffle. */
  def ngramJaccard(s: SparkSession, d: String, threshold: Double = 0.6): DataFrame =
    sharedShingleCounts(s, d)
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Shared-shingle pair counts (doc_a, doc_b, na, nb, common) — the
    * blocking join both set-similarity referees ([[ngramJaccard]],
    * [[containmentPairs]]) score from; only the normalizer differs. */
  private def sharedShingleCounts(s: SparkSession, d: String): DataFrame = {
    // both join sides come from this one frame; persist so the
    // tokenize+hash kernel scans the corpus once, not per side
    val sh = shingleHashes(s, d).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count() // populate before the self-join's sides race a cold cache
    val e = sh.select(col("doc_id"), col("n"), explode(col("sh")).as("shh"))
    val a = e.select(col("doc_id").as("doc_a"), col("n").as("na"), col("shh"))
    val b = e.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("shh"))
    a.join(b, Seq("shh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
  }

  /** Asymmetric containment near-dup [dedup_containment]:
    * C = |A∩B| / min(|A|,|B|) ≥ threshold — the quote/excerpt
    * detector. Jaccard normalizes by the UNION, so a short document
    * fully embedded in a long one scores low (|A|/|B| at best) and
    * slips a Jaccard dedup; containment normalizes by the smaller
    * set, so full embedding scores 1.0 regardless of the size gap.
    * Identical shared-shingle blocking join and integer-count math as
    * [[ngramJaccard]] (this is the small-data referee). NOTE on the
    * scale path: MinHash-LSH banding recall is monotone in JACCARD,
    * and the pair this detector exists for — short excerpt inside a
    * long doc — is precisely high-containment/LOW-Jaccard (a 6-of-20
    * token quote is J≈0.22, ≈20% band-miss at r=2/b=32), so plain
    * banding is the wrong recall stage here. A containment-aware
    * candidate stage — prefix filtering on the smaller set's rarest
    * shingles, or one-sided MinHash (signatures of A∩B normalized by
    * min|·|) — is what a 100 TB deployment would block with, keeping
    * this exact count as the verify. */
  def containmentPairs(s: SparkSession, d: String,
      threshold: Double = 0.8): DataFrame =
    sharedShingleCounts(s, d)
      .withColumn("containment",
        col("common") / least(col("na"), col("nb")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("containment"))

  val MinhashK = 64   // signature length
  val BandR    = 2    // rows per band -> 32 bands

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  case class DocBand(doc_id: Long, band: Int, bh: Long)

  /** LSH bucket keys: MinhashK integer-mixed min-hashes per doc,
    * folded into MinhashK/BandR band hashes — all map-side, one
    * (doc_id, band, bandHash) row per band per doc. */
  def minhashBands(s: SparkSession, d: String): Dataset[DocBand] =
    minhashBandsOf(shingleHashes(s, d))

  /** Band keys from an existing shingle frame (lets callers share one
    * persisted corpus scan across banding and verification). */
  def minhashBandsOf(shingles: Dataset[DocShingles]): Dataset[DocBand] = {
    import shingles.sparkSession.implicits._
    val nBands = MinhashK / BandR
    shingles.mapPartitions(_.flatMap { ds =>
      val sig = Array.fill(MinhashK)(Long.MaxValue)
      var i = 0
      while (i < ds.sh.length) {
        val h = ds.sh(i)
        var f = 0
        while (f < MinhashK) {
          val v = mix64(h ^ (f * 0xd6e8feb86659fd93L))
          if (v < sig(f)) sig(f) = v
          f += 1
        }
        i += 1
      }
      (0 until nBands).iterator.map { bb =>
        var bh = FnvOffset
        var r = 0
        while (r < BandR) { bh = mix64(bh ^ sig(bb * BandR + r)); r += 1 }
        DocBand(ds.doc_id, bb, bh)
      }
    })
  }

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified. Candidates
    * come from banded signature collisions (shuffle on band hash only);
    * each candidate pair is then verified with the true shingle
    * Jaccard via sorted-array merge. */
  def minhashLsh(s: SparkSession, d: String, threshold: Double = 0.6): DataFrame = {
    // one persisted corpus scan feeds banding AND both verification
    // joins — without it the tokenize+hash kernel would run 3×. The
    // returned frame is lazy, so the persist outlives this call; a
    // session running many queries should clearCache() between them
    // (Bench does) or use minhashLshOf with a caller-owned persist.
    val shingles = shingleHashes(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shingles.count() // populate before concurrent branches race it
    minhashLshOf(shingles, threshold)
  }

  /** LSH near-dup pairs from a caller-provided (ideally persisted)
    * shingle frame — lets the caller bound the cache lifetime. */
  def minhashLshOf(shingles: Dataset[DocShingles], threshold: Double): DataFrame = {
    import shingles.sparkSession.implicits._
    val buckets = minhashBandsOf(shingles).toDF()
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = shingles.toDF()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions(_.flatMap { case (da, db, sa, sb) =>
        val common = intersectSize(sa, sb)
        val j = common.toDouble / (sa.length + sb.length - common).toDouble
        if (j >= threshold) Iterator.single((da, db, j)) else Iterator.empty
      })
      .toDF("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per doc: token hashes vote per bit position,
    * weighted by occurrence. A document's text lives in one row, so the
    * whole vote runs map-side in a primitive kernel — no token explode,
    * no shuffle at all (the earlier formulation shuffled every token
    * through a 64-column hash aggregate). */
  def simhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val votes = new Array[Int](64)
        text.split(" ", -1).foreach { t =>
          var h = FnvOffset
          var k = 0
          while (k < t.length) { h ^= t.charAt(k); h *= FnvPrime; k += 1 }
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
            i += 1
          }
        }
        var sh = 0L
        var i = 0
        while (i < 64) { if (votes(i) > 0) sh |= (1L << i); i += 1 }
        (id, sh)
      })
      .toDF("doc_id", "simhash")
  }

  /** Connected components over near-dup pairs by iterative min-label
    * propagation: every doc starts labeled with its own id; each round
    * joins labels across edges (both directions) and keeps the min —
    * converges in O(component diameter) rounds. Near-dup components
    * are tiny (duplicate clusters), so this converges in 2-3 rounds;
    * the iteration cap is a safety net.
    *
    * Iteration cost is kept minimal because this loop's per-round
    * overhead is what dominates at any scale where the label frames
    * are small relative to the cluster (and compounds under a
    * contended scheduler — the round-1/2 driver-bench regressions):
    *  - each generation is an eager localCheckpoint, NOT a persist:
    *    every round reads `labels` twice (the edge join and the
    *    self-row union), so without lineage TRUNCATION the analyzed
    *    plan doubles per round — the same 2^iters analysis blowup
    *    g2_pagerank hit; on the shared-paragraph graph (more rounds
    *    than dedup_corpus's near-clique clusters) it ran the CC loop
    *    on 652 edges for 21 s, all of it in the driver's analyzer.
    *    The previous label still rides through the union-aggregate as
    *    an `old` column, so the changed-label count is a cheap scan
    *    of checkpointed rows, and every generation is fully
    *    materialized (no limit() early-exit partial caches).
    *  - label/edge frames are repartitioned by edge count (~1M edge
    *    rows per partition, capped at defaultParallelism), so a 50k-doc
    *    corpus iterates on a couple of partitions instead of paying
    *    full shuffle-width task overhead every round, while a 100 TB
    *    edge set still spreads across the cluster.
    *
    * The returned frame reads from the final generation's eager
    * localCheckpoint (block-manager blocks, one row per node; the
    * ContextCleaner reclaims earlier generations), so its plan is
    * iteration-count-free. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    // both edge directions from ONE pass over `pairs`: the union-of-two-
    // selects formulation computed the whole upstream pair pipeline
    // (LSH verify, paragraph linkage) once per union branch — Catalyst
    // does not share common subtrees across union children
    val edgesRaw = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nEdges = edgesRaw.count()
    val nParts = math.max(1, math.min(sc.defaultParallelism,
      ((nEdges + 999999L) / 1000000L).toInt))
    val edges = edgesRaw.repartition(nParts, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the repartitioned cache from the raw one, then drop
    // the raw copy — otherwise two full edge sets stay cached through
    // every propagation round
    edges.count()
    edgesRaw.unpersist()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
    var converged = nEdges == 0
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaEdges = edges
        .join(labels, edges("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("component"),
          lit(null).cast("long").as("old"))
      // pointer doubling: v also adopts its LABEL's label — lbl(lbl(v))
      // — so label chains halve every round and convergence is
      // O(log diameter) instead of O(diameter) (a 1M-link chain
      // resolves in ~20 rounds, not 10⁶; DedupSpec's chain fixture
      // pins the deep-propagation correctness). One extra equi-join
      // per round on the label frame, same narrow (long, long) rows.
      val viaLabel = labels.as("l1")
        .join(labels.as("l2"), col("l1.component") === col("l2.doc_id"))
        .select(col("l1.doc_id").as("doc_id"),
          col("l2.component").as("component"),
          lit(null).cast("long").as("old"))
      // every doc has exactly one `labels` row, so min(old) recovers its
      // previous label; the changed count below reads checkpointed rows
      val next = labels.select(col("doc_id"), col("component"),
          col("component").as("old"))
        .union(viaEdges)
        .union(viaLabel)
        .repartition(nParts, col("doc_id"))
        .groupBy(col("doc_id"))
        .agg(min(col("component")).as("component"), min(col("old")).as("old"))
        .localCheckpoint() // eager: materializes AND truncates lineage
      val changed = next.filter(col("component") =!= col("old")).count()
      labels = next.drop("old")
      converged = changed == 0
      iter += 1
    }
    // bench-visible loop diagnostics: a driver-vs-local jobs delta on
    // dedup_corpus/dedup_cc_clusters is now attributable to either more
    // propagation rounds (corpus regeneration changed the dup-graph
    // diameter) or pure scheduler contention, from the metrics alone
    graft.Counters.add("cc_rounds", iter.toLong)
    graft.Counters.add("cc_edges", nEdges)
    edges.unpersist()
    labels
  }

  /** End-to-end corpus dedup: exact + MinHash-LSH near-dup pairs →
    * connected components → keep the min doc_id per component. Returns
    * (doc_id, keep) for every document. */
  def dedupCorpus(s: SparkSession, d: String, threshold: Double = 0.6): DataFrame = {
    // Own the shingle persist here so it can be released the moment the
    // component labels are materialized — leaving it cached for the whole
    // session fills the storage pool and, once blocks evict, every
    // connected-components iteration re-runs the MinHash pipeline from
    // the scan (the round-1 dedup_corpus 5 s → 52 s bench regression).
    val shingles = shingleHashes(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize before the band self-join + the two verify attach
    // joins read it concurrently (cold-cache race = 4x shingle kernel)
    shingles.count()
    val nearDup = minhashLshOf(shingles, threshold)
      .select(col("doc_a"), col("doc_b"))
    val exactDup = Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_a"), collect_list(col("doc_id")).as("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    // connectedComponents materializes its result (the convergence count
    // scans the final labels), so upstream caches can be dropped now.
    val comp = connectedComponents(nearDup.union(exactDup))
    shingles.unpersist()
    Tables.documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        (col("component").isNull || col("component") === col("doc_id")).as("keep"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Pigeonhole blocking: split the 64-bit hash into maxHamming+1
    * blocks — a pair differing in ≤ maxHamming bits must agree on at
    * least one whole block, so the block equi-join finds every
    * qualifying pair without an all-pairs scan (block count derives
    * from maxHamming; a fixed split would silently lose pairs for
    * larger distances). */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming $maxHamming out of range")
    val sh = simhash(s, d)
    val nBlocks = maxHamming + 1
    val bounds = (0 to nBlocks).map(j => j * 64 / nBlocks) // even-ish split
    val blocks = (0 until nBlocks).map { j =>
      val lo = bounds(j); val width = bounds(j + 1) - lo
      val mask = if (width == 64) -1L else (1L << width) - 1
      struct(lit(j).as("blk"),
        shiftright(col("simhash"), lo).bitwiseAND(mask).as("bv"))
    }
    val keyed = sh.select(col("doc_id"), col("simhash"),
      explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.blk").as("blk"), col("b.bv").as("bv"))
    // NOT strategy-hinted: the self-join's signature flips between two
    // benign variants run-to-run (AQE exchange reuse near a runtime
    // threshold — r10's driver-only 13:13:58 ↔ 12:12:44 flip, same
    // results, LESS shuffle on the reused side). Pinning sort-merge was
    // tried and measured WORSE on both axes (shuffle 58 KB → 1.1 MB and
    // the flip persisted); the flip is instead whitelisted by TRENDS'
    // accepted-signature sets (Bench.scala), which is where benign
    // plan oscillation belongs — in the ledger, not the plan.
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Dup-cluster assignment [CLUST]: the canonical-doc election step
    * a dedup pipeline runs after pair generation — docs sharing any
    * non-boilerplate paragraph are linked, components are resolved
    * with [[connectedComponents]] (the same min-label loop
    * dedup_corpus uses), and each cluster elects its smallest doc_id
    * as canonical. Paragraphs are the same 10-token chunks as
    * [[paragraphDedup]]; the document-frequency cap (2 ≤ df ≤ maxDf)
    * is what keeps this scalable: a df-capped paragraph yields
    * ≤ maxDf·(maxDf−1)/2 pairs no matter how big the corpus, and
    * boilerplate (df > maxDf) — the one thing that would make the
    * pair self-join quadratic — is exactly what a real pipeline
    * excludes from linkage anyway. Output is one row per clustered
    * doc: (doc_id, cluster_id, cluster_size, is_canonical);
    * singleton docs (no shared paragraph) are omitted. */
  def paraClusters(s: SparkSession, d: String, paraTokens: Int = 10,
                   maxDf: Int = 10): DataFrame = {
    // paragraphs leave the scan as 64-bit xxhash keys (same discipline
    // as the shingle kernel: strings never shuffle, collisions ~n²/2⁶⁵
    // are the only deviation), and the narrow (doc_id, pk) frame is
    // persisted — the df aggregate, BOTH sides of the pair self-join,
    // and the union in connectedComponents all re-read it; without the
    // persist each of those re-runs tokenize+chunk over the raw text
    // (measured 10.4 s → the fix target at sf0.1).
    val paras = paragraphsOf(
        Tables.documents(s, d).select(col("doc_id"), col("text")), paraTokens)
      .select(col("doc_id"), xxhash64(col("para")).as("pk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the edge job: the df aggregate, both self-join
    // sides and their broadcast builds otherwise start concurrently
    // against a cold cache and each recomputes tokenize+chunk+hash
    paras.count()
    val linkable = paras.join(
      paras.groupBy(col("pk")).agg(count(lit(1)).as("df"))
        .where(col("df").between(2, maxDf)),
      Seq("pk"))
      .select(col("pk"), col("doc_id"))
    val edges = linkable.as("a").join(linkable.as("b"),
        col("a.pk") === col("b.pk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val comp = connectedComponents(edges)
    paras.unpersist() // CC materialized the edge set eagerly
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, Seq("component"))
      .select(col("doc_id"), col("component").as("cluster_id"),
        col("cluster_size"),
        (col("doc_id") === col("component")).as("is_canonical"))
  }

  /** Gram-position rows (doc_id, pos, gram, n_tokens): every `gramLen`-
    * token window of the whitespace tokenization, 1-based pos, via the
    * same primitive-kernel discipline as [[paragraphsOf]] (the HOF
    * transform/sequence/slice/array_join stack evaluates per element
    * through boxed lambdas outside codegen). */
  private[graft] def gramPositionsOf(docs: DataFrame,
      gramLen: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val nt = toks.length
        (0 to nt - gramLen).iterator.map { i =>
          val sb = new java.lang.StringBuilder()
          var k = i
          while (k < i + gramLen) {
            if (k > i) sb.append(' ')
            sb.append(toks(k)); k += 1
          }
          (id, i + 1, sb.toString, nt)
        }
      })
      .toDF("doc_id", "pos", "gram", "n_tokens")
  }

  /** Repeated-substring dedup [SUBSTR] (the "dedup at the substring
    * level" pass of Lee et al. 2021, word-grain): flag every position
    * whose `gramLen`-token window occurs MORE THAN ONCE corpus-wide
    * (across documents or repeated within one), merge overlapping
    * flagged windows into maximal duplicated spans per document, and
    * report per-doc span statistics — the operator that catches the
    * boilerplate paragraph-dedup misses (a licence header glued into
    * otherwise-unique pages, a quoted passage) because the unit is any
    * sliding window, not a fixed chunk boundary.
    *
    * Scale shape: gram occurrence counting is a partial-agg'd
    * groupBy(gram) — a billion-fold repeated boilerplate gram combines
    * map-side instead of funnelling one reducer; the duplicated-gram
    * set (HAVING count>1) is typically corpus-fraction-tiny, so the
    * flag join back is AQE-broadcast when it measures small and a
    * plain shuffle join when it doesn't. Span merging is a per-doc
    * window (partition cardinality bounded by document length, never
    * corpus size). Two passes read the gram frame (count, then flag),
    * so it is persisted with the caller-owned clearCache lifetime
    * convention (TextOps.tfidf); at 100 TB you would drop the persist
    * and pay the second map-side scan instead of caching corpus×L
    * rows. Gram keys stay strings here to keep the DuckDB oracle
    * exact; the production key is xxhash64(gram) — 8-byte shuffle
    * keys, same discipline (and same birthday-bound argument) as
    * [[paraClusters]] and Decontam's hashed path.
    *
    * Span semantics: flagged windows [p, p+L−1] overlapping (next
    * start < prev start + L) merge into one span of
    * last_p − first_p + L tokens; merely adjacent spans stay separate
    * islands but token coverage is additive either way, so dup_tokens
    * is the exact size of the duplicated-position union. */
  def substringDedup(s: SparkSession, d: String, gramLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = gramPositionsOf(
        Tables.documents(s, d).select(col("doc_id"), col("text")), gramLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    grams.count() // populate before the count/flag branches race a cold cache
    val dup = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") > 1)
      .select(col("gram"))
    val flagged = grams.join(dup, Seq("gram"))
      .select(col("doc_id"), col("pos"), col("n_tokens"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    flagged
      .withColumn("brk",
        when(prev.isNull || col("pos") - prev >= gramLen, 1).otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("p0"), max(col("pos")).as("p1"),
        count(lit(1)).as("ng"), max(col("n_tokens")).as("nt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("ng")).as("n_dup_grams"),
        count(lit(1)).as("n_islands"),
        sum(col("p1") - col("p0") + gramLen).as("dup_tokens"),
        max(col("nt")).as("n_tokens"))
      .withColumn("dup_ratio", col("dup_tokens") / col("n_tokens"))
  }
}
