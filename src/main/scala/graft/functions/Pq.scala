package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN over the embeddings table — the
  * memory-compression alternative to coarse partitioning ([[Ivf]]) and
  * hyperplane LSH ([[Similarity.lshTopK]]): each vector is cut into
  * `m` subvectors, each subvector quantized to one of `ksub` per-
  * subspace centroids, so a d-dim float vector becomes an m-byte code
  * (64 dims × 8 bytes → 16 bytes at the gate's m=16, 32×). Queries
  * stay full
  * precision and score codes by Asymmetric Distance Computation
  * (ADC): per query, an m×ksub table of subspace distances is
  * precomputed ONCE, and every corpus code is scored with m table
  * lookups instead of d multiply-adds — the scan is memory-bound on
  * 8-byte codes, which is exactly what lets a 1000-executor cluster
  * hold a 100 TB corpus's index in RAM.
  *
  * Spark mapping:
  *  - training is per-subspace Lloyd k-means, ALL m subspaces
  *    accumulated in ONE corpus pass per iteration (partials are
  *    (subspace, centroid, sum, count) rows — m·ksub·dsub doubles per
  *    partition cross the wire, never data);
  *  - encoding is a map-only kernel pass;
  *  - ADC scoring is one corpus pass with the query tables broadcast;
  *    top-k reduces through the same per-query window as the exact
  *    scorers.
  * Deterministic end to end: init = lowest-vec_id subvectors, fixed
  * iteration count, primitive left-to-right math, vec_id tie-breaks.
  */
object Pq {
  private def sqDistSub(v: Array[Double], off: Int,
      c: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < c.length) { val t = v(off + i) - c(i); acc += t * t; i += 1 }
    acc
  }

  private def nearestSub(v: Array[Double], off: Int,
      cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val dd = sqDistSub(v, off, cents(c))
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Deterministic per-subspace k-means; books(j)(c) is centroid c of
    * subspace j. Init = subvectors of the ksub lowest vec_ids. */
  def trainCodebooks(ds: Dataset[(Long, Array[Double])], m: Int = 8,
      ksub: Int = 16, iters: Int = 2): Array[Array[Array[Double]]] = {
    val s = ds.sparkSession
    import s.implicits._
    val first = ds.filter(_._1 < ksub).collect().sortBy(_._1).map(_._2)
    require(first.length == ksub, s"need vec_ids 0..${ksub - 1} for init")
    val dim = first(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => first.map(_.slice(j * dsub, (j + 1) * dsub)))
    for (_ <- 0 until iters) {
      val bc = s.sparkContext.broadcast(books)
      val partials = ds.mapPartitions { it =>
        val bks = bc.value
        val sums = Array.fill(m, ksub)(new Array[Double](dsub))
        val counts = Array.ofDim[Long](m, ksub)
        it.foreach { case (_, v) =>
          var j = 0
          while (j < m) {
            val c = nearestSub(v, j * dsub, bks(j))
            counts(j)(c) += 1
            var i = 0
            while (i < dsub) { sums(j)(c)(i) += v(j * dsub + i); i += 1 }
            j += 1
          }
        }
        (0 until m).iterator.flatMap(j => (0 until ksub).iterator
          .filter(counts(j)(_) > 0)
          .map(c => (j, c, sums(j)(c), counts(j)(c))))
      }.collect()
      val sums = Array.fill(m, ksub)(new Array[Double](dsub))
      val counts = Array.ofDim[Long](m, ksub)
      // combine partials in deterministic (subspace, centroid) order
      partials.sortBy(p => (p._1, p._2)).foreach { case (j, c, sv, n) =>
        counts(j)(c) += n
        var i = 0
        while (i < dsub) { sums(j)(c)(i) += sv(i); i += 1 }
      }
      books = Array.tabulate(m) { j =>
        Array.tabulate(ksub) { c =>
          if (counts(j)(c) == 0) books(j)(c) // empty cell keeps its centroid
          else {
            val mean = new Array[Double](dsub)
            var i = 0
            while (i < dsub) { mean(i) = sums(j)(c)(i) / counts(j)(c); i += 1 }
            mean
          }
        }
      }
    }
    books
  }

  /** Map-only encoding: (vec_id, codes[m]) — the 64×-compressed index. */
  def encode(ds: Dataset[(Long, Array[Double])],
      books: Array[Array[Array[Double]]]): Dataset[(Long, Array[Int])] = {
    val s = ds.sparkSession
    import s.implicits._
    val m = books.length
    val dsubLen = books(0)(0).length
    val bc = s.sparkContext.broadcast(books)
    ds.mapPartitions { it =>
      val bks = bc.value
      it.map { case (id, v) =>
        val codes = new Array[Int](m)
        var j = 0
        while (j < m) { codes(j) = nearestSub(v, j * dsubLen, bks(j)); j += 1 }
        (id, codes)
      }
    }
  }

  /** ADC top-k over a pre-encoded corpus: queries (vec_id < nQueries,
    * full precision, broadcast) score the m-byte codes via per-query
    * lookup tables built once per partition. Emits per pair BOTH the
    * table-lookup distance and an independently recomputed
    * subspace-by-subspace distance — the `max_adc_gap` the recall
    * gate pins to 0.0 proves the table path computes exactly the
    * asymmetric distance it claims to. */
  private[functions] def adcScores(
      vecs: Dataset[(Long, Array[Double])],
      encoded: Dataset[(Long, Array[Int])],
      books: Array[Array[Array[Double]]], nQueries: Int,
      queryVecs: Option[Dataset[(Long, Array[Double])]] = None): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    // queryVecs overrides the query side for ASYMMETRIC metrics (the
    // MIPS reduction augments the corpus with sqrt(M^2-|x|^2) but the
    // query with a literal 0 — scoring queries from the corpus frame
    // would add a spurious (q_aug - x_aug)^2 term)
    val qs = queryVecs.getOrElse(vecs)
      .filter(_._1 < nQueries).collect().sortBy(_._1)
    val bcQ = s.sparkContext.broadcast(qs)
    val bcB = s.sparkContext.broadcast(books)
    encoded.mapPartitions { it =>
      val bks = bcB.value
      val queries = bcQ.value
      // per-query ADC tables, built once per partition: table(q)(j*ksub+c)
      val tables = queries.map { case (_, qv) =>
        val t = new Array[Double](m * ksub)
        var j = 0
        while (j < m) {
          var c = 0
          while (c < ksub) { t(j * ksub + c) = sqDistSub(qv, j * dsub, bks(j)(c)); c += 1 }
          j += 1
        }
        t
      }
      it.flatMap { case (id, codes) =>
        queries.iterator.zipWithIndex.filter(_._1._1 != id)
          .map { case ((qid, qv), qi) =>
            val t = tables(qi)
            var lookup = 0.0
            var direct = 0.0
            var j = 0
            while (j < m) {
              lookup += t(j * ksub + codes(j))
              direct += sqDistSub(qv, j * dsub, bks(j)(codes(j)))
              j += 1
            }
            (qid, id, lookup, direct)
          }
      }
    }.toDF("query_id", "vec_id", "adist", "adist_direct")
  }

  /** ADC shortlist → exact re-rank top-k: the production PQ retrieval
    * shape. The compressed scan nominates `k·shortlistFactor`
    * candidates per query from codes alone; full-precision vectors are
    * then fetched for ONLY those shortlist rows (a broadcast semi-join
    * on vec_id — k·factor·|Q| rows, never the corpus) and re-ranked by
    * exact distance. At 100 TB the full vectors never leave storage
    * except for the shortlist — the quantization error only has to be
    * small enough that true neighbors reach the shortlist, not that
    * ADC order equals exact order. */
  private[functions] def adcRerankTopK(
      vecs: Dataset[(Long, Array[Double])],
      scores: DataFrame, nQueries: Int, k: Int,
      shortlistFactor: Int,
      queryVecs: Option[Dataset[(Long, Array[Double])]] = None): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val short = scores.withColumn("arank", row_number().over(wA))
      .filter(col("arank") <= k * shortlistFactor)
      .select(col("query_id"), col("vec_id"))
    val qMap = queryVecs.getOrElse(vecs)
      .filter(_._1 < nQueries).collect().toMap
    val bcQ = s.sparkContext.broadcast(qMap)
    val rescored = vecs.toDF("vec_id", "v")
      .join(broadcast(short), Seq("vec_id"))
      .select(col("query_id").as("_1"), col("vec_id").as("_2"), col("v").as("_3"))
      .as[(Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        it.map { case (qid, id, v) => (qid, id, sqDistSub(qs(qid), 0, v)) }
      }.toDF("query_id", "vec_id", "dist")
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    rescored.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
  }

  /** Exact squared-L2 top-k referee (the metric PQ quantizes). */
  private[functions] def l2TopK(vecs: Dataset[(Long, Array[Double])],
      nQueries: Int, k: Int): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val qs = vecs.filter(_._1 < nQueries).collect().sortBy(_._1)
    val bcQ = s.sparkContext.broadcast(qs)
    val scored = vecs.mapPartitions { it =>
      val queries = bcQ.value
      it.flatMap { case (id, v) =>
        queries.iterator.filter(_._1 != id).map { case (qid, qv) =>
          (qid, id, sqDistSub(qv, 0, v))
        }
      }
    }.toDF("query_id", "vec_id", "dist")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).select(col("query_id"), col("vec_id"))
  }

  /** PQ-serves-MIPS gate [sim_pq_mips]: the L2 index really does run
    * maximum-inner-product retrieval UNCHANGED once the corpus is
    * routed through the augmentation of [[Similarity.mipsViaL2TopK]] —
    * corpus vectors gain the √(M²−|x|²) coordinate, queries a literal
    * 0, and the SAME train/encode/ADC/re-rank pipeline as
    * [[pqRecallGate]] then retrieves by inner product. This executes
    * the composition the MIPS-reduction gate only proves in exact
    * arithmetic: quantization error now sits on top of the reduction,
    * and the gate holds the re-ranked recall floor against the brute
    * MIPS referee. dim+1 = 65 splits into m=13 five-dim subspaces. */
  def pqMipsGate(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, m: Int = 13, ksub: Int = 64, shortlistFactor: Int = 8,
      floor: Double = 0.8): DataFrame = {
    import s.implicits._
    val vecs = Ivf.vectors(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count()
    val m2 = vecs.map { case (_, v) => Similarity.dotArr(v, v) }
      .agg(max(col("value"))).head().getDouble(0)
    val aug = vecs.map { case (id, v) =>
      val a = java.util.Arrays.copyOf(v, v.length + 1)
      a(v.length) = math.sqrt(math.max(0.0, m2 - Similarity.dotArr(v, v)))
      (id, a)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    aug.count()
    val augQ = vecs.map { case (id, v) =>
      (id, java.util.Arrays.copyOf(v, v.length + 1))
    }
    val books = trainCodebooks(aug, m, ksub)
    val scores = adcScores(aug, encode(aug, books), books, nQueries,
      queryVecs = Some(augQ))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val approx = adcRerankTopK(aug, scores, nQueries, k, shortlistFactor,
      queryVecs = Some(augQ))
    val brute = Similarity.mipsTopK(s, d, nQueries, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = approx.join(brute, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val tot = brute.agg(count(lit(1)).as("total"))
    Gates.sealGate(s, hits.crossJoin(tot)
      .select((col("hits") >= col("total") * floor).as("mips_recall_ok"),
        col("total").as("n_expected")),
      vecs, aug, scores, brute)
  }

  /** PQ ANN gate [sim_pq_topk]: (1) the lookup-table scores equal the
    * recomputed asymmetric distances EXACTLY (max gap pinned to 0.0 —
    * the ADC identity, a theorem for identical left-to-right
    * arithmetic); (2) the shortlist→re-rank top-k holds the recall
    * floor vs the exact-L2 referee (measured 0.95–0.96 at sf0.001–
    * 0.01 for m=16/ksub=64/factor=8; floor 0.8 leaves margin);
    * (3) the corpus count rides along as the oracle-pinned value
    * column. In-engine booleans per the a15/a18 convention — no SQL
    * engine re-derives k-means cells. */
  def pqRecallGate(s: SparkSession, d: String, nQueries: Int = 20,
      k: Int = 5, m: Int = 16, ksub: Int = 64, shortlistFactor: Int = 8,
      floor: Double = 0.8): DataFrame = {
    val vecs = Ivf.vectors(s, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count() // materialize before branches race the cache
    val books = trainCodebooks(vecs, m, ksub)
    val scores = adcScores(vecs, Pq.encode(vecs, books), books, nQueries)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gap = scores.agg(
      max(abs(col("adist") - col("adist_direct"))).as("max_gap"))
    val approx = adcRerankTopK(vecs, scores, nQueries, k, shortlistFactor)
    val exact = l2TopK(vecs, nQueries, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits"))
    val tot = exact.agg(count(lit(1)).as("total"))
    val nVec = vecs.toDF("vec_id", "v").agg(count(lit(1)).as("n_vectors"))
    Gates.sealGate(s, gap.crossJoin(hits).crossJoin(tot).crossJoin(nVec)
      .select(
        (col("max_gap") === 0.0).as("adc_consistent"),
        (col("hits") >= col("total") * floor).as("recall_ok"),
        col("n_vectors")),
      vecs, scores, exact)
  }
}
