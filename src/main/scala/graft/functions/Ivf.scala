package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) ANN over the embeddings table — the coarse-
  * quantization alternative to hyperplane LSH ([[Similarity.lshTopK]]).
  *
  * Structure mirrors a production IVF index on Spark:
  *  - centroids from a few Lloyd iterations of distributed k-means —
  *    each iteration is ONE corpus pass emitting per-partition partial
  *    (sum, count) rows per centroid (a map-side-combined aggregate;
  *    only nlist×dim doubles per partition cross the wire), centroids
  *    finalized driver-side and re-broadcast;
  *  - assignment is a map-only kernel pass;
  *  - queries probe the nprobe nearest lists, exact cosine runs on
  *    candidates only.
  * Everything is deterministic: init = lowest-vec_id vectors, fixed
  * iteration count, primitive left-to-right math.
  */
object Ivf {
  /** One (vec_id, vector) row per embedding; the gate persists this
    * once so training, query collection, and both probe passes read a
    * cached frame instead of re-scanning parquet per step. */
  private[functions] def vectors(s: SparkSession, d: String): Dataset[(Long, Array[Double])] = {
    import s.implicits._
    graft.Tables.embeddings(s, d)
      .select(col("vec_id").as("_1"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("_2"))
      .as[(Long, Array[Double])]
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
    acc
  }

  private def nearest(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cents.length) {
      val dd = sqDist(v, cents(c))
      if (dd < bestD) { bestD = dd; best = c }
      c += 1
    }
    best
  }

  /** Deterministic distributed k-means (init = nlist lowest vec_ids). */
  def trainCentroids(s: SparkSession, d: String, nlist: Int = 16,
      iters: Int = 2): Array[Array[Double]] =
    trainCentroidsOn(vectors(s, d), nlist, iters)

  /** k-means over a caller-provided (ideally persisted) vector frame. */
  def trainCentroidsOn(ds: Dataset[(Long, Array[Double])], nlist: Int = 16,
      iters: Int = 2): Array[Array[Double]] = {
    val cents = ds.filter(_._1 < nlist).collect().sortBy(_._1).map(_._2)
    require(cents.length == nlist, s"need vec_ids 0..${nlist - 1} for init")
    lloyd(ds, cents, iters)
  }

  /** k-means with a GENERAL deterministic init — the `nlist`
    * smallest-id vectors (identical to [[trainCentroidsOn]] when ids
    * 0..nlist-1 exist, but correct for any id domain: the
    * `create_index` procedure can't assume contiguous keys). */
  def trainCentroidsAnyIds(ds: Dataset[(Long, Array[Double])],
      nlist: Int, iters: Int = 2): Array[Array[Double]] = {
    val s = ds.sparkSession
    import s.implicits._
    val init = ds.orderBy(col("_1")).limit(nlist).collect().map(_._2)
    require(init.length == nlist,
      s"gseg create_index: need >= $nlist vectors to train $nlist cells")
    lloyd(ds, init, iters)
  }

  private def lloyd(ds: Dataset[(Long, Array[Double])],
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val s = ds.sparkSession
    import s.implicits._
    var cents = init
    val dim = cents(0).length
    for (_ <- 0 until iters) {
      val bc = s.sparkContext.broadcast(cents)
      val partials = ds.mapPartitions { it =>
        val cs = bc.value
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val counts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val c = nearest(v, cs)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        (0 until cs.length).iterator
          .filter(counts(_) > 0)
          .map(c => (c, sums(c), counts(c)))
      }.collect()
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      // combine partials in deterministic centroid-then-arrival order
      partials.sortBy(_._1).foreach { case (c, sv, n) =>
        counts(c) += n
        var i = 0
        while (i < dim) { sums(c)(i) += sv(i); i += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c) // empty cluster keeps its centroid
        else { val m = new Array[Double](dim)
          var i = 0
          while (i < dim) { m(i) = sums(c)(i) / counts(c); i += 1 }
          m }
      }.toArray
    }
    cents
  }

  /** Assignment over a caller-provided keyed vector frame:
    * (key, cid) — map-only, the shape the PERSISTED index table
    * stores and the changefeed-maintenance MERGE re-derives per
    * touched key. Cost is one broadcast + one pass over the rows
    * given, so incremental maintenance pays commit churn, never
    * corpus. */
  def assignOn(ds: Dataset[(Long, Array[Double])],
      cents: Array[Array[Double]]): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    ds.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, v) => (id, nearest(v, cs)) }
    }.toDF("key", "cid")
  }

  /** ANN top-k THROUGH A PERSISTED INDEX: `withCid` carries each live
    * row's stored cell assignment (from the index table — nearest()
    * is NOT recomputed, so the search exercises exactly what
    * maintenance wrote); queries probe their `nprobe` nearest cells
    * and only same-cell candidates are scored. At 100 TB the
    * assignment join is the scale lever: candidates come from
    * `nprobe/nlist` of the corpus, and the index table co-locates by
    * cid. */
  def ivfTopKFromIndex(withCid: Dataset[(Long, Array[Double], Int)],
      cents: Array[Array[Double]],
      nQueries: Int = 20, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val s = withCid.sparkSession
    import s.implicits._
    val queries = withCid.filter(_._1 < nQueries)
      .map(t => (t._1, t._2)).collect()
      .map { case (qid, qv) =>
        val probes = cents.indices
          .sortBy(c => (sqDist(qv, cents(c)), c)).take(nprobe).toSet
        (qid, qv, math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _)), probes)
      }
    val bcQ = s.sparkContext.broadcast(queries)
    val scored = withCid.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (id, v, cid) =>
        var n = 0.0
        var j = 0
        while (j < v.length) { n += v(j) * v(j); j += 1 }
        val nv = math.sqrt(n)
        qs.iterator
          .filter { case (qid, _, _, probes) =>
            qid != id && probes.contains(cid) }
          .map { case (qid, qv, qn, _) =>
            var dot = 0.0; var i = 0
            while (i < v.length) { dot += qv(i) * v(i); i += 1 }
            (qid, id, dot / (qn * nv))
          }
      }
    }.toDF("query_id", "vec_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  private def mix64(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sign-random-projection (SimHash-family) bucket: `nbits`
    * Rademacher hyperplanes derived DETERMINISTICALLY from
    * (plane, dimension) through the splitmix64 finalizer — no stored
    * plane table, so any maintainer (the create_index build, the
    * changefeed MERGE, a search) recomputes byte-identical buckets
    * from the vector alone. */
  def lshBucketOf(v: Array[Double], nbits: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < nbits) {
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val sign = if ((mix64(p.toLong << 32 | i.toLong) & 1L) == 0L)
          1.0 else -1.0
        acc += sign * v(i)
        i += 1
      }
      if (acc >= 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** LSH assignment over a keyed vector frame: (key, bucket). */
  def lshAssignOn(ds: Dataset[(Long, Array[Double])],
      nbits: Int): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    ds.mapPartitions(_.map { case (id, v) => (id, lshBucketOf(v, nbits)) })
      .toDF("key", "bucket")
  }

  /** Corpus assignment: (vec_id, cid, v) — map-only. */
  def assign(s: SparkSession, d: String, cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    vectors(s, d)
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (id, v) => (id, nearest(v, cs), v) }
      }.toDF("vec_id", "cid", "v")
  }

  /** ANN top-k: queries (vec_id < nQueries) probe their nprobe nearest
    * lists; one corpus pass scores candidates whose list is probed by
    * any query. Trains a fresh index; callers probing one index at
    * several nprobe settings (e.g. [[Gates.ivfRecallGate]]) should
    * train once and use [[ivfTopKWith]] — training is 2 corpus passes
    * plus a driver collect, the most expensive step here. */
  def ivfTopK(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame =
    ivfTopKWith(s, d, trainCentroids(s, d, nlist, iters), nQueries, k, nprobe)

  /** ANN top-k over a pre-trained index (precomputed centroids). */
  def ivfTopKWith(s: SparkSession, d: String, cents: Array[Array[Double]],
      nQueries: Int = 20, k: Int = 5, nprobe: Int = 4): DataFrame =
    ivfTopKOn(vectors(s, d), cents, nQueries, k, nprobe)

  /** ANN top-k over a pre-trained index and a caller-provided (ideally
    * persisted) vector frame — the zero-redundant-scan entry point. */
  def ivfTopKOn(ds: Dataset[(Long, Array[Double])],
      cents: Array[Array[Double]],
      nQueries: Int = 20, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val s = ds.sparkSession
    import s.implicits._
    val queries = ds.filter(_._1 < nQueries).collect()
      .map { case (qid, qv) =>
        val probes = cents.indices
          .sortBy(c => (sqDist(qv, cents(c)), c)).take(nprobe).toSet
        (qid, qv, math.sqrt(qv.map(x => x * x).foldLeft(0.0)(_ + _)), probes)
      }
    val bcQ = s.sparkContext.broadcast(queries)
    val bcC = s.sparkContext.broadcast(cents)
    val scored = ds.mapPartitions { it =>
      val qs = bcQ.value; val cs = bcC.value
      it.flatMap { case (id, v) =>
        val cid = nearest(v, cs)
        var n = 0.0
        var j = 0
        while (j < v.length) { n += v(j) * v(j); j += 1 }
        val nv = math.sqrt(n)
        qs.iterator
          .filter { case (qid, _, _, probes) => qid != id && probes.contains(cid) }
          .map { case (qid, qv, qn, _) =>
            var dot = 0.0; var i = 0
            while (i < v.length) { dot += qv(i) * v(i); i += 1 }
            (qid, id, dot / (qn * nv))
          }
      }
    }.toDF("query_id", "vec_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
