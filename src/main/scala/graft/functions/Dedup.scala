package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Deduplication operators for a training-data pipeline: exact,
  * n-gram Jaccard, MinHash+LSH, and SimHash near-dup detection over
  * the `documents` table.
  *
  * Scale design (100 TB):
  *  - Exact dedup is a single hash-aggregate shuffle on the text hash.
  *  - All-pairs Jaccard is quadratic and exists as the small-data oracle
  *    path; the scale path is MinHash+LSH: per-doc signatures are
  *    map-only, the band join shuffles only (band, bandHash) keys, and
  *    exact Jaccard runs on surviving candidates only.
  *  - Band width r=2 with 32 bands ⇒ P(miss) at j≥0.6 is (1−0.6²)³²≈6e−7,
  *    so the LSH output equals the exact-Jaccard oracle with near
  *    certainty while still pruning the pair space.
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

  /** Distinct word-3-gram shingles per doc: (doc_id, shingles array). */
  private def shingled(s: SparkSession, d: String): DataFrame = {
    val t = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ",
            element_at(col("t"), i),
            element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("s"))
  }

  /** Exact n-gram Jaccard near-dup pairs: docs sharing ≥1 shingle,
    * J = |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Integer-ratio math ⇒
    * bit-exact vs the SQL oracle. The shared-shingle join is the
    * blocking step — disjoint docs never meet. */
  def ngramJaccard(s: SparkSession, d: String, threshold: Double = 0.6): DataFrame = {
    val e = shingled(s, d)
      .select(col("doc_id"), size(col("s")).as("n"), explode(col("s")).as("sh"))
    val a = e.select(col("doc_id").as("doc_a"), col("n").as("na"), col("sh"))
    val b = e.select(col("doc_id").as("doc_b"), col("n").as("nb"), col("sh"))
    a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  val MinhashK = 64   // signature length
  val BandR    = 2    // rows per band -> 32 bands

  /** MinHash signatures: k independent min-hashes per doc. Each hash_i
    * is xxhash64 seeded by the function index — map-side only, one
    * narrow (doc_id, 64×long) row per doc regardless of doc length. */
  def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    val e = shingled(s, d)
      .select(col("doc_id"), col("s"), size(col("s")).as("n"))
    val sigCols = (0 until MinhashK).map { i =>
      array_min(transform(col("s"), sh => xxhash64(lit(i), sh))).as(s"h$i")
    }
    e.select(col("doc_id") +: col("n").as("n_shingles") +: sigCols: _*)
  }

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified. Candidates come
    * from banded signature collisions (shuffle on band hash only); each
    * candidate pair is then verified row-locally with the true shingle
    * Jaccard, so false positives cost compute, never correctness. */
  def minhashLsh(s: SparkSession, d: String, threshold: Double = 0.6): DataFrame = {
    val sig = minhashSignatures(s, d)
    val nBands = MinhashK / BandR
    val bandCols = (0 until nBands).map { bb =>
      val parts = (0 until BandR).map(r => col(s"h${bb * BandR + r}"))
      struct(lit(bb).as("band"), xxhash64(parts: _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = shingled(s, d)
    val withSets = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s").as("sa")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s").as("sb")), Seq("doc_b"))
    withSets
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("common") / (size(col("sa")) + size(col("sb")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash per doc: token hashes vote per bit position,
    * weighted by occurrence. One explode + one hash-agg shuffle. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
      .select(col("doc_id"), xxhash64(col("tk")).as("h"))
    val bitVotes = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val votes = tok.groupBy(col("doc_id")).agg(bitVotes.head, bitVotes.tail: _*)
    val assembled = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    votes.select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Pigeonhole blocking: split the 64-bit hash into 4×16-bit blocks —
    * any pair within Hamming 3 shares at least one exact block, so the
    * block equi-join finds all of them without an all-pairs scan. */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(s, d)
    val blocks = (0 until 4).map { j =>
      struct(lit(j).as("blk"),
        shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("bv"))
    }
    val keyed = sh.select(col("doc_id"), col("simhash"),
      explode(array(blocks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.blk").as("blk"), col("b.bv").as("bv"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
