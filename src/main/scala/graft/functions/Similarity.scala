package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Scale design (100 TB): brute-force cosine is the correctness
  * baseline — it is O(|Q|·|C|) and only viable when the query set is
  * small or the corpus is blocked. The scale path is random-hyperplane
  * LSH: bucketing is map-only per vector, the candidate join shuffles
  * only (table, bucket) keys, and exact cosine runs on candidates.
  * Elementwise float→double casts keep the arithmetic exact and
  * portable to the DuckDB oracle.
  */
object Similarity {
  /** embedding cast to double elementwise (exact — every float is
    * representable) so downstream math matches the oracle. */
  private def vecD(c: Column): Column = transform(c, x => x.cast(DoubleType))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def vectors(s: SparkSession, d: String): DataFrame =
    graft.Tables.embeddings(s, d)
      .select(col("vec_id"), vecD(col("embedding")).as("v"))

  /** Brute-force cosine top-k: query vectors vec_id < nQueries against
    * the full corpus. The query side is tiny → broadcast, so the scan
    * of the corpus is the only distributed pass (no shuffle). */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val corpus  = vectors(s, d)
    val queries = vectors(s, d).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("v")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Quadratic baseline (the oracle path); LSH below is the scale path. */
  def embeddingNearDup(s: SparkSession, d: String, threshold: Double = 0.45): DataFrame = {
    val a = vectors(s, d).select(col("vec_id").as("vec_a"), col("v").as("va"))
    val b = vectors(s, d).select(col("vec_id").as("vec_b"), col("v").as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }

  val LshTables = 8
  val LshBits   = 12
  val Dim       = 64

  /** Deterministic random hyperplanes (seeded), built driver-side as
    * plan literals — tiny (8×12×64 doubles) and identical on every
    * executor. */
  private lazy val hyperplanes: IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rng = new scala.util.Random(42)
    IndexedSeq.fill(LshTables)(IndexedSeq.fill(LshBits)(
      Array.fill(Dim)(rng.nextGaussian())))
  }

  /** Random-hyperplane LSH bucket ids: for each table, a LshBits-bit
    * signature of sign(v·h). Map-only per vector. */
  def lshBuckets(s: SparkSession, d: String): DataFrame = {
    val buckets = (0 until LshTables).map { t =>
      val bits = (0 until LshBits).map { i =>
        val h = lit(hyperplanes(t)(i))
        when(dot(col("v"), h) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce((x, y) => x.bitwiseOR(y))
      struct(lit(t).as("tbl"), bits.as("bucket"))
    }
    vectors(s, d).select(col("vec_id"), col("v"),
      explode(array(buckets: _*)).as("b"))
      .select(col("vec_id"), col("v"),
        col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))
  }

  /** ANN top-k via LSH: candidates = corpus vectors sharing any bucket
    * with the query, then exact cosine on candidates only. Probabilistic
    * recall (measured against brute force in the spec) — no SQL oracle. */
  def lshTopK(s: SparkSession, d: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val all = lshBuckets(s, d)
    val queries = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("tbl"), col("bucket"))
    val cand = all.join(broadcast(queries), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"), col("v"))
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand.select(col("query_id"), col("vec_id"),
      cosine(col("qv"), col("v")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
