package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Corpus sampling / layout operators for a training-data pipeline:
  * exact stratified subsampling and sequence packing (the
  * concat-then-chunk step that turns documents into fixed-size context
  * windows). Both are deterministic — rerunning a data pipeline must
  * reproduce the same training set bit-for-bit — and both have exact
  * DuckDB oracles.
  */
object Sampling {
  /** Exact stratified sample [SAMPLE]: the first ceil(n/denom) docs of
    * each stratum in doc_id order — every stratum is represented at the
    * same exact fraction, unlike a Bernoulli sample whose per-stratum
    * counts fluctuate (and whose RNG would defy an oracle). One
    * sort-shuffle on the stratum key; the per-stratum sort is the same
    * work a window rank does, spilling to disk for hot strata. */
  def stratifiedSample(s: SparkSession, d: String, denom: Int = 10): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    Tables.documents(s, d).select(col("lang"), col("doc_id"))
      .withColumn("rn", row_number().over(byLang.orderBy(col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .filter(col("rn") <= ceil(col("n") / lit(denom.toDouble)))
      .select(col("lang"), col("doc_id"))
  }

  /** Deterministic train/val/test assignment [SPLIT]: bucket =
    * 16 bits of md5(text) mod 100, thresholded into splits. Hashing
    * CONTENT (not doc_id) gives the two properties a training split
    * needs: stable under re-sharding/re-ingestion, and duplicate texts
    * always land in the same split — near-identical copies of a test
    * document can't leak into train. Pure map-side expression; md5 is
    * engine-portable (same digest in DuckDB, proven by
    * text_fingerprint). */
  def splitAssign(s: SparkSession, d: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10)
          .cast("int") % 100).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))

  /** Sequence packing [PACK]: concatenate all documents in doc_id
    * order and chunk the token stream into `capacity`-token context
    * windows; emits each doc's global start offset, chunk id and
    * in-chunk offset.
    *
    * The global running sum is computed as a DISTRIBUTED prefix sum —
    * an empty-partitionBy window would drag the whole corpus into one
    * task, the classic global-cumsum scale-killer. Instead:
    * range-partition by doc_id, window WITHIN each partition (keyed by
    * spark_partition_id, so state is per-task), then add each
    * partition's exclusive prefix offset, computed from the tiny
    * per-partition totals and broadcast back. Partition boundaries are
    * whatever the range sampler picked — the result is boundary-
    * independent because local-cumsum + partition-offset telescopes to
    * the exact global cumsum.
    *
    * The range-partitioned frame is persisted: the partition-totals
    * collect and the final plan MUST observe identical partition
    * boundaries (re-evaluating would re-sample them). Callers running
    * many queries should clearCache() afterwards, as Bench/Verify do. */
  def packChunks(s: SparkSession, d: String, capacity: Int = 2048): DataFrame = {
    val nP = math.max(1, s.sparkContext.defaultParallelism)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).as("n_tokens"))
    val parted = docs.repartitionByRange(nP, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = parted.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("ptot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix over the (at most nP-row) totals, driver-side
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val off = acc; acc += tot; (pid, off)
    }.toSeq
    val offDf = broadcast(
      s.createDataFrame(offsets).toDF("pid", "poff"))
    val local = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    parted.join(offDf, Seq("pid"))
      .withColumn("start_tok",
        col("poff") + sum(col("n_tokens")).over(local) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        col("start_tok").cast(LongType).as("start_tok"),
        floor(col("start_tok") / capacity).cast(LongType).as("chunk_id"),
        pmod(col("start_tok"), lit(capacity.toLong)).as("chunk_off"))
  }
}
