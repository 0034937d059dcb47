package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Corpus sampling / layout operators for a training-data pipeline:
  * exact stratified subsampling, sequence packing (the concat-then-
  * chunk step that turns documents into fixed-size context windows),
  * and deterministic train/val/test assignment. All deterministic —
  * rerunning a data pipeline must reproduce the same training set
  * bit-for-bit — and all with exact DuckDB oracles.
  *
  * The global/stratum orderings both use the same two-phase shape:
  * deterministic VALUE-derived id buckets (never repartitionByRange,
  * whose sampled boundaries change per execution — offsets collected
  * against one evaluation would silently corrupt a recomputed plan),
  * per-bucket window work, then tiny per-bucket totals broadcast back.
  * No single task ever sees more than one bucket, so hot strata and
  * the global token stream parallelize across the cluster.
  */
object Sampling {
  /** Deterministic range bucket for doc_id: floor(id/span) with
    * span = maxId/nP + 1, clamped to [0, nP) — negative ids all land
    * in bucket 0 via the lower clamp. Monotone non-decreasing in
    * doc_id (bucket p's ids all precede bucket p+1's) and identical on
    * every re-evaluation, so collected per-bucket offsets can never
    * disagree with the consuming plan. Division (not id·nP/(max+1)) so
    * snowflake-scale ids near Long.MaxValue can't overflow the
    * multiply. */
  private def bucketed(df: DataFrame, nP: Int): DataFrame = {
    val row = df.agg(max(col("doc_id"))).head()
    val maxId = if (row.isNullAt(0)) 0L else math.max(0L, row.getLong(0))
    val span = maxId / nP + 1
    df.withColumn("pid",
      greatest(lit(0),
        least(lit(nP - 1), floor(col("doc_id") / span))).cast("int"))
  }

  /** Exact stratified sample [SAMPLE]: the first ceil(n/denom) docs of
    * each stratum in doc_id order — every stratum is represented at the
    * same exact fraction, unlike a Bernoulli sample whose per-stratum
    * counts fluctuate (and whose RNG would defy an oracle).
    *
    * Distributed: ranks are computed per (stratum, id-bucket) window —
    * a window partitioned by the stratum alone would sort a dominant
    * stratum (most corpora are mostly one language) in ONE task — and
    * promoted to global stratum ranks by adding exclusive per-bucket
    * offsets from a tiny broadcast frame. */
  def stratifiedSample(s: SparkSession, d: String, denom: Int = 10): DataFrame =
    stratifiedSampleOf(
      Tables.documents(s, d).select(col("lang"), col("doc_id")),
      denom, math.max(1, s.sparkContext.defaultParallelism))

  /** Two-phase global per-stratum doc_id ranks over any
    * (stratumCol, doc_id, …) frame: appends `grank` (1-based rank of
    * doc_id within its stratum) and `ntot` (stratum size). Local ranks
    * per (stratum, id-bucket) window — never one task per stratum —
    * promoted by broadcast exclusive offsets. */
  private[functions] def stratumRanks(df: DataFrame, stratumCol: String,
      nP: Int): DataFrame = {
    val s = df.sparkSession
    // NULL strata are a regular stratum (matching SQL window semantics,
    // where row_number PARTITION BY groups NULLs together): rank via a
    // sentinel-coalesced shadow key so the per-bucket counts, the local
    // window, and the (otherwise null-UNsafe) offset join all agree on
    // NULL; the original column passes through untouched. The NUL
    // sentinel cannot collide — the corpus strata are printable names.
    val docs = bucketed(df, nP).withColumn("_sk",
      coalesce(col(stratumCol).cast("string"), lit("\u0000")))
    val counts = docs.groupBy(col("_sk"), col("pid"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offRows = counts.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val ntot = rows.map(_._3).sum
      var acc = 0L
      rows.sortBy(_._2).map { case (_, pid, c) =>
        val off = acc; acc += c; (k, pid, off, ntot)
      }
    }
    val offDf = broadcast(s.createDataFrame(offRows)
      .toDF("_sk", "pid", "poff", "ntot"))
    val wLocal = Window.partitionBy(col("_sk"), col("pid"))
      .orderBy(col("doc_id"))
    docs.withColumn("lrn", row_number().over(wLocal))
      .join(offDf, Seq("_sk", "pid"))
      .withColumn("grank", col("lrn") + col("poff"))
      .drop("lrn", "poff", "pid", "_sk")
  }

  /** Same over any (lang, doc_id) frame — property tests drive this
    * with adversarial id distributions. */
  def stratifiedSampleOf(strata: DataFrame, denom: Int, nP: Int): DataFrame =
    stratumRanks(strata, "lang", nP)
      .filter(col("grank") <= ceil(col("ntot") / lit(denom.toDouble)))
      .select(col("lang"), col("doc_id"))

  /** Scalable global row numbering [ROWNUM]: contiguous 0-based ids
    * in doc_id order — the stable-id assignment step of a corpus
    * build (shard manifests, example indices, resumable training
    * order) — WITHOUT the classic scale trap: a bare
    * `row_number() OVER (ORDER BY doc_id)` has an empty PARTITION BY,
    * so every row funnels through ONE task; at 100 TB that task never
    * finishes. (`monotonically_increasing_id` is no substitute — its
    * ids are per-partition-offset encoded, neither contiguous nor
    * order-preserving across partitions.)
    *
    * Two phases on the value-derived monotone buckets of [[bucketed]]
    * (deterministic on re-evaluation, unlike repartitionByRange):
    * per-bucket row_number in parallel windows, promoted to global ids
    * by broadcast exclusive bucket offsets (≤nP collected rows).
    * Bucket monotonicity in doc_id is what makes the promotion exact:
    * every id in bucket p precedes every id in bucket p+1. */
  def globalRowNumber(s: SparkSession, d: String): DataFrame =
    globalRowNumberOf(
      Tables.documents(s, d).select(col("doc_id")),
      math.max(1, s.sparkContext.defaultParallelism))

  /** Same over any frame with a unique `doc_id` — uniqueness is what
    * makes the assignment total-order-stable (ties would otherwise
    * order arbitrarily within a window). */
  def globalRowNumberOf(df: DataFrame, nP: Int): DataFrame = {
    val docs = bucketed(df, nP)
    val counts = docs.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    var acc = 0L
    val offRows = counts.sortBy(_._1).map { case (pid, c) =>
      val off = acc; acc += c; (pid, off)
    }.toSeq
    val offDf = broadcast(df.sparkSession.createDataFrame(offRows)
      .toDF("pid", "poff"))
    val wLocal = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    docs.withColumn("lrn", row_number().over(wLocal))
      .join(offDf, Seq("pid"))
      .withColumn("rid", (col("lrn") + col("poff") - 1).cast(LongType))
      .drop("lrn", "poff", "pid")
  }

  /** Per-source document cap [CAP]: keep at most `cap` docs per source
    * (first by doc_id) — the domain-balancing step that stops a single
    * crawler domain from dominating a training mix. Reuses the
    * two-phase stratum-rank machinery, so a dominant source never
    * serializes through one task the way a plain
    * row_number-over-source window would. NOTE the driver-collected
    * per-(stratum, bucket) counts bound this to low-cardinality strata
    * (sources, langs): for per-TERM caps see
    * [[TextOps.invertedIndex]]'s collect-free two-phase top-k. */
  def capPerSource(s: SparkSession, d: String, cap: Int = 10): DataFrame =
    stratumRanks(
      Tables.documents(s, d).select(col("source"), col("doc_id")),
      "source", math.max(1, s.sparkContext.defaultParallelism))
      .filter(col("grank") <= cap)
      .select(col("source"), col("doc_id"),
        col("grank").cast("int").as("rank_in_source"))

  /** Weighted dataset mixing [MIX]: deterministic proportional
    * interleave of sources — each doc's mix key is
    * (rank within source)/weight, so sorting by (mix_key, source,
    * doc_id) yields the classic weighted fair-queueing order in which
    * a source with weight w contributes w docs per w+1 of a weight-1
    * source. Emits the key rather than a global position: consumers
    * range-partition/sort by it distributed, instead of this operator
    * paying a single-task global row_number. Demo weights derive from
    * the source name so the oracle can reproduce them. */
  def mixWeighted(s: SparkSession, d: String): DataFrame = {
    val nP = math.max(1, s.sparkContext.defaultParallelism)
    stratumRanks(
      Tables.documents(s, d).select(col("source"), col("doc_id")),
      "source", nP)
      // full suffix + try_cast: a non-numeric source must not throw
      // under ANSI mode, and a truncated substring would silently
      // diverge from the oracle's full-suffix parse
      .withColumn("w",
        lit(1) + coalesce(
          expr("try_cast(substring(source, 4) AS INT)"), lit(0)) % 3)
      .select(col("doc_id"), col("source"),
        col("grank").as("src_rank"),
        (col("grank") / col("w")).as("mix_key"))
  }

  /** Temperature-scaled source mixing [MIX-TEMP]: the multilingual
    * rebalancing step of an LLM data mix — per-stratum quotas
    * proportional to n^α (α = 1/2 here), so low-resource strata are
    * upsampled relative to their raw share (en at 218/500 raw docs
    * gets 92/300 budget slots, not 131). Quota arithmetic is ALL
    * INTEGER: the weight is isqrt(n) (floor-sqrt — exact cross-engine
    * because IEEE sqrt is correctly rounded, the same canonicalization
    * discipline as the fingerprint's cents), base quota is
    * (budget·w) div W, and the leftover slots go by largest integer
    * remainder (budget·w mod W) with stratum-name tie-break — no
    * float share ever feeds a floor, so engines can't disagree at a
    * boundary. Per-stratum selection reuses the two-phase bucketed
    * ranks ([[stratumRanks]] — never one task per stratum); quotas are
    * computed driver-side from the per-stratum counts (rows = number
    * of strata, the same bounded-collect contract as stratified
    * sampling) and broadcast back. */
  def mixTemperature(s: SparkSession, d: String, budget: Int = 300): DataFrame = {
    val nP = math.max(1, s.sparkContext.defaultParallelism)
    val docs = Tables.documents(s, d).select(col("lang"), col("doc_id"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val w = counts.map { case (k, n) => (k, math.sqrt(n.toDouble).toLong) }
    val totW = w.map(_._2).sum
    val base = w.map { case (k, wi) =>
      (k, budget * wi / totW, budget * wi % totW)
    }
    val leftover = (budget - base.map(_._2).sum).toInt
    val bonus = base.sortBy { case (k, _, rem) => (-rem, k) }
      .take(leftover).map(_._1).toSet
    val quotas = base.map { case (k, q, _) =>
      (k, q + (if (bonus.contains(k)) 1L else 0L))
    }
    val qDf = broadcast(s.createDataFrame(quotas.toSeq).toDF("lang", "quota"))
    stratumRanks(docs, "lang", nP)
      .join(qDf, Seq("lang"))
      .filter(col("grank") <= col("quota"))
      .select(col("doc_id"), col("lang"), col("quota"),
        col("grank").as("src_rank"))
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
      .select(col("doc_id"), splitBucket(col("text")).as("bucket"))
      .select(col("doc_id"), col("bucket"),
        splitName(col("bucket"), trainPct, valPct).as("split"))

  /** The split expressions, exposed so downstream operators
    * ([[Decontam]]) derive the split from the SAME row instead of
    * joining back to a separately-computed assignment — map-side,
    * no corpus-to-corpus shuffle. */
  private[functions] def splitBucket(text: org.apache.spark.sql.Column) =
    conv(substring(md5(text), 1, 4), 16, 10).cast("int") % 100
  private[functions] def splitName(bucket: org.apache.spark.sql.Column,
      trainPct: Int = 90, valPct: Int = 5) =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  /** Overlapping per-document chunking [CHUNK-OVL]: the RAG/window
    * shape — each doc is cut into `size`-token windows advancing by
    * `stride` (= size − overlap), final partial window kept, so every
    * token is covered and consecutive chunks share `overlap` tokens of
    * context. Contrast [[packChunks]], which concatenates ACROSS docs
    * into exact non-overlapping context windows. Pure map-side
    * sequence-explode — fan-out ≈ n_tokens/stride per doc, no shuffle,
    * scan-speed at any corpus size. Integer arithmetic only (ceil via
    * (a + b − 1) div b) so the oracle reproduces chunk counts exactly. */
  def chunkOverlap(s: SparkSession, d: String,
      size: Int = 32, stride: Int = 24): DataFrame =
    chunkOverlapOf(
      Tables.documents(s, d).select(col("doc_id"),
        org.apache.spark.sql.functions.size(TextOps.tokens(col("text")))
          .cast(LongType).as("n_tokens")),
      size, stride)

  /** Same over any (doc_id, n_tokens) frame — property tests sweep
    * arbitrary (size, stride ≤ size) geometry. */
  def chunkOverlapOf(tokCounts: DataFrame, size: Int, stride: Int): DataFrame = {
    val n = col("n_tokens")
    // Column./ is double division; floor() (exact below 2^53) recovers
    // the integer ceil — same value the oracle's `//` computes
    val nChunks = when(n <= size, lit(1L))
      .otherwise(floor((n - size + stride - 1) / stride) + 1)
    tokCounts
      .select(col("doc_id"), n.as("n_tokens"), nChunks.as("n_chunks"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(col("chunk_id") * stride + size, col("n_tokens")).as("end_tok"))
  }

  /** Sequence packing [PACK]: concatenate all documents in doc_id
    * order (tokenized exactly as TextOps counts tokens — chunk
    * boundaries must correspond to the token stream the rest of the
    * pipeline measures) and chunk the stream into `capacity`-token
    * context windows; emits each doc's global start offset, chunk id
    * and in-chunk offset.
    *
    * The global running sum is a DISTRIBUTED prefix sum — an
    * empty-partitionBy window would drag the whole corpus into one
    * task, the classic global-cumsum scale-killer. Per-bucket local
    * cumsums plus broadcast exclusive bucket offsets telescope to the
    * exact global cumsum; the deterministic bucketing makes the
    * collected offsets recompute-safe with no persist required. */
  def packChunks(s: SparkSession, d: String, capacity: Int = 2048): DataFrame =
    packChunksOf(
      Tables.documents(s, d)
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n_tokens")),
      capacity, math.max(1, s.sparkContext.defaultParallelism))

  /** Same over any (doc_id, n_tokens) frame — property tests drive
    * this with adversarial id distributions. */
  def packChunksOf(tokCounts: DataFrame, capacity: Int, nP: Int): DataFrame = {
    val s = tokCounts.sparkSession
    val docs = bucketed(tokCounts, nP)
    val totals = docs.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("ptot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val off = acc; acc += tot; (pid, off)
    }.toSeq
    val offDf = broadcast(s.createDataFrame(offsets).toDF("pid", "poff"))
    val local = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    docs.join(offDf, Seq("pid"))
      .withColumn("start_tok",
        col("poff") + sum(col("n_tokens")).over(local) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        col("start_tok").cast(LongType).as("start_tok"),
        floor(col("start_tok") / capacity).cast(LongType).as("chunk_id"),
        pmod(col("start_tok"), lit(capacity.toLong)).as("chunk_off"))
  }
}
