package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque BinaryType
  * columns with typed metadata, "decoded" in batches via mapPartitions.
  *
  * The decode itself is a STUB (no image/audio libs in this container):
  * `fakeDecode` derives deterministic metadata from the bytes. The
  * Spark-side plumbing is real and what matters at 100 TB: binary
  * columns travel in parquet, the decode runs partition-parallel with
  * a typed Encoder boundary (the Scala analogue of mapInPandas batch
  * UDFs), and downstream columns are plain Catalyst types.
  */
object Multimodal {
  case class MediaIn(doc_id: Long, fmt: String, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, fmt: String, byte_len: Int,
    width: Int, height: Int, n_frames: Int)

  /** STUB decoder: a real implementation would hand `payload` to an
    * image/audio codec here. Deterministic arithmetic stands in so the
    * pipeline is testable end-to-end (and oracle-checkable). */
  def fakeDecode(m: MediaIn): MediaMeta = {
    val n = m.payload.length
    MediaMeta(m.doc_id, m.fmt, n, n % 640, (n * 7) % 480, n % 30 + 1)
  }

  /** Build a binary media table from documents (payload = utf-8 bytes,
    * fmt = source), then batch-decode via mapPartitions. */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = graft.Tables.documents(s, d)
      .select(col("doc_id"), col("source").as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media.mapPartitions(_.map(fakeDecode)).toDF()
  }

  /** Container-format detection over raw binary payloads
    * [MM-FORMAT]: the routing step a mixed-media lake runs before
    * per-format decode — read the first magic bytes of every payload
    * and classify, so downstream stages partition by REAL content
    * rather than trusting file extensions or metadata columns. All
    * binary-native expressions (concat/substring/hex on BinaryType,
    * codegen'd, map-side); the magic prefixes are planted
    * deterministically from the source id (the same planting pattern
    * as text_normalize/url_extract), so the oracle can predict the
    * per-source format tally without reconstructing blobs — while the
    * engine's answer really did travel bytes → slice → hex →
    * classify. */
  def formatDetect(s: SparkSession, d: String): DataFrame = {
    val idx = expr("try_cast(substring(source, 4) AS INT)")
    val magicHex = when(pmod(idx, lit(3)) === 0, "FFD8FFE0") // JPEG/JFIF
      .when(pmod(idx, lit(3)) === 1, "89504E47")             // PNG
      .otherwise("52494646")                                 // RIFF
    val payload = concat(unhex(magicHex), encode(col("text"), "UTF-8"))
    val head = hex(substring(payload, 1, 4))
    graft.Tables.documents(s, d)
      .select(col("doc_id"), col("source"), payload.as("payload"), head.as("h"))
      .select(col("source"),
        when(col("h") === "FFD8FFE0", "jpeg")
          .when(col("h") === "89504E47", "png")
          .when(col("h") === "52494646", "riff")
          .otherwise("unknown").as("detected_fmt"),
        length(col("payload")).as("n_bytes"))
      .groupBy(col("source"), col("detected_fmt"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"))
  }

  case class Resized(doc_id: Long, orig_len: Int, stride: Int,
    out_len: Int, out_head: Int, out_sum: Long)

  val ResizeTarget = 96

  /** Resize/downsample transform: the N-bytes-in, M-bytes-out shape an
    * image resizer or audio resampler has. The STUB samples every
    * `stride`-th byte so the output stays ≤ [[ResizeTarget]] bytes; a
    * real implementation would run the codec's scaler on `payload` in
    * the same mapPartitions batch. The emitted geometry (stride,
    * out_len) plus content probes (first sampled byte, byte sum) pin
    * the transform end-to-end for the oracle without shipping the
    * payload itself through the compare. Map-only at scan parallelism,
    * like every per-item media transform. */
  def resizeStub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val n = payload.length
        val stride = math.max(1, (n + ResizeTarget - 1) / ResizeTarget)
        val outIdx = 0 until n by stride
        Resized(id, n, stride, outIdx.size,
          if (n == 0) -1 else payload(0) & 0xff,
          outIdx.foldLeft(0L)((acc, i) => acc + (payload(i) & 0xff)))
      }).toDF()
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Int, frame_len: Int)

  val FrameBytes = 64

  /** Frame sampling: one media row fans out to ceil(len/FrameBytes)
    * frame rows — the 1→N generator shape a video frame-sampler has.
    * A real sampler would decode `payload` per window here; the stub
    * emits the window geometry, keeping the fan-out plumbing (row
    * explosion inside mapPartitions, no driver involvement) real. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val n = payload.length
        val frames = (n + FrameBytes - 1) / FrameBytes
        (0 until frames).iterator.map { i =>
          Frame(id, i, i * FrameBytes, math.min(FrameBytes, n - i * FrameBytes))
        }
      }).toDF()
  }
}
