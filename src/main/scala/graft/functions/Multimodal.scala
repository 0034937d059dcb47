package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads as opaque BinaryType columns,
  * decoded in partition-parallel batches via mapPartitions — the Scala
  * analogue of mapInPandas batch UDFs. The decode is REAL: payloads are
  * genuine PNG/JPEG byte streams (encoded with the JDK's javax.imageio,
  * deterministically rendered per doc id), and every downstream number
  * comes from [[ImageIO]] actually parsing those bytes — container
  * sniffing via the registered ImageReader, raster decode, and a
  * hand-rolled bilinear resize over the decoded pixels.
  *
  * Oracle strategy: the planted raster is arithmetic in (doc_id, x, y)
  * and PNG is lossless, so DuckDB predicts decoded geometry AND pixel
  * probes without touching an image library; any codec/plumbing bug
  * shows up as a value mismatch. JPEG rows prove the second real codec
  * path end-to-end but expose only geometry to the oracle (lossy pixel
  * values aren't portably predictable); their content columns are NULL
  * by construction on both sides.
  */
object Multimodal {
  // ImageIO's default stream factory writes every stream through a
  // DISK-cache created under a global lock — with 32 concurrent decode
  // tasks the codecs convoy on that lock (measured: 25× total CPU, no
  // wall win, after the kernels went partition-parallel). Memory-backed
  // streams decode small payloads lock-free. The encode/decode kernels
  // each call [[disableImageIoDiskCache]] explicitly (idempotent, a
  // volatile read per call), so the dependency is visible at the call
  // sites and never rides on object-initialization order across
  // executors; co-resident ImageIO users that want the disk cache can
  // re-enable it between kernel runs without this object silently
  // flipping it back at first touch.
  private def disableImageIoDiskCache(): Unit = ImageIO.setUseCache(false)

  // ------------------------------------------------------ planted raster
  // Channel values are mod-256 linear forms in (id, x, y): trivial for
  // the DuckDB oracle to evaluate, non-constant along every axis so a
  // transposed / flipped / off-by-one decode cannot pass.
  private[graft] def plantR(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x * 7L + y * 13L) % 256).toInt
  private[graft] def plantG(id: Long, x: Int, y: Int): Int =
    ((id * 17 + x * 3L + y * 29L) % 256).toInt
  private[graft] def plantB(id: Long, x: Int, y: Int): Int =
    ((id * 11 + x * 23L + y * 5L) % 256).toInt
  /** Per-doc dims: w in 16..63, h in 16..47 — small enough that sf0.1's
    * 5k docs encode in seconds, varied enough to exercise both the
    * upscale and downscale paths of the fixed-target resize. */
  private[graft] def plantDims(id: Long): (Int, Int) =
    (16 + (id % 48).toInt, 16 + ((id * 7) % 32).toInt)
  private[graft] def plantFmt(id: Long): String =
    if (id % 3 == 0) "jpeg" else "png"

  private[graft] def renderImage(id: Long): BufferedImage = {
    val (w, h) = plantDims(id)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        im.setRGB(x, y,
          (plantR(id, x, y) << 16) | (plantG(id, x, y) << 8) | plantB(id, x, y))
        x += 1
      }
      y += 1
    }
    im
  }

  /** Genuine encoded bytes — the fixture payload a binary lake column
    * would hold. JPEG for every third doc, PNG otherwise. */
  private[graft] def encodeImage(id: Long): Array[Byte] = {
    disableImageIoDiskCache()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(renderImage(id), plantFmt(id), bos)
    bos.toByteArray
  }

  /** Real decode through the registered ImageReader: the format comes
    * from container sniffing on the BYTES (not from metadata we carry
    * along), the raster from the codec. */
  private[graft] def decodeImage(payload: Array[Byte]): (String, BufferedImage) = {
    disableImageIoDiskCache()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) throw new IllegalArgumentException("unknown image format")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (reader.getFormatName.toLowerCase, reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, fmt: String, width: Int, height: Int,
    c00_r: Option[Int], c00_g: Option[Int], c00_b: Option[Int],
    c11_r: Option[Int], c11_g: Option[Int], c11_b: Option[Int],
    row0_red_sum: Option[Long])

  /** The binary media table: one encoded image per document row. The
    * payload travels through a typed Dataset boundary exactly as a
    * parquet binary column would — downstream stages see bytes only.
    *
    * The id frame repartitions to the session's default parallelism
    * BEFORE rendering: the documents scan is a tiny file (1–3 splits
    * locally), and without this the CPU-bound encode+decode kernels ran
    * in 3 tasks on a 32-core box (measured: mm_decode 5.1 s, 3 tasks,
    * zero shuffle). Only 8-byte ids shuffle — free at any scale — and
    * a real lake, where the payloads come FROM a many-split scan,
    * inherits the scan's parallelism instead of this fixture's. */
  private def mediaTable(s: SparkSession, d: String) = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id => MediaIn(id, encodeImage(id))))
  }

  /** Decode metadata + pixel probes [MM-DECODE]: batch-decode the
    * binary payloads and emit what a real ingest pipeline extracts —
    * sniffed format, decoded geometry, corner pixels, and a row-0
    * channel checksum. All values come from the DECODED raster; for
    * PNG they must equal the planted arithmetic (lossless roundtrip),
    * for JPEG the content probes are NULL (lossy) while format and
    * geometry stay oracle-checked. Map-only at scan parallelism. */
  def decodeMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).mapPartitions(_.map { m =>
      val (fmt, im) = decodeImage(m.payload)
      val (w, h) = (im.getWidth, im.getHeight)
      def ch(x: Int, y: Int, shift: Int): Int = (im.getRGB(x, y) >> shift) & 0xff
      if (fmt == "png") {
        var s0 = 0L
        var x = 0
        while (x < w) { s0 += ch(x, 0, 16); x += 1 }
        MediaMeta(m.doc_id, fmt, w, h,
          Some(ch(0, 0, 16)), Some(ch(0, 0, 8)), Some(ch(0, 0, 0)),
          Some(ch(w - 1, h - 1, 16)), Some(ch(w - 1, h - 1, 8)),
          Some(ch(w - 1, h - 1, 0)), Some(s0))
      } else
        MediaMeta(m.doc_id, fmt, w, h, None, None, None, None, None, None, None)
    }).toDF()
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

  // ------------------------------------------------------ bilinear resize
  val OutW = 24
  val OutH = 16

  /** Align-corners bilinear over a packed-RGB raster — the standard
    * image rescale, hand-rolled so the arithmetic is pinned (AWT's
    * Graphics2D leaves interpolation details to the rendering engine;
    * this kernel is the same double math on every JVM and mirrorable
    * in SQL). Output corners land exactly on source corners (fx=fy=0
    * there), which is what makes corner probes oracle-exact. */
  private[graft] def bilinearResize(im: BufferedImage,
      outW: Int, outH: Int): Array[Int] = {
    val (w, h) = (im.getWidth, im.getHeight)
    val out = new Array[Int](outW * outH)
    var j = 0
    while (j < outH) {
      val sy = j.toDouble * (h - 1) / (outH - 1)
      val y0 = math.floor(sy).toInt
      val fy = sy - y0
      val y1 = math.min(y0 + 1, h - 1)
      var i = 0
      while (i < outW) {
        val sx = i.toDouble * (w - 1) / (outW - 1)
        val x0 = math.floor(sx).toInt
        val fx = sx - x0
        val x1 = math.min(x0 + 1, w - 1)
        val (p00, p10, p01, p11) =
          (im.getRGB(x0, y0), im.getRGB(x1, y0), im.getRGB(x0, y1), im.getRGB(x1, y1))
        var rgb = 0
        var shift = 16
        while (shift >= 0) {
          val v = (1.0 - fy) * ((1.0 - fx) * ((p00 >> shift) & 0xff) +
              fx * ((p10 >> shift) & 0xff)) +
            fy * ((1.0 - fx) * ((p01 >> shift) & 0xff) +
              fx * ((p11 >> shift) & 0xff))
          rgb |= (math.round(v).toInt & 0xff) << shift
          shift -= 8
        }
        out(j * outW + i) = rgb
        i += 1
      }
      j += 1
    }
    out
  }

  case class Resized(doc_id: Long, fmt: String, src_w: Int, src_h: Int,
    out_w: Int, out_h: Int,
    c00_r: Option[Int], c10_r: Option[Int], c01_r: Option[Int],
    c11_r: Option[Int], mid_r: Option[Int])

  /** Real resize [MM-RESIZE]: decode the payload, bilinear-rescale the
    * raster to a fixed target, emit geometry plus probes of the
    * RESIZED pixels. The four corner probes are interpolation-free
    * (align-corners) so for PNG they equal the planted source corners;
    * mid_r at (OutW/2, 0) IS interpolated — the oracle reproduces the
    * exact double formula, so a nearest-neighbor or stride-sampling
    * impostor fails the hash. JPEG rows resize for real too but expose
    * only geometry (NULL probes). Map-only at scan parallelism, like
    * every per-item media transform. */
  def resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d).mapPartitions(_.map { m =>
      val (fmt, im) = decodeImage(m.payload)
      val (w, h) = (im.getWidth, im.getHeight)
      val px = bilinearResize(im, OutW, OutH)
      def r(i: Int, j: Int): Int = (px(j * OutW + i) >> 16) & 0xff
      if (fmt == "png")
        Resized(m.doc_id, fmt, w, h, OutW, OutH,
          Some(r(0, 0)), Some(r(OutW - 1, 0)), Some(r(0, OutH - 1)),
          Some(r(OutW - 1, OutH - 1)), Some(r(OutW / 2, 0)))
      else
        Resized(m.doc_id, fmt, w, h, OutW, OutH, None, None, None, None, None)
    }).toDF()
  }

  case class AHash(doc_id: Long, fmt: String,
    ahash_hi: Option[Long], ahash_lo: Option[Long])

  /** Perceptual average-hash [MM-AHASH]: the image-dedup primitive —
    * an 8×8 luminance grid sample of each DECODED image, one bit per
    * cell (above the 64-cell mean), packed into two 32-bit halves so
    * neither engine touches the sign bit. All integer math: the mean
    * comparison is lum·64 > total (no division), the grid is
    * nearest-neighbor at (i·w/8, j·h/8) — a production pipeline would
    * box-average first, but the hash algebra is identical. Exact-hash
    * groups (n_same) are the dedup keys. The engine hashes pixels the
    * CODEC produced; the oracle recomputes from the planted raster
    * formulas — so a transposed, color-shifted, or off-by-one decode
    * breaks parity. JPEG rows (lossy) carry NULL hashes by
    * construction on both sides, and their NULL keys never join a
    * dedup group. Per-image work is O(64) after decode; the group
    * count is one hash aggregate on a (long, long) key. */
  def ahash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = mediaTable(s, d).mapPartitions(_.map { m =>
      val (fmt, im) = decodeImage(m.payload)
      if (fmt == "png") {
        val w = im.getWidth; val h = im.getHeight
        val lum = new Array[Long](64)
        var tot = 0L
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val p = im.getRGB(i * w / 8, j * h / 8)
            val l = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
            lum(j * 8 + i) = l; tot += l; i += 1
          }
          j += 1
        }
        var hi = 0L; var lo = 0L
        var k = 0
        while (k < 64) {
          if (lum(k) * 64L > tot) {
            if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
          }
          k += 1
        }
        AHash(m.doc_id, fmt, Some(hi), Some(lo))
      } else AHash(m.doc_id, fmt, None, None)
    }).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grp = hashed.filter(col("fmt") === "png")
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(count(lit(1)).as("n_same"))
    hashed.join(grp, Seq("ahash_hi", "ahash_lo"), "left")
      .select(col("doc_id"), col("fmt"), col("ahash_hi"), col("ahash_lo"),
        col("n_same"))
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_off: Int, frame_len: Int)

  val FrameBytes = 64

  /** Frame sampling: one media row fans out to ceil(len/FrameBytes)
    * frame rows — the 1→N generator shape a video frame-sampler has.
    * Video codecs aren't in the JDK (unlike the image path above, this
    * one is environment-blocked), so the emitted rows are the window
    * geometry; the fan-out plumbing (row explosion inside
    * mapPartitions, no driver involvement) is the real thing a frame
    * sampler needs at 100 TB. */
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

  // ------------------------------------------------------ planted audio
  // 16-bit mono PCM; samples are a mod-2^16 linear form in (id, i) so
  // the oracle can evaluate them, non-constant in both so a stride or
  // endianness bug cannot pass.
  private[graft] def plantAudioRate(id: Long): Int =
    if (id % 2 == 0) 8000 else 16000
  private[graft] def plantAudioLen(id: Long): Int = 200 + (id % 300).toInt
  private[graft] def plantSample(id: Long, i: Int): Int =
    (((id * 31 + i * 7L) % 65536) - 32768).toInt

  /** Genuine RIFF/WAVE bytes, header hand-assembled (44-byte PCM
    * canonical layout, all little-endian) — so the DECODE side goes
    * through the real javax.sound codec rather than inverting our own
    * writer. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val rate = plantAudioRate(id)
    val n = plantAudioLen(id)
    val dataBytes = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)            // PCM
      .putShort(1.toShort)            // mono
      .putInt(rate).putInt(rate * 2)  // byte rate
      .putShort(2.toShort)            // block align
      .putShort(16.toShort)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var i = 0
    while (i < n) { bb.putShort(plantSample(id, i).toShort); i += 1 }
    bb.array()
  }

  case class WavStats(doc_id: Long, sample_rate: Int, n_samples: Long,
    sum_abs: Long, sum_sq: Long, peak: Int)

  /** Audio column stats [MM-WAV]: the audio leg of the multimodal
    * surface — real RIFF/WAVE payloads decoded through
    * javax.sound.sampled (header parse + PCM frame extraction by the
    * platform codec, NOT by inverting our writer), then per-doc
    * integer signal stats: sample count, Σ|x|, Σx², peak. All-integer
    * outputs (exact at any scale, no float drift for the oracle to
    * chase); map-only kernel at the id frame's parallelism, the same
    * batch shape as the image decoders. */
  def wavStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val payload = encodeWav(id)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unexpected decoded format $fmt")
          val raw = ais.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sumAbs = 0L; var sumSq = 0L; var peak = 0
          var i = 0
          val n = raw.length / 2
          while (i < n) {
            val v = bb.getShort(i * 2).toInt
            val a = math.abs(v)
            sumAbs += a; sumSq += v.toLong * v
            if (a > peak) peak = a
            i += 1
          }
          WavStats(id, fmt.getSampleRate.toInt, n, sumAbs, sumSq, peak)
        } finally ais.close()
      }).toDF()
  }
}
