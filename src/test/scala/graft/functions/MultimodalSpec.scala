package graft.functions

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {
  test("real decode: PNG roundtrip is pixel-exact, JPEG decodes with true geometry") {
    val meta = Multimodal.decodeMeta(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(meta.count() === nDocs)
    meta.collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val (w, h) = Multimodal.plantDims(id)
      assert(r.getString(r.fieldIndex("fmt")) === Multimodal.plantFmt(id))
      assert(r.getInt(r.fieldIndex("width")) === w, s"doc $id width")
      assert(r.getInt(r.fieldIndex("height")) === h, s"doc $id height")
      if (Multimodal.plantFmt(id) == "png") {
        // losslessness: decoded probes equal the planted arithmetic
        assert(r.getInt(r.fieldIndex("c00_r")) === Multimodal.plantR(id, 0, 0))
        assert(r.getInt(r.fieldIndex("c00_g")) === Multimodal.plantG(id, 0, 0))
        assert(r.getInt(r.fieldIndex("c00_b")) === Multimodal.plantB(id, 0, 0))
        assert(r.getInt(r.fieldIndex("c11_r")) === Multimodal.plantR(id, w - 1, h - 1))
        val expSum = (0 until w).map(x => Multimodal.plantR(id, x, 0).toLong).sum
        assert(r.getLong(r.fieldIndex("row0_red_sum")) === expSum)
      } else // lossy: content probes are NULL by construction
        assert(r.isNullAt(r.fieldIndex("c00_r")) &&
          r.isNullAt(r.fieldIndex("row0_red_sum")))
    }
    meta.unpersist()
  }

  test("jpeg payloads really decode: raster close to planted (lossy, not garbage)") {
    // sniffed format comes from the bytes; decoded pixels should be
    // within normal JPEG quantization error of the planted raster
    val id = 3L // 3 % 3 == 0 -> jpeg
    val (fmt, im) = Multimodal.decodeImage(Multimodal.encodeImage(id))
    assert(fmt === "jpeg")
    val (w, h) = Multimodal.plantDims(id)
    assert(im.getWidth === w && im.getHeight === h)
    val errs = for (y <- 0 until h; x <- 0 until w) yield
      math.abs(((im.getRGB(x, y) >> 16) & 0xff) - Multimodal.plantR(id, x, y))
    // mod-256 gradients are high-frequency; mean error must still be
    // far below the 128 a random/blank raster would give
    assert(errs.sum.toDouble / errs.size < 64.0, s"mean |err| ${errs.sum.toDouble / errs.size}")
  }

  test("bilinear kernel: identity resize returns the source raster exactly") {
    val im = Multimodal.renderImage(1L) // png-planted raster
    val (w, h) = (im.getWidth, im.getHeight)
    val out = Multimodal.bilinearResize(im, w, h)
    for (y <- 0 until h; x <- 0 until w) // kernel emits 24-bit RGB (no alpha byte)
      assert(out(y * w + x) === (im.getRGB(x, y) & 0xffffff), s"($x,$y)")
  }

  test("bilinear kernel matches an independent reference implementation") {
    val im = Multimodal.renderImage(7L)
    val (w, h) = (im.getWidth, im.getHeight)
    val (ow, oh) = (Multimodal.OutW, Multimodal.OutH)
    val out = Multimodal.bilinearResize(im, ow, oh)
    def ref(i: Int, j: Int, shift: Int): Int = {
      val sx = i.toDouble * (w - 1) / (ow - 1)
      val sy = j.toDouble * (h - 1) / (oh - 1)
      val (x0, y0) = (math.floor(sx).toInt, math.floor(sy).toInt)
      val (x1, y1) = (math.min(x0 + 1, w - 1), math.min(y0 + 1, h - 1))
      val (fx, fy) = (sx - x0, sy - y0)
      def p(x: Int, y: Int) = (im.getRGB(x, y) >> shift) & 0xff
      math.round(
        (1.0 - fy) * ((1.0 - fx) * p(x0, y0) + fx * p(x1, y0)) +
          fy * ((1.0 - fx) * p(x0, y1) + fx * p(x1, y1))).toInt
    }
    for (j <- 0 until oh; i <- 0 until ow; shift <- Seq(16, 8, 0))
      assert(((out(j * ow + i) >> shift) & 0xff) === ref(i, j, shift),
        s"($i,$j) shift $shift")
  }

  test("bilinear kernel: constant image stays constant through any rescale") {
    val im = new BufferedImage(20, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 20) im.setRGB(x, y, 0x405060)
    assert(Multimodal.bilinearResize(im, 7, 3).forall(_ == 0x405060))
    assert(Multimodal.bilinearResize(im, 33, 21).forall(_ == 0x405060))
  }

  test("resize query: corners equal source corners for png; jpeg geometry-only") {
    val rs = Multimodal.resize(spark, sfDir).cache()
    assert(rs.count() === Tables.documents(spark, sfDir).count())
    rs.collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val (w, h) = Multimodal.plantDims(id)
      assert(r.getInt(r.fieldIndex("src_w")) === w)
      assert(r.getInt(r.fieldIndex("src_h")) === h)
      assert(r.getInt(r.fieldIndex("out_w")) === Multimodal.OutW)
      assert(r.getInt(r.fieldIndex("out_h")) === Multimodal.OutH)
      if (Multimodal.plantFmt(id) == "png") {
        // align-corners: resized corners are the source corners
        assert(r.getInt(r.fieldIndex("c00_r")) === Multimodal.plantR(id, 0, 0))
        assert(r.getInt(r.fieldIndex("c10_r")) === Multimodal.plantR(id, w - 1, 0))
        assert(r.getInt(r.fieldIndex("c01_r")) === Multimodal.plantR(id, 0, h - 1))
        assert(r.getInt(r.fieldIndex("c11_r")) === Multimodal.plantR(id, w - 1, h - 1))
        // the interpolated probe differs from both neighbors in general —
        // recompute it here independently
        val sx = 12.0 * (w - 1) / 23
        val x0 = math.floor(sx).toInt
        val fx = sx - x0
        val x1 = math.min(x0 + 1, w - 1)
        val exp = math.round((1.0 - fx) * Multimodal.plantR(id, x0, 0) +
          fx * Multimodal.plantR(id, x1, 0)).toInt
        assert(r.getInt(r.fieldIndex("mid_r")) === exp, s"doc $id mid_r")
      } else assert(r.isNullAt(r.fieldIndex("c00_r")))
    }
    rs.unpersist()
  }

  test("format detection: magic routing incl. negative suffix and NULL text") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mmfmt").toString
    Seq(
      (1L, Some("x"), "src0", 1L),   // 0 % 3 = 0  -> jpeg
      (2L, Some("x"), "src4", 1L),   // 4 % 3 = 1  -> png
      (3L, Some("x"), "src5", 1L),   // 5 % 3 = 2  -> riff
      (4L, Some("x"), "src-2", 1L),  // pmod(-2,3)=1 -> png (sign rule)
      (5L, None, "src0", 0L))        // NULL text -> NULL payload -> unknown
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Multimodal.formatDetect(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("src0", "jpeg") -> 1L, ("src4", "png") -> 1L, ("src5", "riff") -> 1L,
      ("src-2", "png") -> 1L, ("src0", "unknown") -> 1L))
  }

  test("wav stats: the real codec's samples reproduce the planted signal") {
    val rows = Multimodal.wavStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val n = Multimodal.plantAudioLen(id)
      var sumAbs = 0L; var sumSq = 0L; var peak = 0
      (0 until n).foreach { i =>
        val v = Multimodal.plantSample(id, i)
        sumAbs += math.abs(v); sumSq += v.toLong * v
        peak = math.max(peak, math.abs(v))
      }
      assert(r.getInt(1) === Multimodal.plantAudioRate(id))
      assert(r.getLong(2) === n.toLong)
      assert(r.getLong(3) === sumAbs, s"sum_abs mismatch for doc $id")
      assert(r.getLong(4) === sumSq)
      assert(r.getInt(5) === peak)
    }
  }
}
