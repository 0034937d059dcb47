package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {
  test("binary decode plumbing: one meta row per doc, fields derived from bytes") {
    val meta = Multimodal.decodeMeta(spark, sfDir).cache()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(meta.count() === nDocs)
    // byte_len equals the utf-8 length of the text it was built from
    val joined = meta.join(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), octet_length(col("text")).as("olen")), Seq("doc_id"))
    assert(joined.filter(col("byte_len") =!= col("olen")).count() === 0)
    val bad = meta.filter(col("width") < 0 || col("width") >= 640 ||
      col("height") < 0 || col("height") >= 480 ||
      col("n_frames") < 1 || col("n_frames") > 30)
    assert(bad.count() === 0)
    meta.unpersist()
  }

  test("resize stub: output bounded by target, stride/geometry consistent") {
    val r = Multimodal.resizeStub(spark, sfDir).cache()
    assert(r.count() === Tables.documents(spark, sfDir).count())
    val bad = r.filter(
      col("out_len") > Multimodal.ResizeTarget ||
        col("stride") < 1 ||
        // out_len is exactly ceil(orig_len / stride) for non-empty docs
        (col("orig_len") > 0 &&
          col("out_len") =!= ceil(col("orig_len") / col("stride").cast("double"))
            .cast("int")) ||
        // the byte sum bounds: <= 255 per sampled byte, head in range
        col("out_sum") > col("out_len") * 255L ||
        (col("orig_len") > 0 &&
          (col("out_head") < 0 || col("out_head") > 255)))
    assert(bad.count() === 0)
    r.unpersist()
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
}
