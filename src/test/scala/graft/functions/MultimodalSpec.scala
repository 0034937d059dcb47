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
}
