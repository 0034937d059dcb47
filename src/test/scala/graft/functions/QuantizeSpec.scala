package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantizeSpec extends SparkSpec {
  test("int8 quantization: range, extremes, and reconstruction error") {
    val q = Similarity.quantizeInt8(spark, sfDir, nVecs = 10)
    // every quantized value fits int8
    assert(q.filter(col("q") < -127 || col("q") > 127).count() === 0)
    // per vector, the largest-magnitude element maps to exactly ±127
    val extremes = q.groupBy("vec_id").agg(max(abs(col("q"))).as("m"))
      .filter(col("m") =!= 127).count()
    assert(extremes === 0)
    // reconstruction: |q/127*amax - x| <= amax/254 (half a quant step)
    val v = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("pos", "x")))
    val amax = v.groupBy("vec_id").agg(max(abs(col("x"))).as("amax"))
    val bad = q.join(v, Seq("vec_id", "pos")).join(amax, Seq("vec_id"))
      .filter(abs(col("q") / 127.0 * col("amax") - col("x")) >
        col("amax") / 254.0 + 1e-12).count()
    assert(bad === 0)
  }
}
