package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  test("vec_dot/vec_norm match the higher-order-function formulation") {
    val df = graft.Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x.cast("double")).as("v"))
    val cmp = df.select(
      VectorExpressions.vecDot(col("v"), col("v")).as("native"),
      Similarity.dot(col("v"), col("v")).as("hof"),
      VectorExpressions.vecNorm(col("v")).as("nnorm"),
      Similarity.norm(col("v")).as("hnorm"))
    val bad = cmp.filter(col("native") =!= col("hof") || col("nnorm") =!= col("hnorm"))
    assert(bad.count() === 0) // bit-identical, not just close
  }

  test("expressions survive both codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val got = df.select(
      VectorExpressions.vecDot(col("a"), col("b")),
      VectorExpressions.vecNorm(col("a"))).collect().head
    assert(got.getDouble(0) === 32.0)
    assert(got.getDouble(1) === math.sqrt(14.0))
  }

  test("SQL registration makes vec_dot available in spark.sql") {
    VectorExpressions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "vec_norm(array(3.0d, 4.0d)) AS n").collect().head
    assert(got.getDouble(0) === 11.0 && got.getDouble(1) === 5.0)
  }

  test("null inputs propagate") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = df.select(VectorExpressions.vecDot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }
}
