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

  test("merge_dot == scala merge kernel over sorted sparse vectors") {
    import spark.implicits._
    // deterministic sparse vectors with partial key overlap
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { i =>
      val ka = (1 to 20).map(_ => rnd.nextInt(40).toLong).distinct.sorted.toArray
      val kb = (1 to 20).map(_ => rnd.nextInt(40).toLong).distinct.sorted.toArray
      (i.toLong, ka, ka.map(_ => rnd.nextDouble()),
        kb, kb.map(_ => rnd.nextDouble()))
    }
    def ref(ha: Array[Long], wa: Array[Double],
        hb: Array[Long], wb: Array[Double]): Double = {
      var i = 0; var j = 0; var acc = 0.0
      while (i < ha.length && j < hb.length) {
        if (ha(i) == hb(j)) { acc += wa(i) * wb(j); i += 1; j += 1 }
        else if (ha(i) < hb(j)) i += 1 else j += 1
      }
      acc
    }
    val want = rows.map(r => r._1 -> ref(r._2, r._3, r._4, r._5)).toMap
    val got = rows.toDF("id", "ha", "wa", "hb", "wb")
      .select(col("id"), VectorExpressions.mergeDot(
        col("ha"), col("wa"), col("hb"), col("wb")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bit-identical: same ascending-key accumulation order
    assert(got === want)
    assert(want.values.exists(_ != 0.0), "fixture never intersects")
  }

  test("merge_dot via SQL registration and null propagation") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT merge_dot(array(1L, 3L), array(2.0d, 5.0d), " +
        "array(3L, 4L), array(10.0d, 1.0d)) AS d, " +
        "merge_dot(CAST(NULL AS ARRAY<BIGINT>), array(1.0d), " +
        "array(1L), array(1.0d)) AS n").collect().head
    assert(r.getDouble(0) === 50.0)
    assert(r.isNullAt(1))
  }
}
