package graft

class ModelSpec extends SparkSpec {
  test("typed Datasets bind every table with correct encoders") {
    assert(Model.orders(spark, sfDir).head().o_orderkey >= 0)
    assert(Model.lineitem(spark, sfDir).head().l_quantity > 0)
    assert(Model.customer(spark, sfDir).head().c_name.nonEmpty)
    assert(Model.documents(spark, sfDir).head().text.nonEmpty)
    assert(Model.embeddings(spark, sfDir).head().embedding.length === 64)
  }

  test("typed filter+map agrees with the untyped plan") {
    import org.apache.spark.sql.functions._
    val typed = Model.orders(spark, sfDir)
      .filter(_.o_totalprice > 100000)
      .map(_.o_custkey)(spark.implicits.newLongEncoder)
      .distinct().count()
    val untyped = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 100000)
      .select("o_custkey").distinct().count()
    assert(typed === untyped)
  }
}
