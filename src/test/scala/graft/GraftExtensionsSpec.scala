package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The extensions class must inject cleanly (full SQL behavior of the
  * injected functions is covered by VectorExpressionsSpec through the
  * registry route — both land in the same FunctionRegistry). */
class GraftExtensionsSpec extends SparkSpec {
  test("GraftExtensions applies without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("injected builders construct working expressions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same builders the injection registers, exercised via the registry
    graft.functions.VectorExpressions.register(spark)
    val r = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .selectExpr("vec_dot(a, b) AS d", "vec_norm(b) AS n")
      .collect().head
    assert(r.getDouble(0) === 11.0 && r.getDouble(1) === 5.0)
  }
}
