package graft

/** Raw-SQL surface: registerAll + spark.sql must agree with the
  * DataFrame path, including the events nanos normalization. */
class SqlSurfaceSpec extends SparkSpec {
  test("registerAll exposes every table to spark.sql with typed schemas") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
    // events view carries the micros-normalized timestamp type
    assert(spark.sql("SELECT ts FROM events").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val viaSql = spark.sql(
      "SELECT COUNT(DISTINCT event_type) FROM events").head().getLong(0)
    val viaDf = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(viaSql === viaDf)
  }
}
