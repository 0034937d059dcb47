package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink format matrix: every format Spark ships must roundtrip
  * the same rows (CSV is covered by the oracle-gated s1_csv_roundtrip;
  * parquet by every table read). */
class FormatRoundtripSpec extends SparkSpec {
  private def deleteRecursively(dir: String): Unit =
    graft.Fs.deleteRecursively(dir)

  private def roundtrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"rt_$fmt").toString
    try {
      val src = Tables.supplier(spark, sfDir)
      src.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.format(fmt)
        .schema(src.schema) // json would otherwise infer; keep types fixed
        .load(dir)
      val a = src.orderBy("s_suppkey").collect().map(_.toSeq).toSeq
      val b = back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq
      assert(a === b, s"$fmt roundtrip changed rows")
    } finally deleteRecursively(dir)
  }

  test("orc roundtrip preserves rows")  { roundtrip("orc") }
  test("json roundtrip preserves rows") { roundtrip("json") }

  test("json lines read back as text parse with from_json") {
    val dir = java.nio.file.Files.createTempDirectory("rt_jsontext").toString
    try {
      Tables.region(spark, sfDir).write.mode("overwrite").json(dir)
      val n = spark.read.text(dir)
        .select(from_json(col("value"),
          Tables.region(spark, sfDir).schema).as("r"))
        .filter(col("r.r_regionkey").isNotNull).count()
      assert(n === Tables.region(spark, sfDir).count())
    } finally deleteRecursively(dir)
  }
}
