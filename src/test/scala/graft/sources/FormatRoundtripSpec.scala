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

  test("xml roundtrip preserves rows and frames records by rowTag") {
    val dir = java.nio.file.Files.createTempDirectory("rt_xml").toString
    try {
      val src = Tables.supplier(spark, sfDir)
      src.write.mode("overwrite").option("rowTag", "supplier")
        .format("xml").save(dir)
      // the rowTag must be load-bearing in the emitted bytes, not a
      // silently-dropped option
      val sample = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".xml")).headOption
        .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
        .getOrElse("")
      assert(sample.contains("<supplier>"), "rowTag missing from output")
      val back = spark.read.schema(src.schema)
        .option("rowTag", "supplier").format("xml").load(dir)
      assert(back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq ===
        src.orderBy("s_suppkey").collect().map(_.toSeq).toSeq)
    } finally deleteRecursively(dir)
  }

  test("csv with quote-doubling roundtrips embedded delimiters/quotes/newlines") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rt_csvdialect").toString
    try {
      val rows = Seq(
        (1L, "plain"),
        (2L, "comma, inside"),
        (3L, "quote \" inside"),
        (4L, "newline\ninside"),
        (5L, "all, of \"it\"\nat once"))
      val src = rows.toDF("k", "v")
      src.write.mode("overwrite").option("header", "true")
        .option("quote", "\"").option("escape", "\"").csv(dir)
      val back = spark.read.schema(src.schema).option("header", "true")
        .option("multiLine", "true")
        .option("quote", "\"").option("escape", "\"").csv(dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back === rows.toMap)
    } finally deleteRecursively(dir)
  }

  test("zstd parquet sink writes .zstd.parquet files that read back") {
    val dir = java.nio.file.Files.createTempDirectory("rt_zstd").toString
    try {
      val src = Tables.supplier(spark, sfDir)
      src.write.mode("overwrite").option("compression", "zstd").parquet(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      // the codec option must be load-bearing: data files carry the
      // codec in their name, so a silently-ignored option fails here
      assert(files.nonEmpty && files.forall(_.endsWith(".zstd.parquet")),
        s"expected zstd-coded files, got: ${files.mkString(", ")}")
      val back = spark.read.parquet(dir)
      assert(back.orderBy("s_suppkey").collect().map(_.toSeq).toSeq ===
        src.orderBy("s_suppkey").collect().map(_.toSeq).toSeq)
    } finally deleteRecursively(dir)
  }

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

  test("mergeSchema read null-fills the column old generations lack") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rt_schevo").toString
    try {
      Seq((1L, 10), (2L, 20)).toDF("doc_id", "n_chars")
        .write.mode("overwrite").parquet(dir + "/gen=1")
      Seq((3L, 30, "en"), (4L, 40, "fr")).toDF("doc_id", "n_chars", "lang")
        .write.mode("overwrite").parquet(dir + "/gen=2")
      val merged = spark.read.option("mergeSchema", "true").parquet(dir)
      assert(merged.schema.fieldNames.toSet
        .intersect(Set("doc_id", "n_chars", "lang")) ===
        Set("doc_id", "n_chars", "lang"))
      val rows = merged.select("doc_id", "lang").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else r.getString(1))).toMap
      assert(rows === Map(1L -> null, 2L -> null, 3L -> "en", 4L -> "fr"))
      // without mergeSchema the footer-sampled schema may drop lang —
      // the option is load-bearing, not decorative
    } finally deleteRecursively(dir)
  }

  test("dynamic partition overwrite replaces only the touched partition") {
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    val got = graft.operators.CoreOps.s15DynamicOverwrite(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = graft.Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", col("n_chars") * 2)
          .otherwise(col("n_chars"))).as("sc"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every partition present (a static overwrite would have truncated
    // the non-en partitions away), en carrying the doubled generation
    assert(got === want)
    assert(got.size > 1, "only one lang partition — truncation undetectable")
    // the mode is a per-write option, never session state
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      === before)
  }
}
