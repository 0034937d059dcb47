package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  test("stratified sample takes exactly ceil(n/denom) per stratum") {
    val denom = 10
    val got = Sampling.stratifiedSample(spark, sfDir, denom)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.keySet === full.keySet)
    full.foreach { case (lang, n) =>
      assert(got(lang) === math.ceil(n.toDouble / denom).toLong,
        s"stratum $lang: got ${got(lang)} of $n")
    }
  }

  test("stratified sample keeps the lowest doc_ids of each stratum") {
    val sampled = Sampling.stratifiedSample(spark, sfDir)
    // every kept doc must have rank <= kept-count within its stratum
    val ranked = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    val bad = sampled.join(ranked, Seq("lang", "doc_id"))
      .join(sampled.groupBy("lang").count(), Seq("lang"))
      .filter(col("rn") > col("count")).count()
    assert(bad === 0)
  }

  test("distributed prefix sum equals the single-partition running sum") {
    // the scale path (range partitions + local windows + offsets) must
    // telescope to the same global cumsum a plain window produces,
    // regardless of where the range sampler put partition boundaries
    val got = Sampling.packChunks(spark, sfDir, capacity = 64)
      .select("doc_id", "start_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ref = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("nt"))
      .withColumn("start_tok",
        sum(col("nt")).over(Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)) - col("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === ref && got.nonEmpty)
  }

  test("split assignment: duplicate texts share a split; fractions sane") {
    val out = Sampling.splitAssign(spark, sfDir)
    assert(out.count() === Tables.documents(spark, sfDir).count())
    // identical texts must hash to the same bucket -> same split
    val leaks = Tables.documents(spark, sfDir).select("doc_id", "text")
      .join(out, Seq("doc_id"))
      .groupBy("text").agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(leaks === 0, "duplicate texts split across train/test")
    // bucket mod-100 thresholds: every split label valid
    val badLabel = out.filter(!col("split").isin("train", "val", "test")
      || col("bucket") < 0 || col("bucket") > 99).count()
    assert(badLabel === 0)
    // train should dominate on any non-trivial corpus
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("train", 0L) > counts.getOrElse("val", 0L))
    assert(counts.getOrElse("train", 0L) > counts.getOrElse("test", 0L))
  }

  test("chunk ids and offsets are consistent with capacity") {
    val cap = 128
    val out = Sampling.packChunks(spark, sfDir, cap)
    val bad = out.filter(
      col("chunk_off") < 0 || col("chunk_off") >= cap ||
        col("chunk_id") =!= floor(col("start_tok") / cap) ||
        col("start_tok") < 0).count()
    assert(bad === 0)
    assert(out.count() === Tables.documents(spark, sfDir).count())
  }

  test("overlap chunks: exact windows on hand-sized docs; full coverage") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("chunkovl").toString
    def doc(id: Long, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), "en", "s", n.toLong)
    Seq(doc(1, 10), doc(2, 33), doc(3, 80))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Sampling.chunkOverlap(spark, d) // size 32, stride 24
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      (1L, 0L) -> ((0L, 10L)),                      // short doc: one window
      (2L, 0L) -> ((0L, 32L)), (2L, 1L) -> ((24L, 33L)), // 8-token overlap
      (3L, 0L) -> ((0L, 32L)), (3L, 1L) -> ((24L, 56L)),
      (3L, 2L) -> ((48L, 80L))))                    // final window flush
    // every token covered on the real corpus: last chunk ends at n
    val uncovered = Sampling.chunkOverlap(spark, sfDir)
      .groupBy(col("doc_id")).agg(max(col("end_tok")).as("mx"))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n")), Seq("doc_id"))
      .filter(col("mx") =!= col("n")).count()
    assert(uncovered === 0)
  }

  test("temperature mix: quotas sum to budget and flatten the skew") {
    val out = Sampling.mixTemperature(spark, sfDir, budget = 60)
    val quotas = out.groupBy(col("lang")).agg(
      max(col("quota")).as("q"), count(lit(1)).as("taken")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every stratum fills its quota exactly and the total is the budget
    quotas.foreach { case (lang, q, taken) =>
      assert(q === taken, s"$lang took $taken of quota $q") }
    assert(quotas.map(_._3).sum === 60L)
    // temperature flattens: the dominant stratum's budget share must
    // sit strictly below its raw corpus share
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val (topLang, topN) = counts.maxBy(_._2)
    val topQuota = quotas.find(_._1 == topLang).get._2.toDouble
    assert(topQuota / 60.0 < topN / total,
      s"$topLang budget share not flattened below raw share")
  }

  test("global row number: contiguous ids in doc_id order, adversarial ids") {
    import spark.implicits._
    // clustered ids (empty buckets between), a negative id (clamps to
    // bucket 0), and an id at the top of the range
    val ids = Seq(-7L, 0L, 1L, 2L, 3L, 1000000L, 1000001L, 999999999L)
    val df = spark.sparkContext.parallelize(ids, 5).toDF("doc_id")
    val got = Sampling.globalRowNumberOf(df, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ids.sorted.zipWithIndex
      .map { case (id, i) => id -> i.toLong }.toMap
    assert(got === want)
  }
}
