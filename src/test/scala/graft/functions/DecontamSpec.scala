package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The contamination report must count DISTINCT shared n-grams (a gram
  * repeated inside one doc is one overlap), ignore the val split, and
  * omit clean and too-short docs entirely. */
class DecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("trigram overlap counts distinct grams and hit docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "train", "a b c d"),        // shares "b c d" with doc 10
      (2L, "train", "a b c a b c"),    // shares "a b c" with doc 11, repeated grams dedup
      (3L, "train", "q r s t"),        // clean — must be absent
      (4L, "train", "x y"),            // too short for a trigram — absent
      (5L, "val", "b c d e"),          // val split never contaminates
      (10L, "test", "b c d e"),
      (11L, "test", "z a b c")
    ).toDF("doc_id", "split", "text")
    val got = Decontam.ngramOverlapOf(docs, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache() // the grams persist is caller-owned
    // doc 1 grams {a b c, b c d}: "b c d" hits doc 10 and "a b c"
    // hits doc 11 ("z a b c") → 2 grams, 2 test docs
    // doc 2: grams {a b c, b c a, c a b}; "a b c" hits doc 11 → 1, 1
    assert(got === Set((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("one train doc hitting several test docs counts each once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "train", "a b c d e"),
      (10L, "test", "a b c x"),
      (11L, "test", "c d e y")
    ).toDF("doc_id", "split", "text")
    val got = Decontam.ngramOverlapOf(docs, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache() // the grams persist is caller-owned
    // doc 1 grams: {a b c, b c d, c d e}; shared: "a b c" (doc10),
    // "c d e" (doc11) → 2 grams across 2 test docs
    assert(got === Set((1L, 2L, 2L)))
  }

  test("hashed gram keys report exactly what string keys report") {
    import org.apache.spark.sql.functions.col
    // real corpus, both variants end-to-end (split derived from text
    // hash as in the driver query), compared row-for-row
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        Sampling.splitName(Sampling.splitBucket(col("text"))).as("split"),
        col("text"))
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaString = toSet(Decontam.ngramOverlapOf(docs, n = 3))
    spark.catalog.clearCache()
    val viaHash = toSet(Decontam.ngramOverlapHashedOf(docs, n = 3))
    spark.catalog.clearCache()
    assert(viaString === viaHash && viaString.nonEmpty)
  }

  test("bloom-prefiltered report equals the exact report and actually prunes") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        Sampling.splitName(Sampling.splitBucket(col("text"))).as("split"),
        col("text"))
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = toSet(Decontam.ngramOverlapOf(docs, n = 3))
    spark.catalog.clearCache()
    // no false negatives + exact verify ⇒ identical report
    graft.Counters.clear()
    val bloom = toSet(Decontam.bloomOverlapOf(docs, n = 3, logM = 18, k = 3))
    spark.catalog.clearCache()
    assert(bloom === exact && bloom.nonEmpty)
    val c = graft.Counters.drain()
    // the prefilter must actually prune: at 2^18 bits the survivor set
    // is a small fraction of the train grams
    assert(c("bloom_survivors") < c("bloom_train_grams") / 2)
    // a tiny bitmap (64 bits) saturates: every probe hits, nothing is
    // pruned, and the verify join still yields the exact report — the
    // degenerate-sketch safety property
    val tiny = toSet(Decontam.bloomOverlapOf(docs, n = 3, logM = 6, k = 3))
    spark.catalog.clearCache()
    assert(tiny === exact)
  }

  test("semantic decon surfaces exactly the planted embedding copies") {
    import org.apache.spark.sql.functions.col
    val rows = Decontam.semanticOverlap(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // planted: eval member e (e%40==0) carries train vec e+1's exact
    // embedding, so the contaminated set is {e+1 : e%40==0, e+1 in
    // corpus} with max_cos exactly 1.0; the background tops out ~0.51,
    // far under the 0.8 threshold, so nothing else may appear
    val ids = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val want = ids.filter(e => e % 40 == 0 && ids.contains(e + 1)).map(_ + 1)
    assert(rows.map(_._1).toSet === want)
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, hits, mx) => hits >= 1L && mx === 1.0 })
  }
}
