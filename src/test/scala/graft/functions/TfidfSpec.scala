package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** TF-IDF checked against an in-memory reference computed with plain
  * Scala collections over the same corpus — independent of every Spark
  * aggregate the operator uses. */
class TfidfSpec extends SparkSpec {
  test("top-k tfidf matches a collection-based reference") {
    val k = 3
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toDouble
    val tf = docs.flatMap { case (id, text) =>
      text.split(" ", -1).groupBy(identity)
        .map { case (t, xs) => ((id, t), xs.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    val expected = tf.keys.groupBy(_._1).flatMap { case (id, keys) =>
      keys.toSeq
        .map { case (_, t) =>
          val score = BigDecimal(tf((id, t)) * math.log(n / df(t)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (t, score)
        }
        .sortBy { case (t, sc) => (-sc, t) }
        .take(k).zipWithIndex
        .map { case ((t, sc), i) => (id, t, sc, i + 1) }
    }.toSet

    val got = TextOps.tfidf(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got === expected && got.nonEmpty)
  }

  test("scores within each doc are non-increasing by rank") {
    // one invocation self-joined — each tfidf call persists its own tf
    // aggregate, so building two would double the work and the cache
    val t = TextOps.tfidf(spark, sfDir)
    val bad = t.as("a")
      .join(t.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.rank") === col("b.rank") - 1)
      .filter(col("a.tfidf") < col("b.tfidf")).count()
    assert(bad === 0)
    spark.catalog.clearCache() // release the tf persists from this suite
  }
}
