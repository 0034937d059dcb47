package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Inverted index: exact document frequency, capped+sorted postings,
  * and the skew-safety contract (hot terms never funnel their full
  * posting set through one window task).
  */
class InvertedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("df counts documents, not occurrences; within-doc repeats collapse") {
    val d = docs((1L, "spark spark spark"), (2L, "spark flink"))
    val out = TextOps.invertedIndexOf(d, k = 8).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out("spark") == ((2L, "1,2")))
    assert(out("flink") == ((1L, "2")))
  }

  test("postings are capped at k smallest doc_ids, ascending; df stays exact") {
    val d = docs((1L to 20L).map(i => i -> "hot term"): _*)
    val out = TextOps.invertedIndexOf(d, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val hot = out.find(_._1 == "hot").get
    assert(hot._2 == 20L)          // df counts ALL 20 docs
    assert(hot._3 == "1,2,3,4,5")  // postings only the first 5
  }

  test("cap survives adversarial doc_id order across partitions") {
    import spark.implicits._
    // descending ids, spread over 4 partitions: the two-phase top-k
    // must still pick the globally smallest k
    val d = (1L to 100L).reverse.map(i => (i, "x common", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
    val out = TextOps.invertedIndexOf(d, k = 3).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(out("x") == "1,2,3")
    assert(out("common") == "1,2,3")
  }

  test("per-source cap keeps first n per source with contiguous ranks") {
    val out = Sampling.capPerSource(spark, "/root/testdata/sf0.001", cap = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySource = out.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 3, s"$src exceeded cap")
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length),
        s"$src ranks not contiguous")
      // ranks follow ascending doc_id
      assert(rows.sortBy(_._2).map(_._3).sameElements(1 to rows.length))
    }
    // reference check against a plain window on the same data
    val ref = Sampling.stratumRanks(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("source"), col("doc_id")), "source", 4)
      .filter(col("grank") <= 3).count()
    assert(out.length.toLong == ref)
  }
}
