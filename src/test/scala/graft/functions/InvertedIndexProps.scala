package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** Inverted index vs a single-threaded reference over random corpora:
  * df is exact, postings are the first-k ascending doc_ids, and the
  * two-phase pruning can never change the answer regardless of how the
  * input is partitioned.
  */
object InvertedIndexProps extends Properties("InvertedIndex") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val word = Gen.oneOf("a", "b", "c", "dup dup", "hot")
  private val genDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 30)
    ids <- Gen.pick(n, 1L to 60L)
    texts <- Gen.listOfN(n, Gen.nonEmptyListOf(word).map(_.take(8).mkString(" ")))
  } yield ids.toList.zip(texts)

  private def reference(docs: List[(Long, String)], k: Int) = {
    val pairs = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).distinct.map(_ -> id)
    }
    pairs.groupBy(_._1).map { case (term, ps) =>
      val ids = ps.map(_._2).distinct.sorted
      term -> ((ids.size.toLong, ids.take(k).mkString(",")))
    }
  }

  property("df exact and postings = first-k ascending, any partitioning") =
    Prop.forAll(genDocs, Gen.chooseNum(1, 6), Gen.chooseNum(1, 5)) {
      (docs, k, nPart) =>
        import spark.implicits._
        val df = docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .repartition(nPart)
        val got = TextOps.invertedIndexOf(df, k).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
        val want = reference(docs, k)
        (got == want) :| s"engine $got != reference $want (k=$k, nPart=$nPart)"
    }
}
