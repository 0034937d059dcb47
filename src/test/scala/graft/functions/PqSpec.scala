package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ invariants the gate's booleans summarize, checked open-box:
  * the ADC identity (table lookup == recomputed asymmetric distance,
  * exactly), encoding determinism, and the measured recall that sets
  * the gate floor. */
class PqSpec extends SparkSpec {
  private def recallAt(d: String, m: Int, ksub: Int,
      factor: Int): (Double, Double, Double) = {
    val vecs = Ivf.vectors(spark, d).persist()
    vecs.count()
    val books = Pq.trainCodebooks(vecs, m, ksub, 2)
    val scores = Pq.adcScores(vecs, Pq.encode(vecs, books), books, 20)
      .persist()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val approx = scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select(col("query_id"), col("vec_id"))
    val reranked = Pq.adcRerankTopK(vecs, scores, 20, 5, factor)
    val exact = Pq.l2TopK(vecs, 20, 5).persist()
    val hits = approx.join(exact, Seq("query_id", "vec_id"), "left_semi").count()
    val rhits = reranked.join(exact, Seq("query_id", "vec_id"), "left_semi").count()
    val gap = scores.agg(max(abs(col("adist") - col("adist_direct"))))
      .head().getDouble(0)
    scores.unpersist(); vecs.unpersist(); exact.unpersist()
    (hits / 100.0, rhits / 100.0, gap)
  }

  test("ADC identity exact; re-ranked recall above the gate floor") {
    // config sweep (recorded): m=8/ksub=16 ADC-only recall .23-.29,
    // reranked .52-.54; m=16/ksub=64/f=8 reranked .95-.96 — the gate
    // pins the latter with floor 0.8
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val (recall, rerank, gap) = recallAt(d, 16, 64, 8)
      info(s"$d: adc recall@5 = $recall, reranked = $rerank, gap = $gap")
      assert(gap === 0.0, s"ADC lookup diverged from recompute at $d")
      assert(rerank >= 0.8, s"re-ranked recall $rerank under floor at $d")
    }
  }

  test("codebooks and codes are deterministic across partitionings") {
    val d = "/root/testdata/sf0.001"
    val v1 = Ivf.vectors(spark, d)
    val v4 = v1.repartition(4)
    val b1 = Pq.trainCodebooks(v1, 8, 16, 2)
    val b4 = Pq.trainCodebooks(v4, 8, 16, 2)
    // decimal-rounded comparison: partial-sum combine order differs
    // across partitionings by design; centroids must agree to 1e-9
    for (j <- b1.indices; c <- b1(j).indices; i <- b1(j)(c).indices)
      assert(math.abs(b1(j)(c)(i) - b4(j)(c)(i)) < 1e-9,
        s"centroid drift at subspace $j cell $c dim $i")
    val c1 = Pq.encode(v1, b1).collect().toMap
    val c4 = Pq.encode(v4, b1).collect().toMap
    assert(c1.keySet === c4.keySet)
    c1.foreach { case (id, codes) => assert(codes.sameElements(c4(id))) }
  }

  test("PQ over the MIPS augmentation holds the recall floor") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val r = Pq.pqMipsGate(spark, d).head()
      info(s"$d: mips_recall_ok=${r.getBoolean(0)} n=${r.getLong(1)}")
      assert(r.getBoolean(0), s"PQ-MIPS recall under floor at $d")
      assert(r.getLong(1) === 100L)
    }
  }

  test("gate: booleans true, corpus count pinned") {
    val r = Pq.pqRecallGate(spark, sfDir).head()
    assert(r.getBoolean(0), "ADC consistency boolean false")
    assert(r.getBoolean(1), "recall floor boolean false")
    assert(r.getLong(2) ===
      graft.Tables.embeddings(spark, sfDir).count())
  }
}
