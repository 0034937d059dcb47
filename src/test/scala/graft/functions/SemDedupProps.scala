package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.SparkTestSession

/** Laws of the cluster-pruned near-dup candidate generation
  * ([[Similarity.semDedupPairsOn]]), for ARBITRARY centroids — the
  * pruning must be sound regardless of how well k-means converged:
  *
  *  - subset: every emitted pair really clears the cosine threshold
  *    (exact verification makes false positives impossible);
  *  - full assignment is lossless: with nprobe = nlist every vector
  *    joins every cluster, so the candidate join degenerates to
  *    all-pairs and the result must EQUAL brute force — the same
  *    theorem shape as IVF's full-probe == brute-force gate;
  *  - monotonicity: raising nprobe never loses a pair.
  */
object SemDedupProps extends Properties("SemDedup") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark

  private val dim = 4
  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-8, 8).map(_ / 3.0)).map(_.toArray)
      // keep vectors away from the zero vector so cosine is defined
      .suchThat(v => v.exists(x => math.abs(x) > 1e-9))

  private val corpusGen = Gen.chooseNum(2, 24).flatMap(n =>
    Gen.listOfN(n, vecGen).map(_.zipWithIndex.map {
      case (v, i) => (i.toLong, v)
    }))
  private val centsGen = Gen.chooseNum(1, 5).flatMap(k =>
    Gen.listOfN(k, vecGen).map(_.toArray))

  private def brute(xs: List[(Long, Array[Double])], thr: Double) = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      // same formulation as the engine (norm-then-multiply, not
      // sqrt-of-product) so threshold boundaries agree to the ULP
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    (for {
      (ia, va) <- xs; (ib, vb) <- xs
      if ia < ib && cos(va, vb) >= thr
    } yield (ia, ib)).toSet
  }

  private def run(xs: List[(Long, Array[Double])],
      cents: Array[Array[Double]], thr: Double, nprobe: Int): Set[(Long, Long)] = {
    import spark.implicits._
    // ScalaCheck shrinking does not re-check suchThat invariants on
    // list elements — re-impose the non-zero-vector guard here
    val safe = xs.filter(_._2.exists(x => math.abs(x) > 1e-9))
    Similarity.semDedupPairsOn(safe.toDS(), cents, thr, nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  property("full assignment equals brute force; subsets are monotone") =
    Prop.forAll(corpusGen, centsGen, Gen.chooseNum(2, 9)) { (xs, cents, t) =>
      val thr = t / 10.0
      val safe = xs.filter(_._2.exists(x => math.abs(x) > 1e-9))
      val exact = brute(safe, thr)
      val full = run(xs, cents, thr, nprobe = cents.length)
      val partial = run(xs, cents, thr, nprobe = 1)
      (full == exact) :| s"full-probe diverged: $full vs $exact" &&
        partial.subsetOf(full) :| "nprobe=1 emitted a pair full probe lost" &&
        partial.subsetOf(exact) :| "a candidate failed exact verification"
    }
}
