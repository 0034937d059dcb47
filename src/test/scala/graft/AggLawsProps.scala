package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property tests for the operator laws scale correctness rests on:
  * results must not depend on partitioning, top-k must equal the
  * sorted prefix, and semi/anti joins must partition the left side.
  * (ScalaCheck Properties — run natively by sbt's test framework.) */
object AggLawsProps extends Properties("AggLaws") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private lazy val spark = SparkTestSession.spark

  private val keyGen  = Gen.oneOf("a", "b", "c", "d", "e")
  private val rowsGen = Gen.listOf(Gen.zip(keyGen, Gen.chooseNum(-100000L, 100000L)))
  private val partGen = Gen.chooseNum(1, 8)

  property("groupBy-sum is partitioning-invariant and exact") =
    Prop.forAll(rowsGen, partGen) { (xs, p) =>
      import spark.implicits._
      val got = xs.toDF("k", "v").repartition(p)
        .groupBy("k").agg(sum("v").as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exp = xs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      got == exp
    }

  property("orderBy.limit(k) equals the k-prefix of the full sort") =
    Prop.forAll(rowsGen, partGen, Gen.chooseNum(1, 10)) { (xs, p, k) =>
      import spark.implicits._
      val df = xs.zipWithIndex
        .map { case ((s, v), i) => (i.toLong, s, v) }
        .toDF("id", "k", "v").repartition(p)
      val top = df.orderBy(col("v").desc, col("id").asc).limit(k)
        .collect().map(_.getLong(0)).toSeq
      val full = df.orderBy(col("v").desc, col("id").asc)
        .collect().map(_.getLong(0)).toSeq
      top == full.take(k)
    }

  property("left_semi and left_anti partition the left side") =
    Prop.forAll(rowsGen, Gen.someOf("a", "b", "c")) { (xs, keep) =>
      import spark.implicits._
      val left = xs.zipWithIndex
        .map { case ((s, v), i) => (i.toLong, s, v) }
        .toDF("id", "k", "v")
      val dim = keep.toSeq.toDF("k")
      val semi = left.join(dim, Seq("k"), "left_semi")
        .select("id").collect().map(_.getLong(0)).toSet
      val anti = left.join(dim, Seq("k"), "left_anti")
        .select("id").collect().map(_.getLong(0)).toSet
      val all = xs.indices.map(_.toLong).toSet
      semi.intersect(anti).isEmpty && semi.union(anti) == all &&
        semi == xs.zipWithIndex.collect {
          case ((s, _), i) if keep.contains(s) => i.toLong
        }.toSet
    }

  property("decimal money sums are order-independent") =
    Prop.forAll(rowsGen, partGen, partGen) { (xs, p1, p2) =>
      import spark.implicits._
      def total(p: Int): Option[java.math.BigDecimal] = {
        val r = xs.map { case (k, v) => (k, v / 100.0) }.toDF("k", "v")
          .repartition(p)
          .agg(sum(col("v").cast("decimal(18,2)"))).collect().head
        Option(r.getDecimal(0)).map(_.stripTrailingZeros)
      }
      total(p1) == total(p2)
    }

  // The fingerprint's three combiners recomputed by an INDEPENDENT
  // driver-side implementation (MessageDigest md5 + the same ascii·256^i
  // fold, exact BigInt arithmetic for the modular sum) must match the
  // engine under ANY partitioning — this is the law that makes the
  // signature trustworthy for cross-cluster reconciliation, and the
  // BigInt reference pins the mod-2^61−1 fold exactly (an accumulator
  // overflow or a wrong widening would diverge here).
  property("table fingerprint equals the BigInt reference under any partitioning") =
    Prop.forAll(rowsGen, partGen) { (xs, p) =>
      import spark.implicits._
      import graft.operators.Profile
      val rows = xs.zipWithIndex.map { case ((s, v), i) => (i.toLong, s, v) }
      val row = Profile.tableFingerprint(
        rows.toDF("id", "k", "v").repartition(p),
        Seq(col("id").cast("string"), col("k"), col("v").cast("string"))).head()
      val md = java.security.MessageDigest.getInstance("MD5")
      val sigs = rows.map { case (i, s, v) =>
        val hex = md.digest(s"$i|$s|$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (0 until 8).map(j => hex(j).toLong << (8 * j)).sum
      }
      val fpMod = BigInt(Profile.FpMod)
      val wantXor = sigs.foldLeft(0L)(_ ^ _)
      val wantSum =
        if (sigs.isEmpty) None
        else Some((sigs.map(x => BigInt(x) % fpMod).sum % fpMod).toLong)
      row.getLong(0) == rows.size.toLong &&
        (if (sigs.isEmpty) row.isNullAt(1) else row.getLong(1) == wantXor) &&
        (wantSum match {
          case None    => row.isNullAt(2)
          case Some(w) => row.getLong(2) == w
        })
    }
}
