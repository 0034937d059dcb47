package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession

/** The binned equi-join formulation must equal the naive BETWEEN
  * theta-join for ANY points/ranges/width — bin boundaries, negative
  * axes, zero-width and overlapping ranges included. */
object RangeJoinProps extends Properties("RangeJoin") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkTestSession.spark

  // values clustered around bin edges (width divisors of 64 make exact
  // boundary hits likely) plus negatives and fractional noise
  private val valGen = Gen.oneOf(
    Gen.chooseNum(-256, 256).map(_.toDouble),
    Gen.chooseNum(-4, 4).map(_ * 64.0),
    Gen.chooseNum(-2048, 2048).map(_ / 7.0))

  private val rangesGen = Gen.listOf(Gen.zip(valGen, Gen.chooseNum(0, 100)))
    .map(_.zipWithIndex.map { case ((lo, span), i) =>
      (i.toLong, lo, lo + span)
    })

  property("overlapBinned equals naive overlap join") =
    Prop.forAll(rangesGen, rangesGen,
      Gen.oneOf(0.5, 1.0, 17.0, 64.0, 1e6)) { (as, bs, width) =>
      import spark.implicits._
      val a = as.toDF("aid", "alo", "ahi")
      val b = bs.toDF("bid", "blo", "bhi")
      val got = RangeJoin.overlapBinned(a, "alo", "ahi", b, "blo", "bhi",
          width)
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val exp = a.join(b,
          col("alo") <= col("bhi") && col("blo") <= col("ahi"))
        .select("aid", "bid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // compare as multisets: the responsibility filter must emit each
      // overlapping pair EXACTLY once, not merely at-least-once
      got.sorted.toSeq == exp.sorted.toSeq
    }

  property("binned equals naive BETWEEN join") =
    Prop.forAll(Gen.listOf(valGen), rangesGen,
      Gen.oneOf(0.5, 1.0, 17.0, 64.0, 1e6)) { (pts, rgs, width) =>
      import spark.implicits._
      val points = pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("pid", "p")
      val ranges = rgs.toDF("rid", "lo", "hi")
      val got = RangeJoin.binned(points, "p", ranges, "lo", "hi", width)
        .select("pid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = points.join(ranges,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "rid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got == exp
    }
}
